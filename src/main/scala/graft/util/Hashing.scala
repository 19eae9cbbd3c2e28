package graft.util

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side hashes that must agree exactly with the Spark SQL
  * `xxhash64` column function (seed 42) so partition pruning computed on
  * the driver matches the bucket column written by the builder. */
object Hashing {
  def xxhash64(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  /** Must match Builder.bucketOf: pmod(xxhash64(term), nBuckets). */
  def bucketOf(term: String, nBuckets: Int): Int = {
    val h = xxhash64(term) % nBuckets
    (if (h < 0) h + nBuckets else h).toInt
  }
}
