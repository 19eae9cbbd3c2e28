package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash computable bit-for-bit by Spark, the JVM, AND the DuckDB
  * oracle: the first 15 hex chars of md5(utf8 bytes) parsed as an int.
  * 60 bits < 2^63, so all downstream modular arithmetic stays in exact
  * BIGINT range in both engines.
  *
  * This is what makes the probabilistic dedup/ANN operators (minhash,
  * simhash, LSH, fingerprint) oracle-checkable: the reference insists
  * every output be diffable against an independent oracle
  * (/root/reference/src/gin_graph.c:282-388, `gin utils find`), and a
  * hash only one engine can compute forfeits that.
  */
object CrossHash {

  /** Column form: md5 -> first 15 hex chars -> int64. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-thread MD5 instance: getInstance() does a provider lookup per
    * call, which dominated the typed per-token hot paths (fingerprint /
    * simhash hash millions of tokens per task). digest() resets the
    * instance, so reuse is safe. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM form — must agree exactly with h60(Column). */
  def h60(s: String): Long = {
    val md = md5Local.get()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 60 bits of the digest, big-endian (= first 15 hex chars)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** DuckDB SQL form of h60 over an arbitrary SQL expression. */
  def h60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Mersenne prime 2^31 - 1: affine minhash arithmetic modulus. Products
    * a*x with a, x < 2^31 stay under 2^62 — exact in BIGINT/Long. */
  val P31 = 2147483647L

  /** Deterministic affine coefficients (a_i, b_i) for minhash permutation
    * i, derived from h60 of a tagged name so Scala and generated SQL
    * literals agree. a in [1, P-1], b in [0, P-1]. */
  def minhashCoeff(i: Int): (Long, Long) =
    (h60(s"minhash_a_$i") % (P31 - 1) + 1, h60(s"minhash_b_$i") % P31)
}
