package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.index.{Builder, Tokenizer}

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes: exact dedup is one hash-shuffle on a 64-char key (not the
  * content); near-dup is an inverted shingle join — the posting-list
  * pattern again — so the same salting logic applies to head shingles;
  * MinHash/LSH trades the quadratic term for banding at the cost of
  * recall.
  */
object Dedup {

  /** Exact duplicate groups by content hash. One shuffle over
    * (hash -> count, representative). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sha2(col("text"), 256).as("content_sha256"))
      .groupBy("content_sha256")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"))

  /** Keep one representative per exact-duplicate group. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Word k-gram shingle set per doc (distinct, space-joined).
    *
    * Built by zip_with over k shifted views of the token array — O(n·k)
    * string work with no per-element `slice` call (slice inside a lambda
    * forces an O(n) array copy per element, observed 50x slower). */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    val toks = Builder.tokensCol(col("text"))
    docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k)
      .select(col("doc_id"),
        explode(array_distinct(kgrams(col("toks"), col("n"), k))).as("shingle"))
  }

  /** Array of space-joined k-grams of `toks` (length n >= k).
    * Every shifted view is clipped to exactly n-k+1 elements: zip_with
    * null-PADS the shorter input (it does not truncate), and a null
    * element would both poison concat and inflate shingle counts. */
  private[ops] def kgrams(toks: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    val len = n - (k - 1)
    val first = slice(toks, lit(1), len)
    (1 until k).foldLeft(first) { (acc, off) =>
      zip_with(acc, slice(toks, lit(off + 1), len),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index —
    * no all-pairs product: only docs sharing at least one shingle meet.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= minJ. */
  def jaccardPairs(docs: DataFrame, k: Int, minJ: Double): DataFrame = {
    val sh = shingles(docs, k).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")), 6))
      .filter(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ---- MinHash + LSH --------------------------------------------------

  /** Deterministic 64-bit mix (splitmix64 finalizer). */
  private def mix64(x0: Long): Long = {
    var x = x0 ^ 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signatures: nHashes permutations approximated by seeded
    * remixes of one shingle hash; computed in one pass per doc via
    * typed mapGroups over its shingles. */
  def minhashSignatures(docs: DataFrame, k: Int, nHashes: Int): Dataset[(Long, Seq[Long])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    shingles(docs, k)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val sig = Array.fill(nHashes)(Long.MaxValue)
        it.foreach { case (_, h) =>
          var i = 0
          while (i < nHashes) {
            val v = mix64(h + i * 0xc2b2ae3d27d4eb4fL)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        (docId, sig.toSeq)
      }
  }

  /** LSH candidate pairs: band the signature, bucket-join on band hash.
    * Recall is probabilistic; callers verify candidates with
    * `jaccardPairs`-style exact scoring on the candidate set. */
  def minhashCandidates(docs: DataFrame, k: Int = 3, nHashes: Int = 32,
                        bands: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = nHashes / bands
    val sigs = minhashSignatures(docs, k, nHashes)
    val banded = sigs.flatMap { case (docId, sig) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rows, (b + 1) * rows)
        (docId, b, slice.foldLeft(17L)((acc, h) => mix64(acc ^ h)))
      }
    }.toDF("doc_id", "band", "bucket")
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band")
        && col("a.bucket") === col("b.bucket")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash (64-bit) over token hashes weighted by tf. */
  def simhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (docId, text) =>
        val counts = new Array[Int](64)
        Tokenizer.tokens(text).foreach { t =>
          val h = mix64(t.hashCode.toLong & 0xffffffffL)
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
            i += 1
          }
        }
        var sig = 0L
        var i = 0
        while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
        (docId, sig)
      }.toDF("doc_id", "simhash")
  }
}
