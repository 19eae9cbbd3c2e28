package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.CrossHash

/** Ordering PRODUCER — the Spark analog of the reference's offline
  * permutation optimizer (`gin permutation`: constraint-set extraction,
  * /root/reference/src/gin_constraint_set.c:62-212, feeding simulated
  * annealing, /root/reference/src/gin_annealing.c:24-507). The reference
  * anneals a vertex order that co-locates vertices sharing labels so the
  * index compresses and probes locally; for a document inverted index the
  * same objective is "give docs with similar term sets nearby doc ids"
  * (delta-encoded posting gaps shrink, block-max pruning tightens).
  *
  * Annealing is a sequential hill-climb — wrong shape for a cluster.
  * The scalable surrogate is the published MinHash-clustering sort
  * (shingle ordering, Chierichetti et al., "On Compressing Social
  * Networks"; also the standard cheap baseline against recursive graph
  * bisection, Dhulipala et al.): sort documents lexicographically by
  * their MinHash signature. Docs sharing terms agree on each signature
  * component with probability = Jaccard similarity, so similar docs
  * collide on long signature prefixes and become neighbors in the sort —
  * a global clustering order from ONE aggregation + ONE range sort, no
  * iteration, no driver state.
  *
  * Output plugs into the existing consumer hooks: a (repo, path, commit,
  * ord) rank table for `Builder.withPermutation` +
  * `Config(orderCols = Seq("ord", ...))`, i.e. exactly what the CLI's
  * `--permutation` flag reads. The effect is measured per round by
  * Bench's bytes_per_posting_by_ordering experiment.
  */
object DocOrder {

  /** Per-doc MinHash signature columns s0..s{n-1} over the doc's DISTINCT
    * token set (1-gram shingles: posting locality is about shared TERMS).
    * Pure codegen'd column arithmetic — base hash h60 mod P31, affine
    * permutations (a_i·x + b_i) mod P31, min per doc — the same scheme
    * (and coefficients) as Dedup.minhashSignatures, kept in exact BIGINT
    * range throughout (ANSI-safe: a, x < 2^31 so a·x < 2^62). */
  private def signatureAggs(nHashes: Int): Seq[Column] =
    (0 until nHashes).map { i =>
      val (a, b) = CrossHash.minhashCoeff(i)
      min(pmod(col("x31") * lit(a) + lit(b), lit(CrossHash.P31))).as(s"s$i")
    }

  /** Compute a locality permutation for `corpus` (repo, path, commit,
    * content, ...): returns (repo, path, commit, ord) where `ord` ranks
    * docs by MinHash-signature order. Shape at scale: one explode +
    * partial-aggregated groupBy (map-side min, one shuffle keyed by doc
    * identity — no skew possible), one range sort of n signature rows,
    * ids by the same per-partition count + prefix-sum Builder.withDocIds
    * uses (no single-partition stage). Deterministic: signatures are pure
    * functions of content, ties break on (repo, path, commit).
    *
    * Docs with no tokens get no signature row and are simply absent from
    * the returned table — withPermutation already sorts absent docs last
    * in identity order. */
  def minhashPermutation(corpus: DataFrame, nHashes: Int = 16,
                         partitions: Int = 0): DataFrame = {
    require(nHashes >= 1 && nHashes <= 64, s"nHashes=$nHashes")
    val spark = corpus.sparkSession
    val sigs = corpus
      .select(col("repo"), col("path"), col("commit"),
        explode(array_distinct(Builder.tokensCol(col("content"))))
          .as("term"))
      .withColumn("x31", pmod(CrossHash.h60(col("term")), lit(CrossHash.P31)))
      .groupBy("repo", "path", "commit")
      .agg(signatureAggs(nHashes).head, signatureAggs(nHashes).tail: _*)
    val orderCols =
      (0 until nHashes).map(i => col(s"s$i")) ++
        Seq(col("repo"), col("path"), col("commit"))
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = sigs
      .repartitionByRange(nPart, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .select("repo", "path", "commit")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(sorted.schema.fields :+
      StructField("ord", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }
}
