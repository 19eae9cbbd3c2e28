package graft

import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.{Builder, DocOrder}

/** Ordering producer (the annealing-program analog): determinism and the
  * measurable compression claim — a permutation computed from content
  * alone must beat a scrambled layout's bytes/posting. */
class DocOrderSpec extends SparkTestBase {

  private def bppOf(dir: String): Double = {
    import spark.implicits._
    val (pb, np) = spark.read.parquet(s"$dir/postings")
      .agg(
        sum(octet_length($"doc_deltas") + octet_length($"tfs") +
          octet_length($"dls")).cast("double"),
        sum($"num_docs").cast("long"))
      .as[(Double, Long)].head()
    pb / np
  }

  test("minhashPermutation is deterministic and a total rank") {
    val corpus = Synth.localizedCorpus(spark, 300).cache()
    val a = DocOrder.minhashPermutation(corpus, nHashes = 8)
      .orderBy("ord").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val b = DocOrder.minhashPermutation(corpus, nHashes = 8)
      .orderBy("ord").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 300)
    // dense 0..n-1 ranks, one per doc identity
    assert(a.map(_._4).toSeq == (0L until 300L))
    assert(a.map(t => (t._1, t._2, t._3)).distinct.length == 300)
  }

  test("computed ordering beats a scrambled layout's bytes/posting") {
    // localizedCorpus clusters repo-local identifiers; scrambling the
    // build order destroys posting locality. The producer sees CONTENT
    // ONLY and must rediscover the clustering (docs of one repo share
    // loc_* terms -> similar minhash signatures -> adjacent ranks).
    val corpus = Synth.localizedCorpus(spark, 2000).cache()
    val scramDir = tmpDir("order-scrambled")
    Builder.build(spark,
      corpus.withColumn("ord", pmod(xxhash64(col("path"), lit(7L)),
        lit(1L << 20))),
      scramDir,
      Builder.Config(blockSize = 128, nBuckets = 8, nSegments = 1,
        saltTarget = 2000, verifySegments = false,
        orderCols = Seq("ord", "repo", "path", "commit")))
    val permDir = tmpDir("order-computed")
    Builder.build(spark,
      Builder.withPermutation(corpus, DocOrder.minhashPermutation(corpus)),
      permDir,
      Builder.Config(blockSize = 128, nBuckets = 8, nSegments = 1,
        saltTarget = 2000, verifySegments = false,
        orderCols = Seq("ord", "repo", "path", "commit")))
    val scram = bppOf(scramDir)
    val computed = bppOf(permDir)
    assert(computed < scram,
      s"computed ordering $computed must beat scrambled $scram")
  }
}
