package graft

import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.Builder
import graft.query.Substring

/** Substring (cross-token) search: trigram-index candidates + exact
  * contains verify must equal a brute-force corpus scan. */
class SubstringSpec extends SparkTestBase {

  private lazy val corpus = Synth.corpus(spark, 200, seed = 5L).cache()
  private lazy val indexDir = {
    val d = tmpDir("substr-idx")
    Builder.build(spark, corpus, d,
      Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 2,
        saltTarget = 60, storeTrigrams = true))
    d
  }

  test("substring results equal brute-force contains over the corpus") {
    import spark.implicits._
    val sample = Synth.doc(5L, 42L).content
    val queries = Seq(
      1L -> sample.substring(10, 30),         // cross-token, known hit
      2L -> "id_1 id_",                        // common fragment
      3L -> "zzqx_never_present",              // empty
      4L -> "d_")                              // sub-trigram fallback
    val got = Substring.find(spark, indexDir, queries, nBuckets = 8)
      .as[(Long, Long)].collect().toSet
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content").as[(Long, String)].collect()
    val want = (for {
      (qid, pat) <- queries
      (docId, content) <- withIds
      if content.contains(pat)
    } yield (qid, docId)).toSet
    assert(got == want)
    assert(got.exists(_._1 == 1L))   // the sampled substring matches
    assert(!got.exists(_._1 == 3L))  // no false positives
    assert(got.exists(_._1 == 4L))   // short-pattern fallback works
  }

  test("trigram candidates prune the verify scan (index actually narrows)") {
    import spark.implicits._
    // a pattern whose trigrams are rare: candidates must be far fewer
    // than the corpus
    val sample = Synth.doc(5L, 7L).content
    val pat = sample.substring(0, 24)
    val grams = pat.sliding(3).toSeq.distinct
    val tri = spark.read.parquet(s"$indexDir/trigrams")
      .filter(col("gram").isin(grams: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("hit"))
      .filter(col("hit") === grams.size)
    assert(tri.count() < corpus.count() / 2,
      "trigram intersection should narrow candidates")
  }
}
