package graft

import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.Builder
import graft.query.Substring

/** Substring (cross-token) search: trigram-index candidates + exact
  * contains verify must equal a brute-force corpus scan, including the
  * per-doc occurrence count and first offset the reference's match
  * decode emits. */
class SubstringSpec extends SparkTestBase {

  private lazy val corpus = Synth.corpus(spark, 200, seed = 5L).cache()
  private lazy val indexDir = {
    val d = tmpDir("substr-idx")
    Builder.build(spark, corpus, d,
      Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 2,
        saltTarget = 60, storeTrigrams = true))
    d
  }

  /** OVERLAPPING occurrence count (the reference's suffix-array decode
    * semantics: sa_hi - sa_lo counts every suffix match). */
  private def countOcc(content: String, pat: String): Long = {
    var n = 0L; var i = content.indexOf(pat)
    while (i >= 0) { n += 1; i = content.indexOf(pat, i + 1) }
    n
  }

  test("substring results equal brute-force contains over the corpus") {
    import spark.implicits._
    val sample = Synth.doc(5L, 42L).content
    val queries = Seq(
      1L -> sample.substring(10, 30),         // cross-token, known hit
      2L -> "id_1 id_",                        // common fragment
      3L -> "zzqx_never_present",              // empty
      4L -> "d_")                              // sub-trigram fallback
    val got = Substring.find(spark, indexDir, queries, nBuckets = 8,
        allowShortScan = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content").as[(Long, String)].collect()
    val want = (for {
      (qid, pat) <- queries
      (docId, content) <- withIds
      if content.contains(pat)
    } yield (qid, docId, countOcc(content, pat),
        content.indexOf(pat).toLong)).toSet
    assert(got == want)
    assert(got.exists(_._1 == 1L))   // the sampled substring matches
    assert(!got.exists(_._1 == 3L))  // no false positives
    assert(got.exists(_._1 == 4L))   // short-pattern fallback works
    assert(got.exists(_._3 > 1L))    // some doc has multiple occurrences
  }

  test("maxMatches caps results per query deterministically (lowest doc ids)") {
    import spark.implicits._
    val queries = Seq(1L -> "id_1 id_")
    val all = Substring.find(spark, indexDir, queries, nBuckets = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(all.length > 3)
    val capped = Substring.find(spark, indexDir, queries, nBuckets = 8,
        maxMatches = 3L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(capped.toSeq == all.take(3).toSeq)
  }

  test("sub-trigram patterns are rejected unless the full scan is opted into") {
    intercept[IllegalArgumentException] {
      Substring.find(spark, indexDir, Seq(1L -> "ab"), nBuckets = 8)
    }
  }

  test("bucket layout is read from _META.json, not the caller parameter") {
    import spark.implicits._
    // deliberately wrong caller nBuckets: results must still be complete
    val sample = Synth.doc(5L, 42L).content
    val queries = Seq(1L -> sample.substring(10, 30))
    val right = Substring.find(spark, indexDir, queries, nBuckets = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val wrongParam = Substring.find(spark, indexDir, queries, nBuckets = 32)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(right.nonEmpty && wrongParam == right)
  }

  test("long patterns (gram probe capped) stay exact vs brute force") {
    import spark.implicits._
    val sample = Synth.doc(5L, 42L).content
    // > MaxGramsPerQuery*3 chars so the evenly-spaced gram subset kicks in
    val pat = sample.substring(5, 5 + 80)
    assert(pat.sliding(3).toSeq.distinct.size > Substring.MaxGramsPerQuery)
    val got = Substring.find(spark, indexDir, Seq(1L -> pat), nBuckets = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content").as[(Long, String)].collect()
    val want = (for {
      (docId, content) <- withIds if content.contains(pat)
    } yield (1L, docId, countOcc(content, pat),
        content.indexOf(pat).toLong)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("overlapping occurrences all count (reference suffix-array semantics)") {
    import spark.implicits._
    val d = tmpDir("substr-ovl")
    val docs = Seq(graft.index.CodeDoc("r", "a.txt", "c1", "x", "xaaax baaab"))
      .toDF()
    Builder.build(spark, docs, d,
      Builder.Config(blockSize = 32, nBuckets = 4, nSegments = 1,
        saltTarget = 60, storeTrigrams = true))
    val got = Substring.find(spark, d, Seq(1L -> "aa"), nBuckets = 4,
        allowShortScan = true)
      .as[(Long, Long, Long, Long)].collect()
    // 'aa' in "xaaax baaab": offsets 1,2 (overlapping) and 7,8 -> 4 total
    assert(got.toSeq == Seq((1L, 0L, 4L, 1L)))
    val offs = Substring.findOffsets(spark, d, Seq(1L -> "aa"), nBuckets = 4,
        allowShortScan = true)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(offs.map(_._3).toSeq == Seq(1L, 2L, 7L, 8L))
  }

  test("findOffsets equals a brute-force scan; maxMatches keeps smallest pairs") {
    import spark.implicits._
    val sample = Synth.doc(5L, 42L).content
    val queries = Seq(1L -> sample.substring(10, 30), 2L -> "id_1 id_")
    val got = Substring.findOffsets(spark, indexDir, queries, nBuckets = 8)
      .as[(Long, Long, Long)].collect().toSet
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content").as[(Long, String)].collect()
    def offs(content: String, pat: String): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = content.indexOf(pat)
      while (i >= 0) { out += i.toLong; i = content.indexOf(pat, i + 1) }
      out.toSeq
    }
    val want = (for {
      (qid, pat) <- queries
      (docId, content) <- withIds
      o <- offs(content, pat)
    } yield (qid, docId, o)).toSet
    assert(got == want && got.nonEmpty)
    // cap: exactly the maxMatches smallest (doc_id, offset) pairs per query
    val capped = Substring.findOffsets(spark, indexDir, queries,
        nBuckets = 8, maxMatches = 5L)
      .as[(Long, Long, Long)].collect()
    val wantCapped = want.groupBy(_._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (r._2, r._3)).take(5)
    }.toSet
    assert(capped.toSet == wantCapped)
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

  test("snippets: window arithmetic matches a brute-force slice (clipped)") {
    import spark.implicits._
    val sample = Synth.doc(5L, 42L).content
    val queries = Seq(
      1L -> sample.substring(10, 30),
      2L -> "id_1 id_",
      3L -> sample.substring(0, 12)) // matches at offset 0 -> left clip
    val ctx = 7
    val got = Substring.snippets(spark, indexDir, queries, ctx = ctx,
        nBuckets = 8, maxMatches = 50L)
      .as[(Long, Long, Long, String)].collect().toSet
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content").as[(Long, String)].collect()
    val want = (for {
      (qid, pat) <- queries
      (docId, content) <- withIds
      if content.contains(pat)
      offs = Iterator.iterate(content.indexOf(pat))(i =>
        content.indexOf(pat, i + 1)).takeWhile(_ >= 0).toSeq
      off <- offs
    } yield {
      val s = math.max(off - ctx, 0)
      val e = math.min(off + pat.length + ctx, content.length)
      (qid, docId, off.toLong, content.substring(s, e))
    }).groupBy(_._1).flatMap { case (qid, rows) => // same cap semantics
      rows.sortBy(r => (r._2, r._3)).take(50)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
    // every snippet actually contains its pattern
    val pats = queries.toMap
    assert(got.forall { case (qid, _, _, sn) => sn.contains(pats(qid)) })
  }

  test("offsets are code points, not UTF-16 code units (supplementary planes)") {
    // two emoji (surrogate pairs: 4 code units, 2 code points) then "abc"
    val content = "😀😀abc xyz abc"
    // code-unit indices of "abc": 4 and 12; code-point offsets: 2 and 10
    assert(Substring.occurrenceOffsets(content, "abc").toSeq == Seq(2L, 10L))
    // identity on BMP-only content
    assert(Substring.occurrenceOffsets("aaa", "aa").toSeq == Seq(0L, 1L))
    assert(Substring.toCodePointOffsets(content, Array(0, 2, 4, 12)).toSeq
      == Seq(0L, 1L, 2L, 10L))
  }
}
