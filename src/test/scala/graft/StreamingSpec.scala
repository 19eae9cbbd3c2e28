package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.{Builder, CodeDoc}
import graft.query.Searcher
import graft.streaming.IncrementalIndexer

/** Incremental streaming ingest: per-batch segments, stats/dictionary
  * refresh, query results identical to a full batch rebuild. */
class StreamingSpec extends SparkTestBase {

  test("streamed index answers queries identically to a batch rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 180L).map(i => Synth.doc(42L, i))
    val (b1, rest) = all.splitAt(60)
    val (b2, b3) = rest.splitAt(60)

    val dir = tmpDir("stream-idx")
    val conf = Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 2,
      saltTarget = 40)
    val ms = MemoryStream[CodeDoc]
    val q = IncrementalIndexer.start(ms.toDF(), dir, conf, tmpDir("stream-ckpt"))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
    } finally q.stop()

    // full batch rebuild over the union
    val fullDir = tmpDir("full-idx")
    Builder.build(spark, all.toDF(), fullDir, conf)

    // id-independent invariants
    assert(Builder.loadStats(spark, dir) == Builder.loadStats(spark, fullDir))
    val dictA = spark.read.parquet(s"$dir/dictionary")
      .select("term", "df", "cf")
    val dictB = spark.read.parquet(s"$fullDir/dictionary")
      .select("term", "df", "cf")
    assert(dictA.except(dictB).count() == 0 && dictB.except(dictA).count() == 0)

    // query results identical when compared by resolved (repo, path)
    val doc = Synth.doc(42L, 100L).content
    val t = graft.index.Tokenizer.tokens(doc)
    val qs = Seq(
      Searcher.Query(1, t(0)),
      Searcher.Query(2, s"${t(1)} ${t(4)}"),
      Searcher.Query(3, "id_0 id_1"))
    def resolved(ix: String) =
      Searcher.resolve(spark, ix, Searcher.searchTopK(spark, ix, qs, 10))
        .select("query_id", "rank", "score", "repo", "path")
        .orderBy("query_id", "rank").collect().toSeq
    assert(resolved(dir) == resolved(fullDir))

    // segments exist per non-bootstrap batch
    val segs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(segs.count(_.startsWith("segment=s")) >= 2, segs.mkString(","))

    // replaying a committed batch is a no-op (idempotency)
    val before = spark.read.parquet(s"$dir/postings").count()
    IncrementalIndexer.ingestBatch(spark, b2.toDF(), dir, conf, 1L)
    assert(spark.read.parquet(s"$dir/postings").count() == before)

    // sha integrity holds across appended docmeta
    val meta = spark.read.parquet(s"$dir/docmeta")
    assert(meta.count() == 180)
    assert(meta.select("content_sha256").distinct().count() ==
      all.map(_.content).distinct.size)
  }
}
