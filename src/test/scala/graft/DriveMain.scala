package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.index.Builder
import graft.query.Searcher

/** Manual end-to-end smoke drive of the public API over real testdata.
  * Run: sbt "Test/runMain graft.DriveMain /root/testdata/sf0.001" */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Corpus.fromDocuments(spark, sfDir)
    println("CORPUS ROWS: " + corpus.count())
    corpus.show(3, 60)
    val dir = java.nio.file.Files.createTempDirectory("drive-idx").toString
    Builder.build(spark, corpus, dir,
      Builder.Config(nBuckets = 8, nSegments = 2, saltTarget = 100))
    println("STATS: " + Builder.loadStats(spark, dir))
    val qs = Seq(
      Searcher.Query(1, "spark merge join"),
      Searcher.Query(2, "window"),
      Searcher.Query(3, "nosuchterm_xyz"),
      Searcher.Query(4, ""))
    val topk = Searcher.searchTopK(spark, dir, qs, 5, Searcher.And, nBuckets = 8)
    Searcher.resolve(spark, dir, topk).orderBy("query_id", "rank").show(20, false)
    Searcher.countMatches(spark, dir, qs, nBuckets = 8).orderBy("query_id").show()
    println("DRIVE_DONE index=" + dir)
    spark.stop()
  }
}
