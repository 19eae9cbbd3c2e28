package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.{Builder, Posting, Tokenizer}

/** Isolate stage-3 superlinearity: flatMap vs write vs partitionBy. */
object RawProbe3 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"PROBE3 $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val ids = java.nio.file.Files.createTempDirectory("ids").toString
    t("corpus_ids-write") {
      Builder.withDocIds(Synth.corpus(spark, nDocs))
        .select("doc_id", "repo", "path", "commit", "lang", "content")
        .repartition(cores).write.mode("overwrite").parquet(ids)
    }
    val raw = spark.read.parquet(ids).select("doc_id", "content")
      .repartition(cores)
      .as[(Long, String)]
      .flatMap { case (id, content) =>
        val ts = Tokenizer.tokens(content)
        val dl = ts.length
        val m = new java.util.HashMap[String, Int](64)
        var i = 0
        while (i < ts.length) { m.merge(ts(i), 1, Integer.sum _); i += 1 }
        val out = new Array[Posting](m.size)
        val it = m.entrySet().iterator()
        var j = 0
        while (it.hasNext) {
          val e = it.next(); out(j) = Posting(e.getKey, id, e.getValue, dl); j += 1
        }
        out
      }
    t("flatMap-count")(println("rows=" + raw.count()))
    t("flatMap-count2")(raw.count())
    val d1 = java.nio.file.Files.createTempDirectory("flat").toString
    t("write-flat")(raw.write.mode("overwrite").parquet(d1))
    val d2 = java.nio.file.Files.createTempDirectory("dyn").toString
    t("write-partitionBy")(raw
      .withColumn("bucket", Builder.bucketOf(col("term"), 32))
      .write.mode("overwrite").partitionBy("bucket").parquet(d2))
    spark.stop()
  }
}

object RawProbe4 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"PROBE4 $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val ids = java.nio.file.Files.createTempDirectory("ids").toString
    Builder.withDocIds(Synth.corpus(spark, nDocs))
      .select("doc_id", "content")
      .repartition(cores).write.mode("overwrite").parquet(ids)
    val raw = spark.read.parquet(ids).repartition(cores)
      .as[(Long, String)]
      .flatMap { case (id, content) =>
        val ts = Tokenizer.tokens(content)
        val m = new java.util.HashMap[String, Int](64)
        var i = 0
        while (i < ts.length) { m.merge(ts(i), 1, Integer.sum _); i += 1 }
        val out = new Array[Posting](m.size)
        val it = m.entrySet().iterator(); var j = 0
        while (it.hasNext) { val e = it.next(); out(j) = Posting(e.getKey, id, e.getValue, ts.length); j += 1 }
        out
      }.withColumn("bucket", Builder.bucketOf(col("term"), 32))
    val d1 = java.nio.file.Files.createTempDirectory("v1").toString
    t("repart+partitionBy")(raw.repartition(cores, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(d1))
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "64")
    val d2 = java.nio.file.Files.createTempDirectory("v2").toString
    t("concurrent+partitionBy")(raw
      .write.mode("overwrite").partitionBy("bucket").parquet(d2))
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    val d3 = java.nio.file.Files.createTempDirectory("v3").toString
    t("repartN+flat-col")(raw.repartition(32, col("bucket"))
      .write.mode("overwrite").parquet(d3))
    spark.stop()
  }
}
