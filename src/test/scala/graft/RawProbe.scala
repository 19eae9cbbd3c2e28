package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.Builder

/** Isolate postings_raw cost: compute vs dynamic-partition write. */
object RawProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"PROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val corpus = Synth.corpus(spark, nDocs)
    t("warm-count")(corpus.count())
    val raw = Builder.withDocIds(corpus)
      .withColumn("toks", Builder.tokensCol(col("content")))
      .withColumn("dl", size(col("toks")))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("int").as("tf"), first("dl").as("dl"))
      .withColumn("bucket", Builder.bucketOf(col("term"), 32))
    t("compute-only-count")(raw.count())
    val d1 = java.nio.file.Files.createTempDirectory("flat").toString
    t("write-flat")(raw.write.mode("overwrite").parquet(d1))
    val d2 = java.nio.file.Files.createTempDirectory("dyn").toString
    t("write-partitionBy")(raw.write.mode("overwrite").partitionBy("bucket").parquet(d2))
    val d3 = java.nio.file.Files.createTempDirectory("dynrep").toString
    t("write-repart-partBy")(raw.repartition(cores, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(d3))
    spark.stop()
  }
}
