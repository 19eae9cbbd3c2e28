package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.Builder

/** Narrow the anti-scaling operator: window vs explode vs groupBy. */
object RawProbe2 {
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
      println(f"PROBE2 $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val corpus = Synth.corpus(spark, nDocs)
    t("gen")(corpus.count())
    t("gen2")(corpus.count())
    t("docids")(Builder.withDocIds(corpus).count())
    val flat = corpus.withColumn("doc_id", xxhash64(col("path")))
      .withColumn("toks", Builder.tokensCol(col("content")))
      .withColumn("dl", size(col("toks")))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
    t("tokenize+explode")(flat.count())
    t("explode+groupBy")(
      flat.groupBy("term", "doc_id")
        .agg(count(lit(1)).cast("int").as("tf"), first("dl").as("dl")).count())
    spark.stop()
  }
}
