package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.{Builder, DocOrder}

/** Dev utility: measure bytes/posting for candidate doc orderings on the
  * localized synthetic corpus without a full bench run — `runMain
  * graft.tools.OrderProbe [nDocs] [variant...]`. Variants: default,
  * scrambled, or `mh<hashes>@<dfFrac>` (e.g. mh16@0.05). */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(20000L)
    val variants = if (args.length > 1) args.drop(1).toSeq
      else Seq("default", "scrambled", "mh16@1.0", "mh16@0.05", "mh16@0.02",
        "mh32@0.05")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val conf = Builder.Config(blockSize = 128, nBuckets = 16, nSegments = 2,
      saltTarget = 2000, shufflePartitions = cpus, verifySegments = false,
      orderCols = Seq("ord", "repo", "path", "commit"))
    def bppOf(dir: String): Double = {
      val (pb, np) = spark.read.parquet(s"$dir/postings")
        .agg(sum(octet_length($"doc_deltas") + octet_length($"tfs") +
          octet_length($"dls")).cast("double"),
          sum($"num_docs").cast("long"))
        .as[(Double, Long)].head()
      pb / np
    }
    def fresh(): String = {
      val d = java.nio.file.Files.createTempDirectory("orderprobe")
      d.toFile.deleteOnExit(); d.toString
    }
    variants.foreach { v =>
      val corpus = Synth.localizedCorpus(spark, nDocs)
      val dir = fresh()
      val t0 = System.nanoTime()
      v match {
        case "default" =>
          Builder.build(spark, corpus, dir,
            conf.copy(orderCols = Seq("repo", "path", "commit")))
        case "scrambled" =>
          Builder.build(spark, corpus.withColumn("ord",
            pmod(xxhash64(col("path"), lit(7L)), lit(1L << 20))), dir, conf)
        case s =>
          val m = "mh(\\d+)@([0-9.]+)".r
          val perm = s match {
            case m(a, b) => DocOrder.minhashPermutation(corpus,
              nHashes = a.toInt, maxDfFraction = b.toDouble)
            case _ => sys.error(s"unknown variant $s")
          }
          Builder.build(spark, Builder.withPermutation(corpus, perm),
            dir, conf)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"ORDERPROBE $v bpp=${bppOf(dir)}%.3f build=$secs%.1fs")
      graft.util.Fs.delete(spark, dir)
    }
    spark.stop()
  }
}
