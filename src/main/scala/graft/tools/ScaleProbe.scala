package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.index.Builder

/** Diagnostic: per-stage build times at two parallelism levels, to split
  * fixed overhead from scalable work in the scaling-efficiency bench. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val nSegs = if (args.length > 2) args(2).toInt else 1
    val aqe = if (args.length > 3) args(3).toBoolean else false
    val partMult = if (args.length > 4) args(4).toInt else 1
    val loC = if (args.length > 5) args(5).toInt else 2
    val hiC = if (args.length > 6) args(6).toInt else 8
    val scratch = "/dev/shm/graft-probe"
    new java.io.File(scratch).mkdirs()
    def run(cores: Int, tag: String, nDocs: Long = docs): Double = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", (cores * partMult).toString)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.local.dir", s"$scratch/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(scratch), tag).toString
      val t0 = System.nanoTime()
      val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      Builder.build(spark, Synth.corpus(spark, nDocs), out,
        Builder.Config(blockSize = 128, nBuckets = 32, nSegments = nSegs,
          saltTarget = 20000, shufflePartitions = cores * partMult,
          verifySegments = false),
        (s, t) => stages += ((s, t)))
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[probe] cores=$cores total=$total%.2f stages=" +
        stages.map { case (s, t) => f"$s:$t%.2f" }.mkString(","))
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      total
    }
    // JIT warmup at each core count (small corpus: pays compilation, not
    // interpreted-mode execution over real data volume)
    run(loC, s"warm$loC-", 3000)
    run(hiC, s"warm$hiC-", 3000)
    val times = (1 to reps).flatMap { r =>
      Seq(loC -> run(loC, s"c${loC}r$r-"), hiC -> run(hiC, s"c${hiC}r$r-"))
    }
    val lo = times.filter(_._1 == loC).map(_._2).min
    val hi = times.filter(_._1 == hiC).map(_._2).min
    println(f"[probe] min lo=$lo%.2f hi=$hi%.2f ratio=${lo / hi}%.2f " +
      f"eff=${lo / hi / (hiC.toDouble / loC)}%.3f")
  }
}
