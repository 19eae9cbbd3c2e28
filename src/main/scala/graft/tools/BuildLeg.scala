package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.index.Builder

/** One scaling leg: local[cores] build over the synthetic corpus, warmup
  * + min-of-reps, ONE line of output. Run under `taskset -c <cpus>` so
  * the leg sees exactly its core budget (the cpuset pinning YARN/K8s
  * executors get), making N vs 4N legs comparable on a shared host. */
object BuildLeg {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val docs = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 2
    val scratch = if (args.length > 3) args(3) else "/dev/shm/graft-leg"
    new java.io.File(scratch).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"build-leg-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def build(nDocs: Long): Double = {
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(scratch), s"leg$cores-").toString
      val t0 = System.nanoTime()
      Builder.build(spark, Synth.corpus(spark, nDocs), out,
        Builder.Config(blockSize = 128, nBuckets = 32, nSegments = 1,
          saltTarget = 20000, shufflePartitions = cores * 4,
          verifySegments = false))
      (System.nanoTime() - t0) / 1e9
    }
    build(3000) // JIT warmup
    val times = (1 to reps).map(_ => build(docs))
    // single parse-friendly line: LEG cores min times...
    println(f"LEG $cores ${times.min}%.3f " +
      times.map(t => f"$t%.2f").mkString(","))
    spark.stop()
  }
}
