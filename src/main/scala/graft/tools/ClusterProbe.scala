package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.index.Builder

/** Diagnostic: build throughput with N separate EXECUTOR PROCESSES
  * (local-cluster mode) instead of N threads in one JVM. Measured on
  * this host, allocation-heavy JVM work scales 2.8x over 4 threads in
  * one heap but 3.7x over 4 processes — executor-per-process is both
  * the real cluster topology and the fair scaling measurement. */
object ClusterProbe {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def session(nExec: Int, memMb: Int, scratch: String): SparkSession =
    SparkSession.builder()
      .master(s"local-cluster[$nExec,1,$memMb]")
      .appName(s"cluster-probe-$nExec")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions",
        s"$AddOpens -XX:ParallelGCThreads=2 -Xss4m")
      .config("spark.sql.shuffle.partitions", (nExec * 4).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val scratch = "/dev/shm/graft-cprobe"
    new java.io.File(scratch).mkdirs()
    // one session per leg: executors are real processes, so a session
    // restart means JIT-cold executors — warm up INSIDE the session,
    // then take the min of the timed runs
    def leg(nExec: Int): Double = {
      val spark = session(nExec, 6144, scratch)
      spark.sparkContext.setLogLevel("ERROR")
      def build(nDocs: Long, tag: String): Double = {
        val out = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(scratch), tag).toString
        val t0 = System.nanoTime()
        Builder.build(spark, Synth.corpus(spark, nDocs), out,
          Builder.Config(blockSize = 128, nBuckets = 32, nSegments = 1,
            saltTarget = 20000, shufflePartitions = nExec * 4,
            verifySegments = false))
        val total = (System.nanoTime() - t0) / 1e9
        println(f"[cprobe] execs=$nExec docs=$nDocs total=$total%.2f")
        total
      }
      build(3000, s"warm$nExec-")
      val t = (1 to reps).map(r => build(docs, s"c${nExec}r$r-")).min
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      t
    }
    val lo = leg(1)
    val hi = leg(4)
    println(f"[cprobe] min lo=$lo%.2f hi=$hi%.2f ratio=${lo / hi}%.2f eff=${lo / hi / 4}%.3f")
  }
}
