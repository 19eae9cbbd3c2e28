package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Gate

/** Extra measurement harness for the optimization round (guide §1) —
  * Bench.scala is frozen, so per-query isolation work lives here.
  *
  * Times a SUBSET of the gate queries with the same methodology as the
  * frozen Bench (same session shape, `.count()` action, min-of-reps) and
  * optionally dumps `.explain("formatted")` for each query to a plans
  * directory, so plan claims in OPTIMIZATION_r06.md are reproducible.
  *
  * Usage:
  *   sbt "runMain graft.tools.BenchExtra [reps] [q1,q2,... | all]"
  * Env:
  *   SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS    cores (default 32)
  *   GRAFT_PLANS_DIR     if set, write <query><GRAFT_PLANS_SUFFIX>.txt
  *   GRAFT_PLANS_SUFFIX  suffix for plan files (default "_plan")
  */
object BenchExtra {

  private val scratch: String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-bench"
      else sys.props("java.io.tmpdir") + "/graft-bench"
    new java.io.File(base).mkdirs()
    base
  }

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 3
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") Gate.queries.keys.toSeq.sorted
      else args(1).split(',').toSeq
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val plansSuffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "_plan")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // pre-seed the shared gate index (idempotent build) + JIT warm-up
      Gate.indexDir(spark, sfDir)
      val runs = scala.collection.mutable.LinkedHashMap
        .empty[String, Seq[Double]]
      names.foreach { name =>
        val fn = Gate.queries(name)
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        plansDir.foreach { d =>
          new java.io.File(d).mkdirs()
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, s"$name$plansSuffix.txt"),
            plan.getBytes("UTF-8"))
        }
        val ts = (1 to reps).map { _ => time { fn(spark, sfDir).count() }._2 }
        runs(name) = ts
        println(f"EXTRA $name min=${ts.min}%.3f runs=${
          ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
      }
      val total = runs.values.map(_.min).sum
      println(runs.map { case (n, ts) => s""""$n":${f"${ts.min}%.3f"}""" }
        .mkString(s"""EXTRA_JSON {"total_min":${f"$total%.3f"},"queries":{""",
          ",", "}}"))
    } finally {
      spark.stop()
    }
  }
}
