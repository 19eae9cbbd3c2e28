package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time (and optionally explain) individual gate queries
  * outside the full benchmark — `runMain graft.tools.Probe <sfDir>
  * <reps> <query...>`. Prints per-rep seconds so a plan change can be
  * attributed without a 30-minute bench run. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_cosine_neardup", "q_dedup_clusters")
    val explain = sys.env.contains("GRAFT_PROBE_EXPLAIN")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.Gate.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name rep$r rows=$n secs=$secs%.2f")
      }
    }
    spark.stop()
  }
}
