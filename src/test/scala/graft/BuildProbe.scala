package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.index.Builder

/** Dev probe: per-stage timing of the build at a given core count.
  * Run: sbt "Test/runMain graft.BuildProbe 32 60000" */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    new java.io.File("/dev/shm/graft-probe").mkdirs()
    val base = java.nio.file.Paths.get("/dev/shm/graft-probe")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-probe/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    Builder.build(spark, Synth.corpus(spark, 1000, seed = 7L),
      java.nio.file.Files.createTempDirectory(base, "w").toString,
      Builder.Config(nBuckets = 8, nSegments = 1, shufflePartitions = cores))
    println(s"=== cores=$cores docs=$nDocs")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      Builder.build(spark, Synth.corpus(spark, nDocs),
        java.nio.file.Files.createTempDirectory(base, "probe").toString,
        Builder.Config(blockSize = 128, nBuckets = 32, nSegments = 4,
          saltTarget = 20000, shufflePartitions = cores),
        (stage, secs) => println(f"STAGE $stage%-16s $secs%8.2f s"))
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
