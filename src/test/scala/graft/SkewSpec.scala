package graft

import org.apache.spark.sql.functions._
import graft.index.{Builder, CodeDoc}

/** Skew handling (north rule): a term present in EVERY doc must not
  * create a hot shuffle partition — salting splits it into doc-range
  * groups keyed by hash(term, salt). */
class SkewSpec extends SparkTestBase {

  private def skewedCorpus(n: Int) = {
    import spark.implicits._
    // "hot" appears in every doc; tail terms are per-doc unique
    (0 until n).map { i =>
      CodeDoc(f"repo_${i / 40}%04d", f"f_$i%05d.py", f"c$i%07d", "py",
        s"hot hot hot uniq_$i other_${i % 7}")
    }.toDF()
  }

  test("salted build splits the hot term across many partitions") {
    import spark.implicits._
    val n = 2000
    val salted = tmpDir("skew-salted")
    Builder.build(spark, skewedCorpus(n), salted,
      Builder.Config(blockSize = 64, nBuckets = 8, nSegments = 1,
        saltTarget = 200, shufflePartitions = 8))
    // every 'hot' block covers <= saltTarget-ish docs; block doc-spans
    // bounded by the salt span => many disjoint blocks, not one giant run
    val hotBlocks = spark.read.parquet(s"$salted/postings")
      .filter($"term" === "hot")
      .select($"doc_id_base", $"doc_id_max", $"num_docs")
      .as[(Long, Long, Int)].collect()
    assert(hotBlocks.map(_._3).sum == n)
    val nSalts = math.ceil(n / 200.0).toInt
    val span = math.ceil(n.toDouble / nSalts).toLong
    // no block spans a salt boundary
    hotBlocks.foreach { case (base, max, _) =>
      assert(base / span == max / span, s"block [$base,$max] crosses salt span $span")
    }
    // the hot term's postings actually landed in multiple shuffle
    // partitions (files), unlike an unsalted build
    def filesWithHot(dir: String): Int =
      new java.io.File(s"$dir/postings/segment=0").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .count { f =>
          !spark.read.parquet(f.getPath).filter($"term" === "hot").isEmpty
        }
    val unsalted = tmpDir("skew-unsalted")
    Builder.build(spark, skewedCorpus(n), unsalted,
      Builder.Config(blockSize = 64, nBuckets = 8, nSegments = 1,
        saltTarget = 1000000, shufflePartitions = 8))
    assert(filesWithHot(salted) >= 4, s"salted spread: ${filesWithHot(salted)}")
    assert(filesWithHot(unsalted) == 1)
    // and queries over the salted layout remain correct
    val hits = graft.query.Searcher.searchTopK(spark, salted,
      Seq(graft.query.Searcher.Query(1, "hot uniq_55")), 5)
      .collect()
    assert(hits.length == 1)
  }

  test("postings_raw write parallelism tracks nPart, not nBuckets") {
    // nBuckets << shufflePartitions: keying the staging shuffle on bucket
    // alone would populate at most nBuckets reduce tasks; the (bucket,
    // doc_id subsplit) key must spread the write across ~nPart tasks.
    // Writer part numbers (part-NNNNN-*) identify the reduce task that
    // wrote each file, so distinct part numbers = populated partitions.
    val nBuckets = 4
    val nPart = 16
    val dir = tmpDir("wide-write")
    Builder.build(spark, skewedCorpus(1200), dir,
      Builder.Config(blockSize = 64, nBuckets = nBuckets, nSegments = 1,
        saltTarget = 1000000, shufflePartitions = nPart))
    def partIds(sub: String): Set[Int] = {
      val root = new java.io.File(s"$dir/$sub")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getName)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        .map(_.stripPrefix("part-").take(5).toInt).toSet
    }
    val raw = partIds("postings_raw")
    assert(raw.size > nBuckets,
      s"postings_raw populated only ${raw.size} shuffle partitions " +
        s"(<= nBuckets=$nBuckets): build write parallelism collapsed")
    // the dictionary stage must spread the same way: its shuffle key is
    // (bucket, hash(term) subsplit), so a wide vocabulary populates more
    // reduce tasks than nBuckets (the last bucket-only collapse, r5)
    val dict = partIds("dictionary")
    assert(dict.size > nBuckets,
      s"dictionary populated only ${dict.size} shuffle partitions " +
        s"(<= nBuckets=$nBuckets): dictionary write parallelism collapsed")
    // queries over the subsplit layout stay correct
    val hits = graft.query.Searcher.searchTopK(spark, dir,
      Seq(graft.query.Searcher.Query(1, "hot uniq_7")), 5, nBuckets = nBuckets)
      .collect()
    assert(hits.length == 1)
  }

  test("sessionizePartitioned == sessionize, one mega-user spread over partitions") {
    import spark.implicits._
    import graft.ops.Events
    // ONE user, 4000 events: the per-user-window form funnels all of
    // them through a single task; the partitioned form must range-split
    // the timeline AND still reconstruct sessions that chain across
    // every partition boundary. Gap rule: > 10 min breaks. Event k is
    // 5 min after k-1, except every 100th event jumps 30 min (39
    // sessions of 100 events + the final one).
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = (0 until 4000).scanLeft(0L) { (t, k) =>
      t + (if (k % 100 == 0 && k > 0) 30L else 5L) * 60L * 1000000L
    }.tail.zipWithIndex.map { case (us, k) =>
      (k.toLong, ts(us), 7L, "e", BigDecimal(k % 13) + BigDecimal("0.25"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = Events.sessionize(events, 10)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val b = Events.sessionizePartitioned(events, 10, partitions = 8)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.length == 40)
    // the mega-user's timeline genuinely spread: >= 6 of the 8 range
    // partitions hold events (vs exactly 1 task in the window form)
    val spread = events
      .select(col("user_id").cast("long").as("u"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .repartitionByRange(8, col("u"), col("t"))
      .rdd.mapPartitions(it => Iterator(it.nonEmpty)).collect()
      .count(identity)
    assert(spread >= 6, s"single user occupied only $spread partitions")
    // multi-user interleaving: same equality on a mixed fixture
    val mixed = (0 until 2000).map { k =>
      val u = k % 5L
      (k.toLong, ts(k.toLong * 3L * 60L * 1000000L), u, "e",
        BigDecimal("1.10"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val ma = Events.sessionize(mixed, 10)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val mb = Events.sessionizePartitioned(mixed, 10, partitions = 7)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(ma == mb)
  }

  test("sessionizePartitioned NULL values: all-null session sums to NULL") {
    import spark.implicits._
    import graft.ops.Events
    def ts(min: Long) = new java.sql.Timestamp(min * 60L * 1000L)
    // user 1: one all-null-value session (sum_value must be NULL, like
    // sessionize's null-skipping decimal sum) and one mixed session
    // (nulls skipped, sum over the non-null values); user 2: non-null
    val rows = Seq(
      (1L, ts(0), 1L, "e", null.asInstanceOf[java.lang.Double]),
      (2L, ts(5), 1L, "e", null.asInstanceOf[java.lang.Double]),
      (3L, ts(60), 1L, "e", java.lang.Double.valueOf(2.5)),
      (4L, ts(65), 1L, "e", null.asInstanceOf[java.lang.Double]),
      (5L, ts(66), 1L, "e", java.lang.Double.valueOf(1.25)),
      (6L, ts(0), 2L, "e", java.lang.Double.valueOf(3.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = Events.sessionize(rows, 10)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    val b = Events.sessionizePartitioned(rows, 10, partitions = 4)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(a == b)
    // the all-null session really is NULL (not 0.0)
    assert(a.exists { case (u, _, n, sv) => u == 1L && n == 2L && sv.isEmpty })
    assert(a.exists { case (u, _, n, sv) =>
      u == 1L && n == 3L && sv.contains(3.75) })
  }
}
