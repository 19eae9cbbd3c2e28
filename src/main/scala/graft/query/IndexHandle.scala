package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.index.{Builder, Stats}

/** An opened index — the analog of `gin query`'s load-index-into-memory
  * step (/root/reference/gin.c:844-927 reads the whole .gini/.ginc into
  * RAM before the query batch). Holds:
  *
  *  - collection stats (tiny),
  *  - the dictionary as a driver-side map (term -> df) when the
  *    vocabulary is small enough, else per-query pruned parquet probes —
  *    the depth-k cache analog (/root/reference/src/gin_gin.c:1021-1304):
  *    head entries resident, tail served from the index;
  *  - the posting-block table persisted in executor memory
  *    (MEMORY_AND_DISK — blocks stay columnar + compressed, ~4 B/posting).
  *
  * Handles are cached per (session, dir) so repeated Searcher calls hit
  * warm state; `close()` unpersists.
  */
class IndexHandle private (
    val spark: SparkSession,
    val dir: String,
    fallbackBuckets: Int) {

  /** Layout params from the index's own _META.json (self-describing).
    * Read through the Hadoop FS API so index dirs work on any supported
    * filesystem (HDFS/S3A/local), not just java.io paths. */
  val nBuckets: Int = {
    val p = s"$dir/_META.json"
    if (graft.util.Fs.exists(spark, p)) {
      val s = graft.util.Fs.read(spark, p)
      """"nBuckets":(\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toInt).getOrElse(fallbackBuckets)
    } else fallbackBuckets
  }

  // heal an interrupted Compactor postings swap / dictionary fold — but
  // only when the on-disk state actually shows one (a missing table or a
  // leftover swap directory). A purely read-only open of a healthy index
  // must issue NO repair renames: a reader racing an in-progress
  // Compactor swap should never interleave its own renames with the
  // writer's (local-FS interleavings happen to converge, but S3A-style
  // rename semantics may not).
  {
    import graft.util.Fs
    if (!Fs.exists(spark, s"$dir/postings") ||
        Fs.exists(spark, s"$dir/postings_compact") ||
        Fs.exists(spark, s"$dir/postings_old"))
      Builder.recoverPostings(spark, dir)
    if (!Fs.exists(spark, s"$dir/dictionary") ||
        Fs.exists(spark, s"$dir/dictionary_predelta"))
      Builder.recoverDictionary(spark, dir)
  }

  val stats: Stats = Builder.loadStats(spark, dir)

  /** Vocabulary cap for driver-resident dictionary (~tens of MB at 1e6). */
  private val DictCap = 2000000L

  /** Streamed delta segments present? Fixed per handle life: ingest
    * invalidates the handle, so a fresh open re-checks. */
  private val hasDictDeltas: Boolean =
    graft.util.Fs.exists(spark, s"$dir/dict_deltas")

  private val dictCount: Long = Builder.dictionary(spark, dir).count()

  /** Full dictionary map (merged base + deltas) if it fits, else None ->
    * pruned probes. */
  val dictInMemory: Option[Map[String, Long]] =
    if (dictCount <= DictCap) {
      import spark.implicits._
      Some(Builder.dictionary(spark, dir)
        .select("term", "df").as[(String, Long)].collect().toMap)
    } else None

  /** Cap on postings bytes pinned in executor memory (configurable via
    * `graft.postings.persistCap`). Above it the handle serves blocks
    * from parquet with bucket + term pushdown — at petabyte scale only
    * the dictionary/stats are resident, exactly like the reference keeps
    * the cache resident but the FMI on disk when too large. */
  private val PersistCap: Long =
    spark.conf.getOption("graft.postings.persistCap")
      .map(_.toLong).getOrElse(8L << 30)

  val postingsBytes: Long = graft.util.Fs.dirBytes(spark, s"$dir/postings")
  val postingsResident: Boolean = postingsBytes <= PersistCap

  /** Posting blocks: persisted when they fit the cap, else a lazy
    * parquet scan (term/bucket filters push down to row groups). */
  val blocks: DataFrame = {
    val b = spark.read.parquet(s"$dir/postings")
      .select("term", "block_id", "doc_id_base", "doc_id_max", "num_docs",
        "max_tf", "min_dl", "doc_deltas", "tfs", "dls", "bucket")
    if (postingsResident) {
      val p = b.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // materialize
      p
    } else b
  }

  /** docmeta projected to the resolve columns, persisted. */
  private var docmetaLoaded = false
  lazy val docmeta: DataFrame = {
    val m = spark.read.parquet(s"$dir/docmeta")
      .select("doc_id", "repo", "path", "commit")
      .persist(StorageLevel.MEMORY_AND_DISK)
    m.count()
    docmetaLoaded = true
    m
  }

  private[query] def release(): Unit = {
    if (postingsResident) blocks.unpersist()
    if (docmetaLoaded) docmeta.unpersist()
  }

  /** Head-term result cache (present only if HeadCache.build ran). */
  lazy val headCache: (Map[String, Seq[Scored]], Int) =
    HeadCache.load(spark, dir)

  /** Head-pair (depth-2) result cache (present only if
    * HeadCache.buildPairs ran). */
  lazy val headCache2: (Map[(String, String), Seq[Scored]], Int) =
    HeadCache.loadPairs(spark, dir)

  /** Head-triple (depth-3) result cache (present only if
    * HeadCache.buildTriples ran). */
  lazy val headCache3: (Map[(String, String, String), Seq[Scored]], Int) =
    HeadCache.loadTriples(spark, dir)

  /** Per-term merged block [doc_id_base, doc_id_max] intervals (coarsened
    * to <= Searcher.MaxIvPerTerm by IntervalAgg), cached on the handle:
    * block metadata is index-static until ingest invalidates the handle,
    * so the relational prune pays its distributed interval aggregation
    * ONCE per term instead of once per query batch (the r2 relational
    * cold-start fix). Terms with no blocks cache an empty array so they
    * are never recomputed either. */
  private val intervalCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Long)]]()

  /** Cache entries are <= MaxIvPerTerm * 16 B each; at the cap the cache
    * is simply cleared (recompute is cheap and correct) so an adversarial
    * stream of distinct terms cannot grow driver memory unboundedly. */
  private val MaxCachedTerms = 65536

  /** Merged intervals for `terms`; absent/empty terms are omitted. */
  def intervalsFor(terms: Seq[String]): Map[String, Array[(Long, Long)]] = {
    import spark.implicits._
    if (intervalCache.size > MaxCachedTerms) intervalCache.clear()
    val missing = terms.distinct.filterNot(intervalCache.containsKey)
    if (missing.nonEmpty) {
      val ivAgg = new IntervalAgg(Searcher.MaxIvPerTerm)
      blocksFor(missing)
        .select(col("term"), col("doc_id_base"), col("doc_id_max"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(ivAgg.toColumn.name("iv"))
        .collect()
        .foreach { case (t, iv) => intervalCache.put(t, iv.toArray) }
      missing.filterNot(intervalCache.containsKey)
        .foreach(t => intervalCache.put(t, Array.empty))
    }
    terms.flatMap { t =>
      val iv = intervalCache.get(t)
      if (iv == null || iv.isEmpty) None else Some(t -> iv)
    }.toMap
  }

  /** Per-term max tfNorm over block metadata (max over blocks of
    * tfNorm(max_tf, min_dl, avgdl)) — the term-level score upper bound
    * feeding the relational OR maxscore prune
    * (Searcher.pruneBlocksOrMaxscore). Metadata-only aggregation, cached
    * like the interval cache (index-static until ingest invalidates the
    * handle). */
  private val ubCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Max tfNorm per term; absent/empty terms are omitted. */
  def maxTfNormOf(terms: Seq[String]): Map[String, Double] = {
    import spark.implicits._
    if (ubCache.size > MaxCachedTerms) ubCache.clear()
    val missing = terms.distinct.filterNot(ubCache.containsKey)
    if (missing.nonEmpty) {
      val a = stats.avgdl
      val k1 = graft.index.Bm25.K1
      val b = graft.index.Bm25.B
      blocksFor(missing)
        .groupBy("term")
        .agg(max(col("max_tf") / (col("max_tf") +
          lit(k1) * (lit(1 - b) + lit(b) * col("min_dl") / lit(a))))
          .as("ub"))
        .as[(String, Double)].collect()
        .foreach { case (t, ub) => ubCache.put(t, ub) }
      missing.filterNot(ubCache.containsKey)
        .foreach(t => ubCache.put(t, -1.0))
    }
    terms.flatMap { t =>
      val v = ubCache.get(t)
      if (v == null || v < 0) None else Some(t -> v.doubleValue)
    }.toMap
  }

  /** Probe results for the non-resident dictionary path, cached like the
    * interval cache (absent terms store -1 so they never re-probe; the
    * handle is dropped on ingest, so staleness cannot outlive the index
    * state it was read from). */
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** df per term for the given terms (absent term = absent key). The
    * non-resident path probes the base dictionary AND any delta segments
    * with full bucket + term pushdown on each scan, then sums per term —
    * merge-on-read without losing the pruned parquet probe. */
  def dfOf(terms: Seq[String]): Map[String, Long] = dictInMemory match {
    case Some(m) => terms.flatMap(t => m.get(t).map(t -> _)).toMap
    case None =>
      import spark.implicits._
      if (terms.isEmpty) return Map.empty
      if (dfCache.size > MaxCachedTerms) dfCache.clear()
      val missing = terms.distinct.filterNot(dfCache.containsKey)
      if (missing.nonEmpty) {
        def probe(path: String): Seq[(String, Long)] =
          spark.read.parquet(path)
            .filter(col("bucket").isin(
              missing.map(t => graft.util.Hashing.bucketOf(t, nBuckets)).distinct: _*)
              && col("term").isin(missing: _*))
            .select("term", "df").as[(String, Long)].collect().toSeq
        val rows = probe(s"$dir/dictionary") ++
          (if (hasDictDeltas) probe(s"$dir/dict_deltas") else Nil)
        rows.groupBy(_._1).foreach { case (t, rs) =>
          dfCache.put(t, rs.map(_._2).sum)
        }
        missing.filterNot(dfCache.containsKey)
          .foreach(t => dfCache.put(t, -1L))
      }
      terms.flatMap { t =>
        val v = dfCache.get(t)
        if (v == null || v < 0) None else Some(t -> v.longValue)
      }.toMap
  }

  /** Blocks restricted to the given terms. Resident: a filter over the
    * in-memory table. Non-resident: bucket directory pruning + term
    * predicate pushdown reach the parquet scan, so only the row groups
    * that can contain these terms are read. */
  def blocksFor(terms: Seq[String]): DataFrame =
    if (terms.isEmpty) blocks.filter(lit(false))
    else if (postingsResident) blocks.filter(col("term").isin(terms: _*))
    else blocks.filter(
      col("bucket").isin(
        terms.map(t => graft.util.Hashing.bucketOf(t, nBuckets)).distinct: _*)
        && col("term").isin(terms: _*))

  def close(): Unit = {
    release()
    IndexHandle.evict(spark, dir)
  }
}

object IndexHandle {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), IndexHandle]()

  def open(spark: SparkSession, dir: String, nBuckets: Int = 32): IndexHandle =
    cache.computeIfAbsent((spark.sparkContext.applicationId, dir),
      _ => new IndexHandle(spark, dir, nBuckets))

  private[query] def evict(spark: SparkSession, dir: String): Unit =
    cache.remove((spark.sparkContext.applicationId, dir))

  /** Drop the cached handle for `dir` (e.g. after incremental ingest
    * appended segments); the next open() sees the new index state. */
  def invalidate(spark: SparkSession, dir: String): Unit = {
    val h = cache.remove((spark.sparkContext.applicationId, dir))
    if (h != null) h.release()
  }
}
