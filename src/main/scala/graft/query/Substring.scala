package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact substring (cross-token) search — the closest Spark analog of the
  * reference's FM-index backward search (`gin query find` matches
  * arbitrary 16-4096 char strings, /root/reference/src/gin_gin.c:672-723).
  *
  * Two phases, the classic trigram-index design (also how PostgreSQL
  * pg_trgm and Google Code Search work):
  *   1. candidates: docs containing ALL distinct character trigrams of
  *      the pattern — an AND over the `trigrams/` table (bucket + gram
  *      pushdown, counting semi-join; same shape as term intersection);
  *   2. verify: `contains(content, pattern)` evaluated over ONLY the
  *      candidate docs' content (a semi-joined scan, never the corpus).
  *
  * The result is EXACT for any pattern >= 3 chars (trigram pruning has no
  * false negatives). Output mirrors the reference's match decode
  * (/root/reference/gin.c:1018-1072: the `(c:…)` count and `(v:…,o:…)`
  * offset fields): per matching doc the occurrence count (non-overlapping,
  * left-to-right) and the 1-based offset of the first occurrence.
  *
  * Guardrails for the 100 TB deployment:
  *  - `maxMatches` caps the matching docs returned per query (lowest
  *    doc_ids kept — deterministic), the reference's --max-matches
  *    (/root/reference/gin.c:723-730);
  *  - patterns shorter than 3 chars cannot use the trigram index; they
  *    are REJECTED unless `allowShortScan = true`, because the fallback
  *    is a full corpus content scan — at petabyte scale that cost must
  *    be an explicit caller decision, never a default.
  */
object Substring {

  /** Max distinct trigrams probed per pattern (see viaIndex). */
  val MaxGramsPerQuery = 16

  /** Returns (query_id, doc_id, n_matches, first_offset). */
  def find(spark: SparkSession, indexDir: String,
           queries: Seq[(Long, String)], nBuckets: Int = 32,
           maxMatches: Long = Long.MaxValue,
           allowShortScan: Boolean = false): DataFrame = {
    import spark.implicits._
    require(graft.util.Fs.exists(spark, s"$indexDir/_COMMIT_trigrams"),
      s"index at $indexDir was built without storeTrigrams=true")
    // bucket layout comes from the index itself, not the caller: a
    // mismatched nBuckets computes wrong bucket ids -> silent false
    // negatives
    val buckets = graft.index.Builder.metaBuckets(spark, indexDir, nBuckets)
    require(queries.forall(_._2.nonEmpty), "empty substring pattern")
    val (indexed, short) = queries.partition(_._2.length >= 3)
    require(short.isEmpty || allowShortScan,
      s"patterns shorter than 3 chars (${short.map(_._2).mkString(", ")}) " +
        "require a full corpus scan; pass allowShortScan=true to accept " +
        "that cost explicitly")

    val corpus = spark.read.parquet(s"$indexDir/corpus_ids")
      .select("doc_id", "content")

    val viaIndex: Option[DataFrame] = if (indexed.isEmpty) None else {
      val qg = indexed.flatMap { case (qid, pat) =>
        val all = pat.sliding(3).toSeq.distinct
        // long patterns: probing EVERY gram scans index rows proportional
        // to pattern length for no extra pruning — any SUBSET of the
        // AND-conditions is still exact (superset of candidates, the
        // contains-verify stays the filter of record), so cap the probe
        // at MaxGramsPerQuery evenly spaced grams (the Google Code
        // Search / pg_trgm query-planning trick)
        val grams =
          if (all.size <= MaxGramsPerQuery) all
          else {
            val step = all.size.toDouble / MaxGramsPerQuery
            (0 until MaxGramsPerQuery).map(i => all((i * step).toInt)).distinct
          }
        grams.map(g => (qid, g, grams.size))
      }
      val grams = qg.map(_._2).distinct
      val tri = spark.read.parquet(s"$indexDir/trigrams")
        .filter(col("bucket").isin(
          grams.map(g => graft.util.Hashing.bucketOf(g, buckets)).distinct: _*)
          && col("gram").isin(grams: _*))
        .select("gram", "doc_id")
      val cand = tri.join(broadcast(qg.toDF("query_id", "gram", "n_grams")), "gram")
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("hit"), first("n_grams").as("n_grams"))
        .filter(col("hit") === col("n_grams"))
        .select("query_id", "doc_id")
      Some(cand
        .join(corpus, "doc_id")
        .join(broadcast(indexed.toDF("query_id", "pat")), "query_id"))
    }
    val viaScan: Option[DataFrame] = if (short.isEmpty) None else {
      // sub-trigram patterns: verify scan (explicitly opted into)
      Some(corpus.crossJoin(broadcast(short.toDF("query_id", "pat"))))
    }
    val candidates = (viaIndex, viaScan) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        Seq.empty[(Long, Long, String, String)]
          .toDF("query_id", "doc_id", "content", "pat")
    }
    // verify + decode in one codegen'd projection: occurrence count via
    // the length-of-replace identity (exactly reproducible in SQL), first
    // offset via instr (1-based)
    val matched = candidates
      .withColumn("first_offset", expr("instr(content, pat)").cast("long"))
      .filter(col("first_offset") > 0)
      .withColumn("n_matches",
        ((length(col("content")) -
          length(expr("replace(content, pat, '')"))) / length(col("pat")))
          .cast("long"))
      .select("query_id", "doc_id", "n_matches", "first_offset")
    if (maxMatches >= Int.MaxValue) matched
    else {
      // bounded per-query smallest-doc_id selection via a typed
      // aggregator (partial + final, O(maxMatches) rows per query cross
      // the shuffle) — a window would funnel EVERY match of a common
      // pattern through one task
      val agg = new MinKByDocAgg(maxMatches.toInt)
      matched.as[(Long, Long, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => SubMatch(r._2, r._3, r._4))
        .agg(agg.toColumn.name("hits"))
        .flatMap { case (qid, hits) =>
          hits.map(h => (qid, h.doc_id, h.n_matches, h.first_offset))
        }
        .toDF("query_id", "doc_id", "n_matches", "first_offset")
    }
  }
}
