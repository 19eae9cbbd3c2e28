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
  * The result is EXACT for any pattern (trigram pruning has no false
  * negatives); patterns shorter than 3 chars fall back to a full verify
  * scan. Returns (query_id, doc_id).
  */
object Substring {

  def find(spark: SparkSession, indexDir: String,
           queries: Seq[(Long, String)], nBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    require(graft.util.Fs.exists(spark, s"$indexDir/_COMMIT_trigrams"),
      s"index at $indexDir was built without storeTrigrams=true")
    val corpus = spark.read.parquet(s"$indexDir/corpus_ids")
      .select("doc_id", "content")
    val pats = queries.toDF("query_id", "pat")

    val (indexed, short) = queries.partition(_._2.length >= 3)

    val viaIndex: Option[DataFrame] = if (indexed.isEmpty) None else {
      val qg = indexed.flatMap { case (qid, pat) =>
        val grams = pat.sliding(3).toSeq.distinct
        grams.map(g => (qid, g, grams.size))
      }
      val grams = qg.map(_._2).distinct
      val tri = spark.read.parquet(s"$indexDir/trigrams")
        .filter(col("bucket").isin(
          grams.map(g => graft.util.Hashing.bucketOf(g, nBuckets)).distinct: _*)
          && col("gram").isin(grams: _*))
        .select("gram", "doc_id")
      val cand = tri.join(broadcast(qg.toDF("query_id", "gram", "n_grams")), "gram")
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("hit"), first("n_grams").as("n_grams"))
        .filter(col("hit") === col("n_grams"))
        .select("query_id", "doc_id")
      Some(cand
        .join(corpus, "doc_id")
        .join(broadcast(pats), "query_id")
        .filter(col("content").contains(col("pat")))
        .select("query_id", "doc_id"))
    }
    val viaScan: Option[DataFrame] = if (short.isEmpty) None else {
      // sub-trigram patterns: verify scan (rare; documented fallback)
      Some(corpus
        .crossJoin(broadcast(short.toDF("query_id", "pat")))
        .filter(col("content").contains(col("pat")))
        .select("query_id", "doc_id"))
    }
    (viaIndex, viaScan) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => Seq.empty[(Long, Long)].toDF("query_id", "doc_id")
    }
  }
}
