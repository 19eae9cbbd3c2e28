package graft.query

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{Bm25, Builder, PostingBlock}

/** Head-term result cache — the depth-k cache analog
  * (/root/reference/src/gin_gin.c:887-1304 precomputes the SA forks of
  * every string up to depth k so queries bootstrap past their suffix).
  * Here: the top-K results of every HEAD term (df >= minDf) are
  * precomputed at build time; a single-term query whose term is cached
  * is answered without touching postings at all. Head terms are exactly
  * the expensive ones (longest posting lists), so the cache converts the
  * worst-case single-term latency into a map lookup — same cost shape as
  * the reference's cache (big, cheap to consult, optional).
  *
  * Layout: `indexDir/head_cache/` (term, rank, doc_id, score) + a
  * `_COMMIT_head_cache` marker carrying (minDf, k).
  */
object HeadCache {

  /** Precompute top-k for all terms with df >= minDf. */
  def build(spark: SparkSession, indexDir: String, minDf: Long, k: Int): Unit = {
    import spark.implicits._
    val handle = IndexHandle.open(spark, indexDir)
    val stats = handle.stats
    val headTerms: Seq[(String, Long)] =
      spark.read.parquet(s"$indexDir/dictionary")
        .filter(col("df") >= minDf)
        .select("term", "df").as[(String, Long)].collect().toSeq
    val byTerm = handle.blocksFor(headTerms.map(_._1))
      .select("term", "block_id", "doc_id_base", "doc_id_max", "num_docs",
        "max_tf", "min_dl", "doc_deltas", "tfs", "dls")
      .as[PostingBlock].collect()
      .groupBy(_.term).map { case (t, bs) => t -> bs.sortBy(_.doc_id_base) }
    val rows = headTerms.flatMap { case (t, df) =>
      val tb = Wand.TermBlocks(t, Bm25.idf(stats.n_docs, df),
        byTerm.getOrElse(t, Array.empty))
      val (hits, _) = Wand.topK(Seq(tb), k, stats.avgdl, Wand.Or)
      hits.zipWithIndex.map { case (s, i) => (t, i + 1, s.doc_id, s.score) }
    }
    rows.toDF("term", "rank", "doc_id", "score")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/head_cache")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(indexDir, "_COMMIT_head_cache"),
      s"""{"minDf":$minDf,"k":$k}""")
    IndexHandle.invalidate(spark, indexDir)
  }

  /** Cached entries loaded by an IndexHandle (term -> ranked hits). */
  def load(spark: SparkSession, indexDir: String): (Map[String, Seq[Scored]], Int) = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(indexDir, "_COMMIT_head_cache")
    if (!java.nio.file.Files.exists(p)) return (Map.empty, 0)
    val meta = java.nio.file.Files.readString(p)
    val k = """"k":(\d+)""".r.findFirstMatchIn(meta).map(_.group(1).toInt).getOrElse(0)
    val m = spark.read.parquet(s"$indexDir/head_cache")
      .select("term", "rank", "doc_id", "score")
      .as[(String, Int, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(r => Scored(r._3, r._4)).toSeq
      }
    (m, k)
  }
}
