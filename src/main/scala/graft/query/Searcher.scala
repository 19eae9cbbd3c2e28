package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{Builder, Bm25, Posting, PostingBlock, Tokenizer}

/** Query engine — the Spark-native analog of `gin query find`
  * (/root/reference/src/gin_gin.c:672-723).
  *
  * Pipeline per batch of queries:
  *  1. tokenize query text with the SAME tokenizer as the build side
  *     (the bootstrap, /root/reference/src/gin_gin.c:682-721);
  *  2. dictionary probe (bucket + term partition-pruned read, collected —
  *     query terms are few) -> df/idf per term; a missing term kills a
  *     conjunctive query, the DEAD-fork analog
  *     (/root/reference/src/gin_gin.c:696-708);
  *  3. block-metadata interval intersection across the query's terms
  *     (driver-side, metadata only — the IMT-style pre-merge,
  *     /root/reference/src/gin_interval_merge_tree.c:178-209) prunes
  *     posting blocks that cannot contain a conjunctive candidate;
  *  4. surviving blocks are decoded distributedly, joined with the
  *     broadcast query-term table, scored with BM25, filtered to
  *     conjunctive matches, and reduced by the typed TopKAgg so only
  *     O(k) rows per query cross the final shuffle.
  *
  * Scores are rounded to 6 decimals *before* ranking so that ranking is
  * reproducible across engines (oracle parity); tie-break doc_id ASC.
  */
object Searcher {

  case class Query(query_id: Long, text: String)
  case class QueryTerm(query_id: Long, term: String, idf: Double, n_terms: Int)
  // not private: Catalyst codegen must be able to construct it
  case class BlockMeta(term: String, doc_id_base: Long, doc_id_max: Long)

  /** Max block-metadata rows the driver will collect for pruning; above
    * this we fall back to the fully distributed (unpruned) plan. */
  val MetaCap = 200000

  sealed trait Mode
  case object And extends Mode // posting-list intersection (north rule)
  case object Or extends Mode // disjunctive BM25

  /** Σ df above which searchTopK routes to the distributed relational
    * plan instead of the driver-local WAND loop. */
  val WandDfCap = 5000000L

  /** Per-query work counters from the last WAND invocation — the
    * reference's per-query stats (gin.c:1118-1151). Keyed by query_id. */
  val lastStats = new java.util.concurrent.ConcurrentHashMap[Long, Wand.QueryStats]()

  /** Top-k search over a built index — dispatcher.
    * Small posting volume (Σ df of the query's terms <= WandDfCap): the
    * exact block-max WAND loop over collected (still-compressed) blocks —
    * the serving path. Larger: the distributed relational plan. Both
    * produce identical rankings ((score6 DESC, doc_id ASC)).
    * Returns (query_id, rank, doc_id, score) with rank 1..k. */
  def searchTopK(spark: SparkSession, indexDir: String, queries: Seq[Query],
                 k: Int, mode: Mode = And, nBuckets: Int = 32): DataFrame = {
    val handle = IndexHandle.open(spark, indexDir, nBuckets)
    val allTerms = queries.flatMap(q => Tokenizer.tokens(q.text)).distinct
    val dfSum = handle.dfOf(allTerms).values.sum
    if (dfSum <= WandDfCap)
      searchTopKWand(spark, indexDir, queries, k, mode, nBuckets)
    else
      searchTopKRelational(spark, indexDir, queries, k, mode, nBuckets)
  }

  /** Driver-local exact BMW path (see Wand). Blocks for the query's
    * terms are collected still-compressed (varint payloads); whole
    * blocks are skipped by block-max metadata without decoding. */
  def searchTopKWand(spark: SparkSession, indexDir: String, queries: Seq[Query],
                     k: Int, mode: Mode = And, nBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    val handle = IndexHandle.open(spark, indexDir, nBuckets)
    val stats = handle.stats
    val termsPerQuery: Map[Long, Seq[String]] =
      queries.map(q => q.query_id -> Tokenizer.tokens(q.text).distinct.toSeq).toMap
    val allTerms = termsPerQuery.values.flatten.toSeq.distinct
    val dict = handle.dfOf(allTerms)
    val live = termsPerQuery.filter { case (_, ts) =>
      ts.nonEmpty && (mode match {
        case And => ts.forall(dict.contains)
        case Or  => ts.exists(dict.contains)
      })
    }
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, rank INT, doc_id BIGINT, score DOUBLE"))
    // head-cache fast path (Q9/Q10 analog): single-term queries on
    // cached head terms are answered without touching postings
    val (cacheMap, cacheK) = handle.headCache
    val (cachedQs, liveQs) = live.partition { case (_, ts) =>
      val present = ts.filter(dict.contains)
      present.size == 1 && k <= cacheK && cacheMap.contains(present.head)
    }
    val cachedRows = cachedQs.toSeq.flatMap { case (qid, ts) =>
      cacheMap(ts.filter(dict.contains).head).take(k).zipWithIndex
        .map { case (s, i) => (qid, i + 1, s.doc_id, s.score) }
    }

    val liveTerms = liveQs.values.flatten.toSeq.distinct.filter(dict.contains)
    val byTerm: Map[String, Array[graft.index.PostingBlock]] =
      if (liveTerms.isEmpty) Map.empty
      else handle.blocksFor(liveTerms)
        .select("term", "block_id", "doc_id_base", "doc_id_max", "num_docs",
          "max_tf", "min_dl", "doc_deltas", "tfs", "dls")
        .as[PostingBlock].collect()
        .groupBy(_.term).map { case (t, bs) => t -> bs.sortBy(_.doc_id_base) }
    val wandMode = if (mode == And) Wand.And else Wand.Or
    val rows = cachedRows ++ liveQs.toSeq.flatMap { case (qid, ts) =>
      val tbs = ts.filter(dict.contains).map { t =>
        Wand.TermBlocks(t, Bm25.idf(stats.n_docs, dict(t)),
          byTerm.getOrElse(t, Array.empty))
      }
      val (hits, qstats) = Wand.topK(tbs, k, stats.avgdl, wandMode)
      lastStats.put(qid, qstats)
      hits.zipWithIndex.map { case (s, i) => (qid, i + 1, s.doc_id, s.score) }
    }
    rows.toDF("query_id", "rank", "doc_id", "score")
  }

  /** Distributed relational plan (decode -> join -> aggregate -> typed
    * top-k); the path for posting volumes beyond the driver cap. */
  def searchTopKRelational(spark: SparkSession, indexDir: String, queries: Seq[Query],
                 k: Int, mode: Mode = And, nBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    val handle = IndexHandle.open(spark, indexDir, nBuckets)
    val stats = handle.stats

    val termsPerQuery: Map[Long, Seq[String]] =
      queries.map(q => q.query_id -> Tokenizer.tokens(q.text).distinct.toSeq).toMap
    val allTerms = termsPerQuery.values.flatten.toSeq.distinct

    // dictionary probe (warm handle; the cache-lookup analog Q10)
    val dict: Map[String, Long] = handle.dfOf(allTerms)

    // live queries: AND requires every term present
    val live = termsPerQuery.filter { case (_, ts) =>
      ts.nonEmpty && (mode match {
        case And => ts.forall(dict.contains)
        case Or  => ts.exists(dict.contains)
      })
    }
    val emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "query_id BIGINT, rank INT, doc_id BIGINT, score DOUBLE"))
    if (live.isEmpty) return emptyOut

    val liveTerms = live.values.flatten.toSeq.distinct.filter(dict.contains)
    val qterms: Seq[QueryTerm] = live.toSeq.flatMap { case (qid, ts) =>
      val present = ts.filter(dict.contains)
      present.map(t => QueryTerm(qid, t, Bm25.idf(stats.n_docs, dict(t)), ts.size))
    }

    val blocks0 = handle.blocksFor(liveTerms)

    // block-max/interval pruning (AND only): a conjunctive candidate doc
    // must lie in every term's covered doc ranges
    val blocks = if (mode == And) pruneBlocks(spark, blocks0, live, dict) else blocks0

    // native generator decode: binary block columns -> posting rows,
    // no case-class encoder round-trip
    val postings = blocks.select(col("term"),
        graft.functions.DecodePostings.rows(col("num_docs"),
          col("doc_deltas"), col("tfs"), col("dls"))
          .as(Seq("doc_id", "tf", "dl")))

    val qtDf = broadcast(qterms.toDF())
    val needAll = mode == And
    val scored = postings.join(qtDf, "term")
      .withColumn("contrib",
        col("idf") * lit(Bm25.K1 + 1.0) * col("tf") /
          (col("tf") + lit(Bm25.K1) *
            (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / lit(stats.avgdl))))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("raw_score"),
        count(lit(1)).as("nmatch"), first("n_terms").as("n_terms"))
      .filter(if (needAll) col("nmatch") === col("n_terms") else lit(true))
      .withColumn("score", round(col("raw_score"), 6))
      .select("query_id", "doc_id", "score")

    val topk = new TopKAgg(k)
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(topk.toColumn.name("topk"))
      .flatMap { case (qid, hits) =>
        hits.zipWithIndex.map { case (s, i) => (qid, i + 1, s.doc_id, s.score) }
      }
      .toDF("query_id", "rank", "doc_id", "score")
  }

  /** Count of conjunctive matches per query — the `(c:…)` match-count
    * analog (/root/reference/gin.c:1018-1023). */
  def countMatches(spark: SparkSession, indexDir: String, queries: Seq[Query],
                   nBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    // reuse the scoring pipeline with a huge k is wasteful; count directly
    val all = searchCandidates(spark, indexDir, queries, nBuckets)
    val out = all.groupBy("query_id").agg(count(lit(1)).as("n_matches"))
    // queries with zero matches still emit a row (explicit DEAD-fork rows)
    val ids = queries.map(_.query_id).toDF("query_id")
    ids.join(out, Seq("query_id"), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }

  /** All conjunctive (AND) matching (query_id, doc_id) pairs. */
  def searchCandidates(spark: SparkSession, indexDir: String,
                       queries: Seq[Query], nBuckets: Int = 32): DataFrame = {
    import spark.implicits._
    val termsPerQuery = queries.map(q => q.query_id -> Tokenizer.tokens(q.text).distinct.toSeq).toMap
    val allTerms = termsPerQuery.values.flatten.toSeq.distinct
    if (allTerms.isEmpty)
      return Seq.empty[(Long, Long)].toDF("query_id", "doc_id")
    val postings = IndexHandle.open(spark, indexDir, nBuckets)
      .blocksFor(allTerms).select(col("term"),
        graft.functions.DecodePostings.rows(col("num_docs"),
          col("doc_deltas"), col("tfs"), col("dls"))
          .as(Seq("doc_id", "tf", "dl")))
    val qt = termsPerQuery.toSeq.flatMap { case (qid, ts) =>
      ts.map(t => (qid, t, ts.size))
    }.toDF("query_id", "term", "n_terms")
    postings.join(broadcast(qt), "term")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("nmatch"), first("n_terms").as("n_terms"))
      .filter(col("nmatch") === col("n_terms"))
      .select("query_id", "doc_id")
  }

  /** Resolve top-k doc ids to (repo, path, commit) — the SA-range ->
    * (vid, offset) decode analog (/root/reference/src/gin_gin.c:817-863),
    * a broadcast join at small k. */
  def resolve(spark: SparkSession, indexDir: String, topk: DataFrame): DataFrame = {
    val meta = IndexHandle.open(spark, indexDir).docmeta
    topk.join(meta, Seq("doc_id"), "left")
      .select("query_id", "rank", "doc_id", "score", "repo", "path", "commit")
  }

  /** Driver-side interval-intersection pruning on block metadata.
    * For each live query: merge each term's block [base,max] intervals,
    * intersect across terms, keep blocks overlapping the intersection.
    * Falls back to no pruning above MetaCap metadata rows. */
  private def pruneBlocks(spark: SparkSession, blocks: DataFrame,
      live: Map[Long, Seq[String]], dict: Map[String, Long]): DataFrame = {
    import spark.implicits._
    val approxBlocks = dict.values.map(df => df / 64 + 1).sum
    if (approxBlocks > MetaCap) return blocks
    val meta = blocks.select("term", "doc_id_base", "doc_id_max")
      .as[BlockMeta].collect()
    if (meta.length > MetaCap) return blocks
    val byTerm: Map[String, Array[BlockMeta]] = meta.groupBy(_.term)
    val surviving = scala.collection.mutable.HashSet.empty[(String, Long)]
    live.foreach { case (_, ts) =>
      val present = ts.filter(byTerm.contains)
      if (present.nonEmpty && present.size == ts.size) {
        // intersect merged interval lists across terms
        var acc: Array[(Long, Long)] =
          mergeIntervals(byTerm(present.head).map(b => (b.doc_id_base, b.doc_id_max)))
        present.tail.foreach { t =>
          val iv = mergeIntervals(byTerm(t).map(b => (b.doc_id_base, b.doc_id_max)))
          acc = intersectIntervals(acc, iv)
        }
        present.foreach { t =>
          byTerm(t).foreach { b =>
            if (overlapsAny(acc, b.doc_id_base, b.doc_id_max))
              surviving += ((t, b.doc_id_base))
          }
        }
      }
    }
    if (surviving.isEmpty) blocks.filter(lit(false))
    else {
      val surv = surviving.toSeq.toDF("term", "doc_id_base")
      blocks.join(broadcast(surv), Seq("term", "doc_id_base"), "left_semi")
    }
  }

  /** Sort + coalesce overlapping intervals — the fork-compaction analog
    * (/root/reference/src/gin_gin.c:725-743). */
  def mergeIntervals(iv: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (iv.isEmpty) return iv
    val s = iv.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)](s.head)
    s.tail.foreach { case (lo, hi) =>
      val (plo, phi) = out.last
      if (lo <= phi + 1) out(out.length - 1) = (plo, math.max(phi, hi))
      else out += ((lo, hi))
    }
    out.toArray
  }

  /** Intersection of two merged interval lists (both sorted). */
  def intersectIntervals(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val lo = math.max(a(i)._1, b(j)._1)
      val hi = math.min(a(i)._2, b(j)._2)
      if (lo <= hi) out += ((lo, hi))
      if (a(i)._2 < b(j)._2) i += 1 else j += 1
    }
    out.toArray
  }

  private def overlapsAny(merged: Array[(Long, Long)], lo: Long, hi: Long): Boolean = {
    // binary search over sorted disjoint intervals
    var l = 0; var r = merged.length - 1
    while (l <= r) {
      val m = (l + r) >>> 1
      val (mlo, mhi) = merged(m)
      if (mhi < lo) l = m + 1
      else if (mlo > hi) r = m - 1
      else return true
    }
    false
  }
}
