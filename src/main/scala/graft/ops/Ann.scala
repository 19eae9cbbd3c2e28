package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k as a broadcast-join + column
  * expressions (`aggregate`/`zip_with`, fully codegen'd — no UDF).
  * Scale path: random-hyperplane LSH bucketing so candidate generation
  * is a bucket join instead of a cross product, plus an embedding-cosine
  * near-dup filter for dedup pipelines.
  */
object Ann {

  /** Σ a_i*b_i via zip_with + aggregate, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for each query vector.
    * queries is broadcast (small); corpus side streams — one pass, no
    * shuffle of the corpus, per-query top-k via TakeOrdered-style
    * window-free aggregation.
    * Returns (query_id, rank, neighbor_id, cos) with rank 1..k. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    import graft.query.{Scored, TopKAgg}
    val topk = new TopKAgg(k)
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(topk.toColumn.name("topk"))
      .flatMap { case (qid, hits) =>
        hits.zipWithIndex.map { case (s, i) => (qid, i + 1, s.doc_id, s.score) }
      }
      .toDF("query_id", "rank", "neighbor_id", "cos")
  }

  /** Random-hyperplane LSH bucket id: sign bits of `nPlanes` seeded
    * pseudo-random projections. Deterministic: plane p component i =
    * mix(seed, p, i) mapped to [-1, 1]. */
  def lshBucket(emb: Column, nPlanes: Int, seed: Long = 42L): Column = {
    // component hash -> [-1,1]: use xxhash64 of (p, i) via concat of lits
    // computed as a column expression over the positions
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (v, i) =>
          v.cast("double") *
            (pmod(xxhash64(lit(seed), lit(p), i), lit(2000001L)).cast("double")
              / 1000000.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates = same-bucket pairs
    * (bucket join, shuffle on bucket id), then exact cosine within the
    * bucket. Trades recall for eliminating the cross product. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val scored = qb.join(cb, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    import graft.query.{Scored, TopKAgg}
    val topk = new TopKAgg(k)
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(topk.toColumn.name("topk"))
      .flatMap { case (qid, hits) =>
        hits.zipWithIndex.map { case (s, i) => (qid, i + 1, s.doc_id, s.score) }
      }
      .toDF("query_id", "rank", "neighbor_id", "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (doc_a <
    * doc_b). Brute force within broadcastable scale; at cluster scale the
    * caller should pre-bucket with lshBucket and join on bucket. */
  def cosineNearDupPairs(corpus: DataFrame, minCos: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("doc_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("doc_b"), col("embedding").as("eb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
