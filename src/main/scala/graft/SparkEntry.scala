package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in Gate / Builder / Searcher / ops. */
object SparkEntry {
  /** Flagship: build the inverted index over the sf0.001 corpus and run
    * the reference query set, resolved to (repo, path, commit). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val idx = Gate.indexDir(spark, sfDir)
    graft.query.Searcher.resolve(spark, idx,
      graft.query.Searcher.searchTopK(spark, idx, Gate.GateQueries, 10,
        graft.query.Searcher.And, nBuckets = Gate.gateConfig.nBuckets))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Gate.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. EVERY query key has a full oracle — the
    * probabilistic ops (LSH/minhash/simhash/fingerprint) are built on the
    * cross-engine md5-derived h60 hash and exact integer arithmetic, so
    * nothing falls back to the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Gate.oracle
}
