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
    * same parquet tables. Keys omitted here (LSH/minhash/simhash/
    * fingerprint/multimodal stub) are hash-function-specific and get the
    * driver's rows-only check; unit tests cover their semantics. */
  def oracleSql: Map[String, String] = Gate.oracle
}
