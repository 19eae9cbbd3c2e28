package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sources producing the exact input_hint shape
  * `(repo, path, commit, lang, content)` — the `.ging` parse analog
  * (/root/reference/include/ging_parser.h:27-68). */
object Corpus {

  /** Map the driver's `documents.parquet` (doc_id, text, lang, source,
    * n_chars) onto the source-code-corpus shape. Deterministic and
    * SQL-mirrorable (the DuckDB oracle applies the identical mapping). */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("source").as("repo"),
        concat(lit("doc_"), lpad(col("doc_id").cast("string"), 8, "0"),
          lit(".txt")).as("path"),
        substring(md5(col("text")), 1, 8).as("commit"),
        col("lang"),
        col("text").as("content"))

  /** Alternate source format: JSON-lines with the corpus fields — the
    * second-reader analog of the reference's rGFA importer
    * (/root/reference/include/rgfa_parser.h): a different wire format
    * funneled into the SAME CodeDoc schema. */
  def fromJsonl(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("commit", StringType), StructField("lang", StringType),
      StructField("content", StringType)))
    spark.read.schema(schema).json(path)
      .select("repo", "path", "commit", "lang", "content")
  }

  /** Write a corpus back out (the `.ging` writer analog,
    * /root/reference/include/ging_parser.h:70-86); round-trip tested. */
  def write(corpus: DataFrame, path: String): Unit =
    corpus.select("repo", "path", "commit", "lang", "content")
      .write.mode("overwrite").parquet(path)
}

/** Query-set readers — the `.ginq` analog
  * (/root/reference/README.md:198-210: one query per line, `exit();`
  * sentinel ends the stream). */
object Queries {
  val Sentinel = "exit();"

  /** Read queries from a text file: one per line, stop at the sentinel,
    * ids are 1-based line positions among kept lines. */
  def fromFile(spark: SparkSession, path: String): Seq[graft.query.Searcher.Query] = {
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))).asScala
    lines.iterator
      .takeWhile(_.trim != Sentinel)
      .filter(_.trim.nonEmpty)
      .zipWithIndex
      .map { case (l, i) => graft.query.Searcher.Query(i + 1L, l) }
      .toSeq
  }

  /** Queries as a Dataset (for distributed batch querying). */
  def toDF(spark: SparkSession, qs: Seq[graft.query.Searcher.Query]) = {
    import spark.implicits._
    qs.toDF("query_id", "text")
  }
}

/** Deterministic synthetic code corpus for unit tests and benchmarks —
  * the bundled-fixture analog (/root/reference/res/graph.ging). Pure
  * function of (seed, docId): generation is distributed via
  * `spark.range` and reproducible at any scale. Vocabulary is Zipf-ish
  * so head-term skew is exercised (FIXTURES.md §1). */
object Synth {
  private val Langs = Array("py", "scala", "c", "java")
  private val VocabSize = 2000

  /** splitmix64 — public-domain mixing constants. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Zipf-ish rank draw: P(rank) ~ 1/(rank+1). */
  private def zipfRank(r: Long, n: Int): Int = {
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
    val hmax = math.log(n + 1.0)
    math.min(n - 1, (math.exp(u * hmax) - 1.0).toInt)
  }

  private def word(rank: Int): String = s"id_$rank"

  def doc(seed: Long, i: Long): graft.index.CodeDoc = {
    val h = mix(seed ^ mix(i))
    val nTokens = 20 + (mix(h ^ 1L) >>> 48).toInt % 380
    val sb = new StringBuilder(nTokens * 8)
    var j = 0
    while (j < nTokens) {
      val r = mix(h ^ (j + 2).toLong)
      sb.append(word(zipfRank(r, VocabSize)))
      j += 1
      if (j < nTokens) sb.append(if (j % 8 == 0) "\n" else " ")
    }
    graft.index.CodeDoc(
      repo = f"repo_${(i / 50)}%05d",
      path = f"src/pkg${(i % 50) / 10}%d/file_$i%08d.${Langs((mix(h ^ 7L) >>> 33).toInt.abs % 4)}",
      commit = f"${mix(h ^ 13L)}%016x".take(8),
      lang = Langs((mix(h ^ 7L) >>> 33).toInt.abs % 4),
      content = sb.toString)
  }

  def corpus(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map(i => doc(seed, i)).toDF()
  }

  /** Code-realistic variant: every other token is a REPO-LOCAL identifier
    * (`loc_<repo>_<rank>`), the rest global Zipf vocabulary. Real code
    * has exactly this locality, and it is why the reference anneals a
    * vertex permutation (/root/reference/src/gin_annealing.c): doc order
    * (repo, path) clusters repo-local terms into few posting blocks, so
    * block-max/skip metadata actually prunes. */
  def localizedDoc(seed: Long, i: Long): graft.index.CodeDoc = {
    val repoId = i / 50
    val h = mix(seed ^ mix(i) ^ 0x5bf03635L)
    val nTokens = 20 + (mix(h ^ 1L) >>> 48).toInt % 380
    val sb = new StringBuilder(nTokens * 10)
    var j = 0
    while (j < nTokens) {
      val r = mix(h ^ (j + 2).toLong)
      if ((r & 1L) == 0L)
        sb.append(s"loc_${repoId}_${zipfRank(mix(r), 100)}")
      else sb.append(word(zipfRank(r, VocabSize)))
      j += 1
      if (j < nTokens) sb.append(if (j % 8 == 0) "\n" else " ")
    }
    graft.index.CodeDoc(
      repo = f"repo_${repoId}%05d",
      path = f"src/pkg${(i % 50) / 10}%d/file_$i%08d.${Langs((mix(h ^ 7L) >>> 33).toInt.abs % 4)}",
      commit = f"${mix(h ^ 13L)}%016x".take(8),
      lang = Langs((mix(h ^ 7L) >>> 33).toInt.abs % 4),
      content = sb.toString)
  }

  def localizedCorpus(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map(i => localizedDoc(seed, i)).toDF()
  }
}
