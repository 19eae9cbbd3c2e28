package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.{Files, Paths}
import graft.index.{Builder, DocMeta, Posting, Tokenizer}
import graft.query.IndexHandle

/** Incremental index ingest via Structured Streaming.
  *
  * The reference is strictly batch (SURVEY §2.5: no streaming surface);
  * this is the continuous-ingest extension its segment architecture
  * makes natural: each micro-batch of new documents becomes ONE new
  * committed index segment (Lucene-style soft commit), appended to
  * docmeta / corpus_ids / postings_raw, with dictionary and stats
  * refreshed. Doc ids continue from the current count, so new segments'
  * doc ranges sit strictly above all existing blocks and the per-term
  * disjoint-sorted block invariant (WAND skips) is preserved by
  * construction. Block-max metadata is (max_tf, min_dl), which
  * upper-bounds scores for ANY avgdl, so stats drift across batches
  * cannot break pruning exactness.
  *
  * Idempotent per micro-batch (`_COMMIT_stream_batch_<id>` markers), so
  * foreachBatch retries after failures are safe — the streaming analog
  * of the resumable batch build.
  */
object IncrementalIndexer {

  /** Start a streaming ingest into `indexDir`. `corpusStream` must be a
    * streaming DataFrame with (repo, path, commit, lang, content). */
  def start(corpusStream: DataFrame, indexDir: String, conf: Builder.Config,
            checkpoint: String): StreamingQuery =
    corpusStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch.sparkSession, batch, indexDir, conf, batchId)
      }
      .start()

  /** Ingest one micro-batch (also usable directly for batch deltas). */
  def ingestBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                  conf: Builder.Config, batchId: Long): Unit = {
    import spark.implicits._
    val marker = s"_COMMIT_stream_batch_$batchId"
    if (Files.exists(Paths.get(indexDir, marker))) return
    if (batch.isEmpty) {
      Files.createDirectories(Paths.get(indexDir))
      Files.writeString(Paths.get(indexDir, marker), "{}")
      return
    }

    // bootstrap: first data ever -> plain batch build
    if (!Files.exists(Paths.get(indexDir, "_COMMIT_index"))) {
      Builder.build(spark, batch, indexDir, conf)
      Files.writeString(Paths.get(indexDir, marker), """{"bootstrap":true}""")
      IndexHandle.invalidate(spark, indexDir)
      return
    }

    val nPart = if (conf.shufflePartitions > 0) conf.shufflePartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = Builder.loadStats(spark, indexDir).n_docs

    // ids continue above every existing doc id
    val withIds = Builder.withDocIds(batch)
      .withColumn("doc_id", col("doc_id") + base)
      .select("doc_id", "repo", "path", "commit", "lang", "content")
      .repartition(nPart)
      .cache()

    withIds.write.mode(SaveMode.Append).parquet(s"$indexDir/corpus_ids")

    withIds.as[(Long, String, String, String, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, repo, path, commitId, lang, content) =>
          val dl = Tokenizer.tokens(content).length
          md.reset()
          val sha = md.digest(content.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          DocMeta(id, repo, path, commitId, lang, dl, sha)
        }
      }
      .write.mode(SaveMode.Append).parquet(s"$indexDir/docmeta")

    val nDocsBatch = withIds.count()

    // stats refresh (reads docmeta, writes stats: no self-overwrite)
    spark.read.parquet(s"$indexDir/docmeta")
      .agg(count(lit(1)).as("n_docs"), avg(col("dl").cast("double")).as("avgdl"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
    val avgdl = Builder.loadStats(spark, indexDir).avgdl

    // delta postings -> raw append + one new block segment
    val raw = withIds.select(col("doc_id"), col("content"))
      .as[(Long, String)]
      .flatMap { case (id, content) =>
        val ts = Tokenizer.tokens(content)
        val dl = ts.length
        val m = new java.util.HashMap[String, Int](64)
        var i = 0
        while (i < ts.length) { m.merge(ts(i), 1, Integer.sum _); i += 1 }
        val out = new Array[Posting](m.size)
        val it = m.entrySet().iterator()
        var j = 0
        while (it.hasNext) {
          val e = it.next(); out(j) = Posting(e.getKey, id, e.getValue, dl); j += 1
        }
        out
      }
      .withColumn("bucket", Builder.bucketOf(col("term"), conf.nBuckets))
      .cache()
    raw.repartition(nPart, col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("bucket")
      .parquet(s"$indexDir/postings_raw")

    raw.repartition(nPart, xxhash64(col("term")))
      .sortWithinPartitions("term", "doc_id")
      .select("term", "doc_id", "tf", "dl")
      .as[Posting]
      .mapPartitions(Builder.encodeBlocks(_, avgdl, conf.blockSize))
      .withColumn("bucket", Builder.bucketOf(col("term"), conf.nBuckets))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/postings/segment=s$batchId")

    // dictionary refresh from the appended raw table (no self-read)
    spark.read.parquet(s"$indexDir/postings_raw")
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .withColumn("bucket", Builder.bucketOf(col("term"), conf.nBuckets))
      .repartition(math.min(nPart, conf.nBuckets), col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$indexDir/dictionary")

    raw.unpersist()
    withIds.unpersist()
    Files.writeString(Paths.get(indexDir, marker),
      s"""{"docs":$nDocsBatch,"base":$base}""")
    IndexHandle.invalidate(spark, indexDir)
  }
}
