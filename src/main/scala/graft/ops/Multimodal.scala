package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads plus
  * typed metadata, processed per-partition in bounded batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs ship in this
  * container): `decodeStub` derives a small deterministic feature vector
  * from the bytes. Everything around it — schema, batch shape,
  * partitioning, the mapPartitions contract — is the real pipeline a
  * production decoder (e.g. a Pandas UDF via mapInPandas on the PySpark
  * side, or a JNI codec here) would slot into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, n_bytes: Long,
                      payload: Array[Byte])
  case class MediaFeature(doc_id: Long, media_type: String, n_bytes: Long,
                          feature: Seq[Double])

  /** Wrap a text corpus as a binary media table (the ingest shape:
    * payload BINARY + metadata columns). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder: deterministic 4-dim "feature" from the payload bytes
    * (mean byte, 16-bucket histogram entropy proxy, first/last byte).
    * A real decoder has exactly this signature: bytes -> fixed-size
    * vector, applied per-partition so batching/arrow shipping is free to
    * change underneath. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    var sum = 0L
    val hist = new Array[Long](16)
    payload.foreach { b =>
      val u = b & 0xff
      sum += u
      hist(u >> 4) += 1
    }
    val n = payload.length.toDouble
    val mean = sum / n
    val maxBucket = hist.max / n
    Array(mean, maxBucket, (payload.head & 0xff).toDouble,
      (payload.last & 0xff).toDouble)
  }

  /** Feature extraction over the media table: typed mapPartitions so the
    * decoder amortizes any per-batch init (model load, codec context) —
    * the Spark-side contract a real decoder needs. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "n_bytes", "payload").as[MediaRow]
      .mapPartitions { it =>
        // per-partition init would go here (decoder context)
        it.map(r => MediaFeature(r.doc_id, r.media_type, r.n_bytes,
          decodeStub(r.payload).toSeq))
      }
  }

  /** "Frame sampling" analog: deterministic every-nth-chunk sample of the
    * payload, emitted as one row per sampled chunk. */
  def sampleChunks(media: DataFrame, chunkBytes: Int, everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "n_bytes", "payload").as[MediaRow]
      .flatMap { r =>
        val p = if (r.payload == null) Array.empty[Byte] else r.payload
        p.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % everyNth == 0)
          .map { case (chunk, idx) =>
            (r.doc_id, idx, chunk.length, decodeStub(chunk).toSeq)
          }
      }
      .toDF("doc_id", "chunk_idx", "chunk_bytes", "chunk_feature")
  }
}
