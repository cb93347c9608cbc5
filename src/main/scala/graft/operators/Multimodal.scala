package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] produces a deterministic fake decode from the
  * bytes. Everything around it — schema, partitioning, batch iteration,
  * feature extraction shape — is real and tested, so swapping in a real
  * decoder is a one-function change.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long,
      // "decoded" fixed-size feature vector (byte histogram over 8 bins)
      histogram: Array[Double],
      // "resize": leading-bytes thumbnail signature
      thumb_sig: Long,
      // "frame sample": every k-th byte, first 8 samples
      frame_sample: Array[Byte])

  /** Deterministic fake media table derived from the documents text bytes —
    * stands in for an ingested image/audio/video column. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, payload,
          width = 16 + (id % 64).toInt, height = 16 + (id % 48).toInt,
          duration_ms = if (kind == "image") 0L else 1000L + id % 60000)
      }
  }

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation would decode pixels/samples here; the batch iteration,
    * schema and partition shape are exactly what that version needs. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < row.payload.length) {
      hist((row.payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = math.max(row.payload.length, 1)
    (0 until 8).foreach(k => hist(k) /= n)
    val sig = row.payload.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    val stride = math.max(1, row.payload.length / 8)
    val sample = (0 until math.min(8, row.payload.length))
      .map(k => row.payload(k * stride)).toArray
    MediaFeatures(row.media_id, row.media_type, row.payload.length.toLong,
      hist, sig, sample)
  }

  /** Per-partition batch decode — one decoder instance per partition (where
    * a real codec would be initialized once per task, not per row). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init hook for a real codec lives here
      it.map(decodeStub)
    }
  }

  /** DataFrame surface used by SparkEntry: features flattened to columns. */
  def featuresDF(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("histogram"), 1), 6).as("hist_0"),
        round(element_at(col("histogram"), 4), 6).as("hist_3"),
        col("thumb_sig"),
        length(col("frame_sample")).as("n_frames"))
}
