package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star tier): opaque `binary` payloads +
  * typed metadata, batch feature extraction, frame sampling.
  *
  * The Spark-side machinery is real and tested — binary columns, metadata
  * structs, typed `mapPartitions` batch processing (the Scala analogue of a
  * vectorized decode UDF), `posexplode`-style frame index generation. The
  * DECODE step is a clearly-marked deterministic STUB: this container has
  * no image/audio codecs, so `stubDecode` derives fake-but-reproducible
  * features from the payload bytes. Swapping in a real codec changes only
  * the body of `stubDecode`; schema, partitioning, and batch shape stay.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of the
    * text standing in for encoded media; media_type cycles deterministically.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast(IntegerType) + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Metadata projection: byte length + content hash — the catalog columns
    * a 100 TB media lake carries alongside the blobs.
    */
  def withMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha"))

  /** STUB decoder — deterministic fake in lieu of a real codec. A real
    * implementation would parse the container format here (per-partition,
    * so codec init cost amortizes across the batch).
    */
  private def stubDecode(m: MediaRow): MediaFeatures = {
    val n = m.payload.length
    val head = m.payload.take(256)
    MediaFeatures(
      m.doc_id, m.media_type,
      width = 64 + n % 1024,
      height = 64 + (n * 7) % 768,
      n_frames = 1 + n % 16,
      brightness = if (head.isEmpty) 0.0
        else head.map(_ & 0xff).sum.toDouble / head.length)
  }

  /** Batch feature extraction via typed mapPartitions — executor-side,
    * streaming over rows, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode))
  }

  /** Frame sampling: one row per sampled frame with its byte offset —
    * `posexplode` over a generated index range; downstream decode would
    * seek to `byte_off`.
    */
  def sampleFrames(features: DataFrame, meta: DataFrame): DataFrame =
    features
      .join(meta.select(col("doc_id"), col("n_bytes")), "doc_id")
      .select(col("doc_id"), col("n_frames"), col("n_bytes"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        (col("frame_idx") * (col("n_bytes").cast(LongType) / col("n_frames")).cast(LongType))
          .as("byte_off"))
}
