package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * The actual decoders (image/audio/video libs) are NOT available in this
  * environment — the decode step is a clearly-marked deterministic STUB
  * (`stubDecode`); everything around it (schema, batching, partitioning, the
  * per-partition iterator shape a real JNI/FFI decoder would plug into) is
  * real and tested.
  */
object Multimodal {

  /** Extracted feature record a real decoder would produce per media item. */
  final case class MediaFeatures(id: Long, n_bytes: Int, format: String,
                                 checksum: Long, head: Array[Byte])

  /** Attach a binary payload + typed metadata struct to a text corpus
    * (here the payload is the UTF-8 content itself; in production it is the
    * image/audio blob read from object storage).
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(col(textCol)).as("n_bytes"),
        lit("text/plain").as("mime"),
        lit(1).as("version")).as("media_meta"))

  /** STUB for the real media decode. Deterministic fake: checksum = byte sum,
    * head = first 8 bytes. A real implementation would call the codec here —
    * one call per item, batched per partition, nothing else changes.
    */
  def stubDecode(id: Long, payload: Array[Byte]): MediaFeatures = {
    // ??? <- real decoder (libjpeg/ffmpeg/...) goes here; stubbed:
    val checksum = payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    MediaFeatures(id, payload.length, "text/plain", checksum,
      payload.take(8))
  }

  /** Partition-batched decode: the Spark-side plumbing for expensive per-item
    * decoders — `mapPartitions` so codec/context initialization amortizes over
    * the whole batch (the Scala analogue of a pandas-batch UDF). Input stays
    * partitioned; no shuffle, no driver round-trip.
    */
  def decodeFeatures(df: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init of a real decoder context would happen here
        batch.map { case (id, payload) => stubDecode(id, payload) }
      }
  }

  /** Frame-sampling stub as pure column expressions (start / middle / end
    * windows of the payload) — the shape of thumbnail/frame extraction,
    * engine-mirrorable for the oracle.
    */
  def frameSamples(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    df.select(
      col(idCol),
      n.as("n_bytes"),
      md5(text).as("content_hash"),
      substring(text, 1, 8).as("frame_head"),
      // `div` (not cast-of-/) so the midpoint floors identically across engines
      expr(s"substring($textCol, greatest(1, length($textCol) div 2), 8)").as("frame_mid"),
      expr(s"substring($textCol, greatest(1, length($textCol) - 7), 8)").as("frame_tail"))
  }
}
