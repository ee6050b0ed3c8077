package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2 I): opaque binary payloads with
  * typed metadata, plus a decode/feature-extract pipeline whose
  * Spark-side plumbing (schema, partition-parallel batching, typed
  * boundaries) is real while the codec itself is a clearly-marked
  * deterministic stub — this container ships no image/audio codecs.
  *
  * At 100 TB the payload column stays opaque binary in parquet;
  * filters and metadata projections never touch the bytes (column
  * pruning), and decode runs partition-parallel behind a typed
  * Dataset boundary exactly as a real JNI/FFI decoder would.
  */
object Blob {

  case class BlobRow(id: Long, mime: String, width: Int, height: Int,
      duration_ms: Long, payload: Array[Byte])

  case class Features(id: Long, n_bytes: Int, thumb_w: Int, thumb_h: Int,
      mean_byte: Double)

  /** Wrap a text corpus as blobs (payload = utf-8 bytes, metadata
    * derived) — the plumbing stand-in for reading real media.
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      lit("text/plain").as("mime"),
      length(col(textCol)).as("width"),
      lit(1).as("height"),
      (length(col(textCol)).cast("long") * 10).as("duration_ms"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake in place of a codec: "decodes"
    * a payload to its byte stats and a half-size "thumbnail" shape.
    * A real deployment swaps `decodeOne` for the codec call; the
    * mapPartitions batching, schema, and typed boundary stay as-is.
    */
  private def decodeOne(b: BlobRow): Features = {
    // ??? <- real codec goes here; deterministic fake below
    val bytes = b.payload
    val mean = if (bytes.isEmpty) 0.0
      else bytes.map(x => (x & 0xff).toLong).sum.toDouble / bytes.length
    Features(b.id, bytes.length, b.width / 2, math.max(b.height / 2, 1), mean)
  }

  /** Partition-parallel decode behind a typed boundary. */
  def decode(blobs: Dataset[BlobRow]): Dataset[Features] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeOne))
  }
}
