package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2 I): opaque binary payloads with
  * typed metadata, plus a decode/feature-extract pipeline whose
  * Spark-side plumbing (schema, partition-parallel batching, typed
  * boundaries) is real. The IMAGE codec is real too — the JDK's
  * `javax.imageio` decodes/encodes png/jpeg/gif/bmp with zero extra
  * dependencies, so image decode reads true pixel dimensions and
  * stats and resize performs a true bilinear rescale. Mimes the JDK
  * cannot decode (text payloads, audio, video) fall back to the
  * clearly-marked deterministic stub — this container ships no
  * audio/video codecs.
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
    * derived) — the plumbing stand-in for reading real media. Rows
    * with a NULL source column are skipped at this ingest boundary:
    * there is no payload to decode, and a null would violate the
    * non-nullable typed schema ([[BlobRow]].payload) downstream —
    * the media-pipeline equivalent of a missing file.
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull).select(col(idCol).as("id"),
      lit("text/plain").as("mime"),
      length(col(textCol)).as("width"),
      lit(1).as("height"),
      (length(col(textCol)).cast("long") * 10).as("duration_ms"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Read an image payload with the JDK codec; None when the mime
    * isn't an image or no ImageIO reader accepts the bytes (the
    * caller falls back to the stub).
    */
  private def readImage(b: BlobRow): Option[java.awt.image.BufferedImage] =
    if (!b.mime.startsWith("image/") || b.payload.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload)))
      catch { case _: java.io.IOException => None }

  /** Decoder: REAL for image mimes (`javax.imageio` — true pixel
    * dimensions, mean over the RGB channel values), deterministic
    * byte-stat stub for everything else. A deployment adding audio/
    * video swaps the stub arm for its codec call; the mapPartitions
    * batching, schema, and typed boundary stay as-is.
    */
  private def decodeOne(b: BlobRow): Features = readImage(b) match {
    case Some(img) =>
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0d
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      Features(b.id, b.payload.length,
        math.max(w / 2, 1), math.max(h / 2, 1),
        sum / (3.0d * w * h))
    case None =>
      // ??? <- audio/video codec goes here; deterministic fake below
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

  /** Resize: 1:1 row transform — new dimensions scaled to fit
    * `maxDim` (aspect preserved, never upscaled). Image mimes get a
    * REAL bilinear rescale + re-encode through `javax.imageio`; other
    * mimes keep the stub codec (a byte prefix proportional to the
    * area ratio, so payload size tracks the resize like a codec's).
    * Metadata-only consumers still never touch the bytes.
    */
  def resize(blobs: Dataset[BlobRow], maxDim: Int): Dataset[BlobRow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      readImage(b) match {
        case Some(img) =>
          val longest = math.max(math.max(img.getWidth, img.getHeight), 1)
          val scale = math.min(1.0, maxDim.toDouble / longest)
          val w = math.max((img.getWidth * scale).toInt, 1)
          val h = math.max((img.getHeight * scale).toInt, 1)
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          val fmt = b.mime.stripPrefix("image/")
          val wrote =
            try javax.imageio.ImageIO.write(out, fmt, bos)
            catch { case _: java.io.IOException => false }
          if (wrote) b.copy(width = w, height = h,
            payload = bos.toByteArray)
          else stubResize(b, maxDim) // no writer for this format
        case None => stubResize(b, maxDim)
      }
    })
  }

  private def stubResize(b: BlobRow, maxDim: Int): BlobRow = {
    val longest = math.max(math.max(b.width, b.height), 1)
    val scale = math.min(1.0, maxDim.toDouble / longest)
    val (w, h) = (math.max((b.width * scale).toInt, 1),
      math.max((b.height * scale).toInt, 1))
    // ??? <- audio/video scaler goes here; stub keeps an area-
    // proportional byte prefix so payload size tracks the resize
    val keep = math.max((b.payload.length * scale * scale).toInt, 1)
    b.copy(width = w, height = h,
      payload = b.payload.take(math.min(keep, b.payload.length)))
  }

  case class Frame(id: Long, frame_idx: Int, ts_ms: Long, n_bytes: Int)

  /** Frame sampling: the fan-out shape — one output row per sampled
    * timestamp (every `everyMs` through the blob's duration),
    * derived per partition with no driver loop; a real deployment
    * decodes the frame at `ts_ms` where the stub takes a byte slice.
    */
  def frameSample(blobs: Dataset[BlobRow], everyMs: Long): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      // frames at t = 0, everyMs, ... — floor keeps every ts within
      // the duration
      val n = math.max((b.duration_ms / everyMs).toInt, 0)
      (0 to n).iterator.map { i =>
        val ts = i * everyMs
        // ??? <- real frame decode at ts; stub slices bytes evenly
        val span = math.max(b.duration_ms, 1L)
        val off = ((b.payload.length * ts) / span).toInt
        Frame(b.id, i, ts, math.min(b.payload.length - off, 16).max(0))
      }
    }
  }
}
