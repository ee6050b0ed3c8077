package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2 I): opaque binary payloads with
  * typed metadata, plus a decode/feature-extract pipeline whose
  * Spark-side plumbing (schema, partition-parallel batching, typed
  * boundaries) is real. The IMAGE codec is real — the JDK's
  * `javax.imageio` decodes/encodes png/jpeg/gif/bmp — and so is the
  * AUDIO codec: `javax.sound.sampled` (also JDK-shipped, zero extra
  * dependencies) parses WAV/AIFF/AU containers and decodes their PCM
  * (plus the AU µ-law/a-law encodings) to 16-bit samples, so audio
  * decode reads true sample rate / channels / amplitude statistics
  * and resize performs a true frame-accurate truncation re-encoded
  * through the same container writer. Only mimes NO JDK codec exists
  * for (video, compressed audio like mp3/ogg, text payloads) fall
  * back to the clearly-marked deterministic stub — this container
  * ships no video codec.
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

  /** Read an audio payload with the JDK codec, decoded to 16-bit
    * signed PCM; None when the mime isn't audio or no audio reader
    * accepts the bytes (the caller falls back to the stub). WAV and
    * AIFF PCM pass through; AU's µ-law/a-law convert through the
    * JDK's format-conversion provider.
    */
  private def readAudio(b: BlobRow)
      : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    if (!b.mime.startsWith("audio/") || b.payload.isEmpty) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b.payload))
        try {
          val base = ais.getFormat
          val pcm =
            if (base.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                base.getSampleSizeInBits == 16) ais
            else javax.sound.sampled.AudioSystem.getAudioInputStream(
              new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                base.getSampleRate, 16, base.getChannels,
                base.getChannels * 2, base.getSampleRate, false),
              ais)
          Some((pcm.getFormat, pcm.readAllBytes()))
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
        case _: IllegalArgumentException => None // no conversion provider
      }

  /** The (mean |sample|, rms, peak, frame count) of a 16-bit PCM
    * byte buffer, channel-interleaved, either endianness.
    */
  private def pcmStats(fmt: javax.sound.sampled.AudioFormat,
      bytes: Array[Byte]): (Double, Double, Int, Long) = {
    val big = fmt.isBigEndian
    val n = bytes.length / 2
    var i = 0
    var sumAbs = 0.0d
    var sumSq = 0.0d
    var peak = 0
    while (i + 1 < bytes.length) {
      val s =
        if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toInt
        else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
      val a = math.abs(s)
      sumAbs += a
      sumSq += s.toDouble * s
      if (a > peak) peak = a
      i += 2
    }
    val frames = bytes.length.toLong / math.max(fmt.getFrameSize, 1)
    if (n == 0) (0.0, 0.0, 0, 0L)
    else (sumAbs / n, math.sqrt(sumSq / n), peak, frames)
  }

  /** Decoder: REAL for image mimes (`javax.imageio` — true pixel
    * dimensions, mean over the RGB channel values) and for JDK-
    * decodable audio mimes (`javax.sound.sampled` — `mean_byte` is
    * the decoded PCM's mean absolute amplitude projected onto the
    * 8-bit scale, |s|/128 of a 16-bit sample, so image and audio
    * features share one range); deterministic byte-stat stub for
    * everything else. A deployment adding video swaps the stub arm
    * for its codec call; the mapPartitions batching, schema, and
    * typed boundary stay as-is. Audio consumers wanting the full
    * typed PCM profile use [[decodeAudio]].
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
    case None => readAudio(b) match {
      case Some((fmt, pcm)) =>
        val (meanAbs, _, _, _) = pcmStats(fmt, pcm)
        Features(b.id, b.payload.length,
          math.max(b.width / 2, 1), math.max(b.height / 2, 1),
          meanAbs / 128.0)
      case None =>
        // ??? <- video codec goes here; deterministic fake below
        val bytes = b.payload
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(x => (x & 0xff).toLong).sum.toDouble / bytes.length
        Features(b.id, bytes.length, b.width / 2, math.max(b.height / 2, 1), mean)
    }
  }

  /** Partition-parallel decode behind a typed boundary. */
  def decode(blobs: Dataset[BlobRow]): Dataset[Features] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeOne))
  }

  /** The full typed PCM profile of an audio blob: true sample rate,
    * channel count, frame count, and amplitude statistics (mean
    * absolute, RMS, peak) of the decoded 16-bit samples.
    */
  case class PcmFeatures(id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, mean_abs: Double, rms: Double, peak: Int)

  /** I2/I3 audio face — REAL decode through `javax.sound.sampled`:
    * WAV/AIFF/AU parse and their PCM (or µ-law/a-law) decodes to
    * 16-bit samples whose statistics land typed. Non-audio and
    * undecodable payloads profile as empty (all-zero stats, true
    * byte length preserved in `n_frames` = 0) rather than faking a
    * sample stream — the honest boundary for a feature a downstream
    * filter keys on. Partition-parallel, same shape as [[decode]].
    */
  def decodeAudio(blobs: Dataset[BlobRow]): Dataset[PcmFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      readAudio(b) match {
        case Some((fmt, pcm)) =>
          val (meanAbs, rms, peak, frames) = pcmStats(fmt, pcm)
          PcmFeatures(b.id, fmt.getSampleRate.toInt, fmt.getChannels,
            frames, meanAbs, rms, peak)
        case None => PcmFeatures(b.id, 0, 0, 0L, 0.0, 0.0, 0)
      }
    })
  }

  /** The JDK container writer for an audio mime, when one exists. */
  private def audioFileType(mime: String)
      : Option[javax.sound.sampled.AudioFileFormat.Type] = mime match {
    case "audio/wav" | "audio/x-wav" | "audio/wave" =>
      Some(javax.sound.sampled.AudioFileFormat.Type.WAVE)
    case "audio/aiff" | "audio/x-aiff" =>
      Some(javax.sound.sampled.AudioFileFormat.Type.AIFF)
    case "audio/basic" =>
      Some(javax.sound.sampled.AudioFileFormat.Type.AU)
    case _ => None
  }

  /** Resize: 1:1 row transform. Image mimes get a REAL aspect-
    * preserving bilinear rescale to fit `maxDim` pixels + re-encode
    * through `javax.imageio`; JDK-decodable audio mimes interpret
    * `maxDim` in their own axis — MILLISECONDS — and get a REAL
    * frame-accurate truncation re-encoded through the same container
    * writer (never lengthened, the audio analogue of never
    * upscaling); other mimes keep the stub codec (a byte prefix
    * proportional to the area ratio, so payload size tracks the
    * resize like a codec's). Metadata-only consumers still never
    * touch the bytes.
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
        case None => audioResize(b, maxDim).getOrElse(stubResize(b, maxDim))
      }
    })
  }

  /** REAL audio "resize": truncate the decoded PCM to at most
    * `maxMs` milliseconds of frames and re-encode through the blob's
    * own container writer. None when the payload isn't JDK-decodable
    * audio or its container has no writer (caller stubs).
    */
  private def audioResize(b: BlobRow, maxMs: Int): Option[BlobRow] =
    for ((fmt, pcm) <- readAudio(b); tpe <- audioFileType(b.mime)) yield {
      val frameSize = math.max(fmt.getFrameSize, 1)
      val total = pcm.length.toLong / frameSize
      val keep = math.min(total,
        (fmt.getSampleRate.toDouble * maxMs / 1000.0).toLong)
      val slice = java.util.Arrays.copyOf(pcm, (keep * frameSize).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(slice), fmt, keep),
        tpe, bos)
      // the decoded truth, not the declared metadata: frames kept
      // over the true sample rate
      val durMs =
        (keep * 1000.0 / math.max(fmt.getSampleRate.toDouble, 1.0)).toLong
      b.copy(duration_ms = durMs, payload = bos.toByteArray)
    }

  private def stubResize(b: BlobRow, maxDim: Int): BlobRow = {
    val longest = math.max(math.max(b.width, b.height), 1)
    val scale = math.min(1.0, maxDim.toDouble / longest)
    val (w, h) = (math.max((b.width * scale).toInt, 1),
      math.max((b.height * scale).toInt, 1))
    // ??? <- video scaler goes here; stub keeps an area-
    // proportional byte prefix so payload size tracks the resize
    val keep = math.max((b.payload.length * scale * scale).toInt, 1)
    b.copy(width = w, height = h,
      payload = b.payload.take(math.min(keep, b.payload.length)))
  }

  case class Frame(id: Long, frame_idx: Int, ts_ms: Long, n_bytes: Int)

  /** Frame sampling: the fan-out shape — one output row per sampled
    * timestamp (every `everyMs` through the blob's duration),
    * derived per partition with no driver loop. REAL for JDK-
    * decodable audio: the duration is the decoded truth (frames over
    * sample rate, not the declared metadata) and each row's
    * `n_bytes` is the exact PCM byte span of its [ts, ts+everyMs)
    * window. Other mimes keep the stub (declared duration, even byte
    * slices); a video deployment decodes the frame at `ts_ms` there.
    */
  def frameSample(blobs: Dataset[BlobRow], everyMs: Long): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      readAudio(b) match {
        case Some((fmt, pcm)) =>
          val frameSize = math.max(fmt.getFrameSize, 1)
          val rate = math.max(fmt.getSampleRate.toDouble, 1.0)
          val totalFrames = pcm.length.toLong / frameSize
          val trueMs = (totalFrames * 1000.0 / rate).toLong
          val n = math.max((trueMs / everyMs).toInt, 0)
          (0 to n).iterator.map { i =>
            val ts = i * everyMs
            val f0 = math.min((rate * ts / 1000.0).toLong, totalFrames)
            val f1 = math.min(
              (rate * (ts + everyMs) / 1000.0).toLong, totalFrames)
            Frame(b.id, i, ts, ((f1 - f0) * frameSize).toInt)
          }
        case None =>
          // frames at t = 0, everyMs, ... — floor keeps every ts
          // within the duration
          val n = math.max((b.duration_ms / everyMs).toInt, 0)
          (0 to n).iterator.map { i =>
            val ts = i * everyMs
            // ??? <- real video frame decode at ts; stub slices evenly
            val span = math.max(b.duration_ms, 1L)
            val off = ((b.payload.length * ts) / span).toInt
            Frame(b.id, i, ts, math.min(b.payload.length - off, 16).max(0))
          }
      }
    }
  }
}
