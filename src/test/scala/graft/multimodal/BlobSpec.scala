package graft.multimodal

import graft.SparkSpec

class BlobSpec extends SparkSpec {

  test("blob wrap preserves payload bytes and typed metadata") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).limit(10)
    val blobs = Blob.fromDocuments(docs, "doc_id", "text")
    val row = blobs.filter($"id" === 0L).collect()(0)
    assert(row.getAs[String]("mime") == "text/plain")
    val payload = row.getAs[Array[Byte]]("payload")
    val original = docs.filter($"doc_id" === 0L)
      .collect()(0).getAs[String]("text")
    assert(new String(payload, "UTF-8") == original)
    assert(row.getAs[Int]("width") == original.length)
  }

  test("stub decode runs partition-parallel with correct features") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).limit(20)
    val blobs = Blob.fromDocuments(docs, "doc_id", "text")
      .as[Blob.BlobRow].repartition(4)
    val feats = Blob.decode(blobs).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
      assert(f.thumb_h >= 1)
    }
  }

  test("resize fits maxDim, preserves aspect, never upscales") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).limit(20)
    val blobs = Blob.fromDocuments(docs, "doc_id", "text").as[Blob.BlobRow]
    val before = blobs.collect().map(b => b.id -> b).toMap
    val resized = Blob.resize(blobs, maxDim = 32).collect()
    assert(resized.length == 20) // 1:1 rows
    resized.foreach { r =>
      val b = before(r.id)
      assert(math.max(r.width, r.height) <= 32 ||
        math.max(b.width, b.height) <= 32) // fits, unless already small
      assert(r.width <= b.width && r.height <= b.height) // no upscale
      assert(r.payload.length <= b.payload.length) // stub codec shrinks
      assert(r.payload.length >= 1)
    }
  }

  /** A deterministic w×h PNG: left half solid dark (16,16,16), right
    * half solid bright (200,200,200) — real bytes through the real
    * encoder, with pinnable pixel statistics.
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) 16 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image decode is REAL: javax.imageio reads true dimensions " +
      "and pinned pixel statistics from a real PNG") {
    import spark.implicits._
    val bytes = pngBytes(8, 6)
    val blobs = Seq(
      Blob.BlobRow(1L, "image/png", 8, 6, 0L, bytes),
      // a corrupt payload under an image mime falls back to the stub
      Blob.BlobRow(2L, "image/png", 8, 6, 0L, Array[Byte](1, 2, 3)))
      .toDS()
    val feats = Blob.decode(blobs).collect().map(f => f.id -> f).toMap
    val real = feats(1L)
    assert(real.n_bytes == bytes.length)
    assert(real.thumb_w == 4 && real.thumb_h == 3)
    // half the pixels at 16, half at 200 -> mean channel value 108
    assert(math.abs(real.mean_byte - 108.0) < 1e-9)
    // the stub arm derives from bytes, not pixels
    val stub = feats(2L)
    assert(stub.n_bytes == 3)
    assert(math.abs(stub.mean_byte - 2.0) < 1e-9)
  }

  test("image resize is REAL: aspect-preserving bilinear rescale, " +
      "re-encoded payload decodes to the scaled dimensions") {
    import spark.implicits._
    val blobs = Seq(
      Blob.BlobRow(1L, "image/png", 8, 6, 0L, pngBytes(8, 6)))
      .toDS()
    val r = Blob.resize(blobs, maxDim = 4).collect()(0)
    assert(r.width == 4 && r.height == 3)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    assert(img.getWidth == 4 && img.getHeight == 3)
    // far-left column stays in the dark half, far-right in the bright
    // half at any interpolation (pixel centers map inside each half)
    assert((img.getRGB(0, 0) & 0xff) < 64)
    assert((img.getRGB(3, 0) & 0xff) > 150)
  }

  /** A deterministic 16-bit mono PCM square wave (period 16 frames,
    * amplitude `amp` — every sample is ±amp, so mean |s| = rms =
    * peak = amp exactly) in the given container, through the real
    * encoder.
    */
  private def audioBytes(tpe: javax.sound.sampled.AudioFileFormat.Type,
      rate: Float, nFrames: Int, amp: Short,
      bigEndian: Boolean): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rate, 16, 1, true, bigEndian)
    val bytes = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s: Int = if ((i / 8) % 2 == 0) amp.toInt else -amp.toInt
      val (lo, hi) = ((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
      if (bigEndian) { bytes(2 * i) = hi; bytes(2 * i + 1) = lo }
      else { bytes(2 * i) = lo; bytes(2 * i + 1) = hi }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong),
      tpe, bos)
    bos.toByteArray
  }

  test("audio decode is REAL: javax.sound.sampled reads true sample " +
      "rate, channels, frames and pinned PCM stats from WAV and AIFF") {
    import spark.implicits._
    val wav = audioBytes(javax.sound.sampled.AudioFileFormat.Type.WAVE,
      8000f, 4000, 1000, bigEndian = false)
    val aiff = audioBytes(javax.sound.sampled.AudioFileFormat.Type.AIFF,
      8000f, 4000, 1000, bigEndian = true)
    val blobs = Seq(
      Blob.BlobRow(1L, "audio/wav", 0, 0, 500L, wav),
      Blob.BlobRow(2L, "audio/x-aiff", 0, 0, 500L, aiff),
      // a corrupt payload under an audio mime profiles as empty
      Blob.BlobRow(3L, "audio/wav", 0, 0, 500L, Array[Byte](1, 2, 3)))
      .toDS()
    val f = Blob.decodeAudio(blobs).collect().map(x => x.id -> x).toMap
    for (id <- Seq(1L, 2L)) {
      assert(f(id).sample_rate == 8000 && f(id).channels == 1)
      assert(f(id).n_frames == 4000L)
      // square wave: every decoded sample is exactly ±1000
      assert(f(id).mean_abs == 1000.0)
      assert(f(id).rms == 1000.0)
      assert(f(id).peak == 1000)
    }
    assert(f(3L) == Blob.PcmFeatures(3L, 0, 0, 0L, 0.0, 0.0, 0))
    // and the generic feature face projects the PCM mean onto the
    // 8-bit scale instead of faking byte stats
    val gen = Blob.decode(blobs).collect().map(x => x.id -> x).toMap
    assert(math.abs(gen(1L).mean_byte - 1000.0 / 128.0) < 1e-12)
    assert(gen(1L).n_bytes == wav.length)
  }

  test("audio resize is REAL: frame-accurate truncation, re-encoded " +
      "payload decodes to the kept frames with unchanged amplitude") {
    import spark.implicits._
    val wav = audioBytes(javax.sound.sampled.AudioFileFormat.Type.WAVE,
      8000f, 4000, 1000, bigEndian = false)
    val blobs = Seq(Blob.BlobRow(1L, "audio/wav", 0, 0, 500L, wav)).toDS()
    val r = Blob.resize(blobs, maxDim = 200).collect()(0) // 200 ms
    assert(r.duration_ms == 200L)
    assert(r.payload.length < wav.length)
    val back = Blob.decodeAudio(Seq(r).toDS()).collect()(0)
    assert(back.n_frames == 1600L) // 8000 Hz * 0.2 s
    assert(back.mean_abs == 1000.0 && back.peak == 1000)
    // never lengthened: a cap beyond the clip keeps every frame
    val same = Blob.resize(blobs, maxDim = 10000).collect()(0)
    assert(Blob.decodeAudio(Seq(same).toDS()).collect()(0)
      .n_frames == 4000L)
  }

  test("audio frame sampling windows carry the exact PCM byte spans " +
      "of the decoded clip") {
    import spark.implicits._
    val wav = audioBytes(javax.sound.sampled.AudioFileFormat.Type.WAVE,
      8000f, 4000, 1000, bigEndian = false)
    // declared duration LIES (9999); the decoded truth (500 ms) wins
    val blobs = Seq(Blob.BlobRow(1L, "audio/wav", 0, 0, 9999L, wav)).toDS()
    val frames = Blob.frameSample(blobs, everyMs = 200).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 200L, 400L))
    // [0,200) and [200,400) hold 1600 frames * 2 bytes; [400,600)
    // holds the remaining 800 frames
    assert(frames.map(_.n_bytes).toSeq == Seq(3200, 3200, 1600))
  }

  test("audio faces handle empty input and a truncated header " +
      "without throwing") {
    import spark.implicits._
    assert(Blob.decodeAudio(spark.emptyDataset[Blob.BlobRow])
      .count() == 0)
    // a 4-byte "RIFF" prefix is audio-mime but not a parseable WAV
    val truncated = Seq(Blob.BlobRow(1L, "audio/wav", 0, 0, 100L,
      "RIFF".getBytes("US-ASCII"))).toDS()
    val f = Blob.decodeAudio(truncated).collect()(0)
    assert(f == Blob.PcmFeatures(1L, 0, 0, 0L, 0.0, 0.0, 0))
    // resize falls back to the stub, payload never grows
    val r = Blob.resize(truncated, maxDim = 10).collect()(0)
    assert(r.payload.length <= 4)
  }

  test("frame sampling fans out one row per sampled timestamp") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf).limit(10)
    val blobs = Blob.fromDocuments(docs, "doc_id", "text").as[Blob.BlobRow]
    val durations = blobs.collect().map(b => b.id -> b.duration_ms).toMap
    val frames = Blob.frameSample(blobs, everyMs = 500).collect()
    frames.groupBy(_.id).foreach { case (id, fs) =>
      val expected = (durations(id) / 500).toInt + 1 // t = 0, 500, ...
      assert(fs.length == expected)
      assert(fs.map(_.frame_idx).sorted.toList == (0 until expected).toList)
      fs.foreach(f => assert(f.ts_ms <= durations(id)))
    }
    assert(frames.groupBy(_.id).keySet == durations.keySet)
  }
}
