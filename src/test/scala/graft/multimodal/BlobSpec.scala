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
