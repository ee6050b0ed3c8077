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
