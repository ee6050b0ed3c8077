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
}
