package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D9/D10 maintenance — the G18 discipline applied to the text
  * indexes: served-after-append must equal fresh-over-union exactly,
  * and compaction must not change what the serve returns.
  */
class TextIndexMaintenanceSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text")

  private val query = "energy consumption in european countries"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("tfidf: save half, append half -> serve == fresh over union " +
      "(bit-equal), and compaction changes nothing") {
    val dir = tmp("graft_tfidf_maint")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    Tfidf.save(Tfidf.index(half1, "doc_id", "text"), dir)
    Tfidf.appendSaved(half2, "doc_id", "text", dir)
    val served = rows(Tfidf.searchSaved(spark, dir, query, 10))
    val freshDir = tmp("graft_tfidf_fresh")
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), freshDir)
    val fresh = rows(Tfidf.searchSaved(spark, freshDir, query, 10))
    assert(served == fresh)
    Tfidf.compactSaved(spark, dir)
    assert(rows(Tfidf.searchSaved(spark, dir, query, 10)) == fresh)
    // compaction really compacted: one file set in postings/
    val parts = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts <= spark.sparkContext.defaultParallelism)
  }

  test("tfidf: rederiveSaved is idempotent (the crash-recovery " +
      "re-run returns the same serve)") {
    val dir = tmp("graft_tfidf_rederive")
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), dir)
    val before = rows(Tfidf.searchSaved(spark, dir, query, 10))
    Tfidf.rederiveSaved(spark, dir)
    Tfidf.rederiveSaved(spark, dir)
    assert(rows(Tfidf.searchSaved(spark, dir, query, 10)) == before)
  }

  test("bm25: save half, append half in O(batch) -> serve == fresh " +
      "over union (bit-equal), and compaction changes nothing") {
    val dir = tmp("graft_bm25_maint")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    Bm25.save(spark, half1, "doc_id", "text", dir)
    Bm25.appendSaved(half2, "doc_id", "text", dir)
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    val freshDir = tmp("graft_bm25_fresh")
    Bm25.save(spark, docs, "doc_id", "text", freshDir)
    val fresh = rows(Bm25.servedTopK(spark, freshDir, query, 10))
    assert(served == fresh)
    // and both equal the in-session scorer on the union corpus
    val live = rows(Bm25.topK(spark, docs, "doc_id", "text", query, 10))
    assert(served == live)
    Bm25.compactSaved(spark, dir)
    assert(rows(Bm25.servedTopK(spark, dir, query, 10)) == fresh)
  }

  test("bm25: tombstoned delete -> serve == fresh over remaining, " +
      "re-delete is a no-op, compaction materializes and still serves") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("graft_bm25_del")
    Bm25.save(spark, docs, "doc_id", "text", dir)
    val delIds = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"))
    Bm25.deleteSaved(delIds, dir)
    val statsAfter = spark.read
      .schema("n_docs BIGINT, tot_dl BIGINT").parquet(s"$dir/stats")
      .collect()(0)
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    val remaining = docs.filter(col("doc_id") % 5 =!= 0)
    val freshDir = tmp("graft_bm25_del_fresh")
    Bm25.save(spark, remaining, "doc_id", "text", freshDir)
    assert(served == rows(Bm25.servedTopK(spark, freshDir, query, 10)))
    // re-delivering the same delete batch changes nothing
    Bm25.deleteSaved(delIds, dir)
    val statsAgain = spark.read
      .schema("n_docs BIGINT, tot_dl BIGINT").parquet(s"$dir/stats")
      .collect()(0)
    assert(statsAgain.toSeq == statsAfter.toSeq)
    assert(rows(Bm25.servedTopK(spark, dir, query, 10)) == served)
    // compaction physically removes the tombstoned rows
    Bm25.compactSaved(spark, dir)
    assert(rows(Bm25.servedTopK(spark, dir, query, 10)) == served)
    val physIds = spark.read.schema("id BIGINT, dl BIGINT")
      .parquet(s"$dir/dl").select("id").as[Long].collect().toSet
    assert(physIds.forall(_ % 5 != 0))
    assert(!graft.FsOps.fs(spark, dir)
      .exists(new org.apache.hadoop.fs.Path(s"$dir/deleted")))
  }

  test("tfidf: delete -> serve == fresh over remaining") {
    val dir = tmp("graft_tfidf_del")
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), dir)
    Tfidf.deleteSaved(
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id")),
      dir)
    val served = rows(Tfidf.searchSaved(spark, dir, query, 10))
    val remaining = docs.filter(col("doc_id") % 5 =!= 0)
    val freshDir = tmp("graft_tfidf_del_fresh")
    Tfidf.save(Tfidf.index(remaining, "doc_id", "text"), freshDir)
    assert(served == rows(Tfidf.searchSaved(spark, freshDir, query, 10)))
  }

  test("bm25: a partially landed tombstone batch is repaired by " +
      "re-running the delete (the delete's only write is its commit)") {
    val dir = tmp("graft_bm25_crash_del")
    Bm25.save(spark, docs, "doc_id", "text", dir)
    val delIds = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"))
    // crash simulation: only half the batch's tombstones landed
    Bm25.deleteSaved(delIds.filter(col("id") % 10 === 0), dir)
    // recovery = re-deliver the whole batch; the landed prefix is
    // filtered out and exactly the remainder lands
    Bm25.deleteSaved(delIds, dir)
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    val freshDir = tmp("graft_bm25_crash_del_fresh")
    Bm25.save(spark, docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", freshDir)
    assert(served == rows(Bm25.servedTopK(spark, freshDir, query, 10)))
    // and the STORED totals were never touched by the deletes — the
    // decrement is derived from the tombstones at serve time
    val full = spark.read.schema("n_docs BIGINT, tot_dl BIGINT, epoch BIGINT")
      .parquet(s"$dir/stats").collect()(0)
    val fresh0 = spark.read.schema("n_docs BIGINT, tot_dl BIGINT")
      .parquet(s"$freshDir/stats").collect()(0)
    assert(full.getLong(0) > fresh0.getLong(0))
    assert(full.getLong(2) == 0L)
  }

  test("bm25: compaction's epoch bump atomically invalidates " +
      "tombstones (a stale-generation tombstone row is invisible)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("graft_bm25_epoch")
    Bm25.save(spark, docs, "doc_id", "text", dir)
    Bm25.deleteSaved(
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id")),
      dir)
    Bm25.compactSaved(spark, dir)
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    assert(spark.read.schema("n_docs BIGINT, tot_dl BIGINT, epoch BIGINT")
      .parquet(s"$dir/stats").collect()(0).getLong(2) == 1L)
    // crash simulation: compaction swapped stats (epoch 0 -> 1) but
    // died before sweeping deleted/ — its rows carry epoch 0 and no
    // serve may look at them
    val ghost = docs.filter(col("doc_id") % 5 === 1)
      .select(col("doc_id").as("id")).limit(3)
      .withColumn("dl", lit(10L)).withColumn("epoch", lit(0L))
    ghost.write.mode("append").parquet(s"$dir/deleted")
    assert(rows(Bm25.servedTopK(spark, dir, query, 10)) == served)
    // and the next compaction reduces to a plain file rewrite
    Bm25.compactSaved(spark, dir)
    assert(rows(Bm25.servedTopK(spark, dir, query, 10)) == served)
  }

  test("tfidf: a crash between the postings append and the rederive " +
      "is repaired by rederiveSaved alone (stats are derived)") {
    val dir = tmp("graft_tfidf_crash_app")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    Tfidf.save(Tfidf.index(half1, "doc_id", "text"), dir)
    // crash simulation: appendSaved's postings append landed, then
    // the process died — stats and the derived layers are stale
    Tfidf.postings(half2, "doc_id", "text")
      .repartition(col("term")).sortWithinPartitions("term")
      .write.mode("append").parquet(s"$dir/postings")
    // recovery: one rederive repairs n_docs AND the derived layers
    Tfidf.rederiveSaved(spark, dir)
    val served = rows(Tfidf.searchSaved(spark, dir, query, 10))
    val freshDir = tmp("graft_tfidf_crash_app_fresh")
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), freshDir)
    assert(served == rows(Tfidf.searchSaved(spark, freshDir, query, 10)))
  }

  test("J22 bm25 ingest stream: document micro-batches append " +
      "idempotently and the served index equals fresh-over-union") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("graft_bm25_ingest")
    val ckpt = tmp("graft_bm25_ingest_ck")
    Bm25.save(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val b2 = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.bm25IngestStream(
        src.toDF().toDF("doc_id", "text"), "doc_id", "text", dir)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    def nDl = spark.read.schema("id BIGINT, dl BIGINT")
      .parquet(s"$dir/dl").count()
    val n = nDl
    // at-least-once re-delivery: a COMMITTED batch id is a no-op
    Bm25.appendSavedOnce(b1.toDF("doc_id", "text"),
      "doc_id", "text", dir, 0L)
    assert(nDl == n, "re-delivered batch duplicated documents")
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    assert(served == rows(Bm25.topK(spark, docs, "doc_id", "text",
      query, 10)))
  }

  test("J23 tfidf ingest stream: micro-batches land through the " +
      "rederive and the served index equals fresh-over-union") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("graft_tfidf_ingest")
    val ckpt = tmp("graft_tfidf_ingest_ck")
    Tfidf.save(Tfidf.index(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text"), dir)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val b2 = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.tfidfIngestStream(
        src.toDF().toDF("doc_id", "text"), "doc_id", "text", dir)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val nDocs = spark.read.schema("n_docs BIGINT")
      .parquet(s"$dir/stats").collect()(0).getLong(0)
    Tfidf.appendSavedOnce(b1.toDF("doc_id", "text"),
      "doc_id", "text", dir, 0L)
    assert(spark.read.schema("n_docs BIGINT").parquet(s"$dir/stats")
      .collect()(0).getLong(0) == nDocs,
      "re-delivered batch duplicated documents")
    val served = rows(Tfidf.searchSaved(spark, dir, query, 10))
    val freshDir = tmp("graft_tfidf_ingest_fresh")
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), freshDir)
    assert(served == rows(Tfidf.searchSaved(spark, freshDir, query, 10)))
  }

  test("bm25: a second append batch composes (three-way split)") {
    val dir = tmp("graft_bm25_maint3")
    Bm25.save(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir)
    Bm25.appendSaved(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", dir)
    Bm25.appendSaved(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", dir)
    val served = rows(Bm25.servedTopK(spark, dir, query, 10))
    assert(served == rows(Bm25.topK(spark, docs, "doc_id", "text",
      query, 10)))
  }
}
