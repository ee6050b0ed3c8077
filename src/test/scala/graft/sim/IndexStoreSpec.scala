package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** G15 — the persisted-index lifecycle: save → load → serve must be
  * indistinguishable from the in-session build, and the serve-time
  * candidate scan must be partition-pruned to the probed lists (the
  * property that makes a saved index worth having at 100 TB).
  */
class IndexStoreSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  private lazy val ixDir: String = {
    val d = Files.createTempDirectory("graft_ix").toString
    IndexStore.saveGiven(emb, d)
    d
  }

  test("served knn from a saved index is bit-identical to the fresh build") {
    val fresh = Ivf.knnGivenCentroids(emb, col("vec_id") < 5, 3)
    val served = IndexStore.servedKnnGiven(spark, ixDir, col("vec_id") < 5, 3)
    assert(served.schema == fresh.schema)
    assert(served.collect().toSeq == fresh.collect().toSeq)
  }

  test("serve-time candidate scan is partition-pruned to the probed lists") {
    val served = IndexStore.servedKnnGiven(spark, ixDir, col("vec_id") < 5, 3)
    val plan = served.queryExecution.executedPlan.toString
    // the lists scan must carry the probe set as PARTITION filters —
    // a post-scan Filter would mean the full corpus is read
    val pruned = "PartitionFilters: \\[[^\\]]*list_id[^\\]]*IN".r
      .findFirstIn(plan)
    assert(pruned.isDefined, s"no partition IN-filter on list_id in:\n$plan")
  }

  test("an empty query batch serves an empty result, not a scan or a crash") {
    val served = IndexStore.servedKnnGiven(spark, ixDir, col("vec_id") < 0, 3)
    assert(served.count() == 0)
  }

  test("the driver-query face round-trips through the content-addressed dir") {
    val served = IndexStore.knnServedQ(spark, sf)
    val fresh = Ivf.knnGivenCentroidsQ(spark, sf)
    assert(served.collect().toSeq == fresh.collect().toSeq)
  }

  test("tfidf search from a saved index is bit-identical to the fresh build") {
    import graft.text.{RagQueries, Tfidf}
    val docs = Tables.documents(spark, sf)
    val ixDir = Files.createTempDirectory("graft_tfidf_ix").toString
    Tfidf.save(Tfidf.index(docs, "doc_id", "text"), ixDir)
    val fresh = Tfidf.searchTopK(spark, docs, "doc_id", "text",
      RagQueries.question, 5)
    val served = Tfidf.searchSaved(spark, ixDir, RagQueries.question, 5)
    assert(served.schema == fresh.schema)
    assert(served.collect().toSeq == fresh.collect().toSeq)
  }

  test("pq ADC search from the saved compressed corpus is bit-identical to the fresh build") {
    val fresh = Pq.knn(emb)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val served = Pq.servedKnn(spark,
      IndexStore.prebuildSavedPq(spark, sf), queries,
      col("vec_id") >= Pq.QueryIds)
    assert(served.schema == fresh.schema)
    assert(served.collect().toSeq == fresh.collect().toSeq)
  }

  test("serve-time weights scan pushes the query's term set into parquet") {
    import graft.text.{RagQueries, Tfidf}
    val served = Tfidf.searchSaved(spark,
      IndexStore.prebuildSavedTfidf(spark, sf), RagQueries.question, 5)
    val plan = served.queryExecution.executedPlan.toString
    // the weights scan must carry In(term, …) as a PUSHED filter —
    // row-group pruning over the term-clustered file is the whole
    // point of the saved layout
    val pushed = "PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(plan)
    assert(pushed.isDefined, s"no pushed In(term…) filter in:\n$plan")
  }
}
