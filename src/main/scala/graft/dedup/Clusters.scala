package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Near-duplicate clustering (SURVEY §2 F6): the dedup deliverable a
  * training pipeline actually consumes — connected components over
  * the verified near-dup pair graph, keep the min-id representative
  * per component, drop the rest.
  *
  * Components via iterative min-label propagation: each round joins
  * labels across edges (both directions) and takes the minimum; the
  * driver only iterates over *plans* (rounds ≈ graph diameter,
  * capped), all data movement is co-partitioned joins — the standard
  * Pregel-style shape without needing GraphX for a pair graph whose
  * components are tiny.
  */
object Clusters extends QueryModule {

  val MaxIterations = 15

  /** (doc_id, cluster) — cluster = min doc_id reachable via pairs. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < MaxIterations) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("cluster").as("n_cluster"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
            .as("cluster"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "doc_id")
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** F6 — cluster the MinHash near-dup pairs; one row per clustered
    * doc with its representative and a keep/drop verdict.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleRows(Tables.documents(spark, dir), "doc_id", "text")
      .persist()
    val pairs = Dedup.jaccardVerify(
      Dedup.bucketPairs(Dedup.minhashBuckets(sh)), sh, 0.5)
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster"))
      .select(col("cluster").as("cluster_rep"), col("doc_id"), col("keep"))
      .orderBy("cluster_rep", "doc_id")
  }

  override def queries: Map[String, Q] = Map(
    "dedup_clusters" -> (dedupClusters _))

  /** Iterative fixpoint — rows-only driver check (spec covers the
    * graph semantics; a recursive-CTE oracle would not be the same
    * algorithm class).
    */
  override def oracles: Map[String, String] = Map.empty
}
