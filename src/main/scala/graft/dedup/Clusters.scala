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
  * Components via iterative min-label propagation with pointer
  * jumping: each round a node takes the minimum of its own label, its
  * neighbors' labels, and its label's label (the jump — the standard
  * hash-to-min acceleration), so rounds scale with log(diameter)
  * rather than diameter. The driver only iterates over *plans*; all
  * data movement is co-partitioned joins — the Pregel-style shape
  * without needing GraphX for a pair graph whose components are tiny.
  *
  * Iteration hygiene (the parts that matter at scale): ONE action per
  * round — the changed-row count doubles as the materialization of
  * the round's cache; the superseded cache is unpersisted
  * immediately; every few rounds the frame is localCheckpoint'ed so
  * neither lineage nor analysis time grows with the iteration count.
  */
object Clusters extends QueryModule {

  val MaxIterations = 15
  private val CheckpointEvery = 4

  /** (doc_id, cluster) — cluster = min doc_id reachable via pairs. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    // Both edge directions from ONE pass over the pair pipeline: a
    // union of two projections scans the (expensive, un-cached)
    // upstream candidate+verify plan twice on first materialization —
    // the cache is still being populated during that same action, so
    // the second branch misses it. explode never re-reads upstream.
    // Eager checkpoint, not lazy persist: every round's job has TWO
    // branches reading edges (neighbor join + initial labels), and a
    // lazily-persisted frame is computed per-branch on the first
    // action — the cache is still filling while the second branch
    // scans, so an expensive upstream (candidate+verify) pipeline runs
    // multiple times concurrently. Materializing once up front costs
    // one action and truncates the lineage every later round replays.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    var cached = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .persist()
    var labels = cached
    var converged = false
    var iter = 0
    while (!converged && iter < MaxIterations) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("cluster").as("nmin"))
      // pointer jump: the label of my label (labels only shrink, so
      // cluster values are always doc_ids present in `labels`)
      val jump = labels.select(col("doc_id").as("old"), col("cluster").as("jmin"))
      val stepped = labels
        .withColumnRenamed("cluster", "old")
        .join(neighborMin, Seq("doc_id"), "left")
        .join(jump, Seq("old"), "left")
        .select(col("doc_id"), col("old"),
          least(col("old"), coalesce(col("nmin"), col("old")),
            coalesce(col("jmin"), col("old"))).as("cluster"))
      // periodic lineage truncation; lazy checkpoint piggybacks on the
      // convergence count below, keeping this ONE job per round
      val next =
        if ((iter + 1) % CheckpointEvery == 0) stepped.localCheckpoint(false)
        else stepped.persist()
      val changed = next.filter(col("cluster") =!= col("old")).count()
      cached.unpersist()
      cached = next
      labels = next.select("doc_id", "cluster")
      converged = changed == 0
      iter += 1
    }
    if (converged)
      System.err.println(s"[graft] connectedComponents converged in $iter rounds")
    else
      System.err.println(
        s"WARN connectedComponents: not converged after $MaxIterations " +
          "rounds; labels may span unmerged components")
    labels
  }

  /** F6 — cluster the MinHash near-dup pairs; one row per clustered
    * doc with its representative and a keep/drop verdict. Pairs and
    * labels come from the memoized [[NearDup]] index shared with
    * dedup_minhash and corpus_clean.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    NearDup.index(Tables.documents(spark, dir)).labels
      .withColumn("keep", col("doc_id") === col("cluster"))
      .select(col("cluster").as("cluster_rep"), col("doc_id"), col("keep"))
      .orderBy("cluster_rep", "doc_id")

  override def queries: Map[String, Q] = Map(
    "dedup_clusters" -> (dedupClusters _))

  /** The fixpoint is SQL-expressible after all: a recursive CTE over
    * the verified pair graph reaches the same component minima, so F6
    * is hash-gated like the rest of the family (the CTE enumerates
    * reachability per node — fine at oracle scale, while the Spark
    * side stays the log-diameter propagation loop).
    */
  override def oracles: Map[String, String] = Map(
    "dedup_clusters" -> (DedupQueries.minhashPairsCtes(recursive = true) + """,
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.doc_id),
      |cc AS (SELECT doc_id, min(r) AS cluster_rep FROM reach GROUP BY doc_id)
      |SELECT cluster_rep, doc_id, doc_id = cluster_rep AS keep
      |FROM cc ORDER BY cluster_rep, doc_id""".stripMargin))
}
