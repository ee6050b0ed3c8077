package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Graph analytics over the verified near-dup pair graph (SURVEY §2
  * F11/F12): the corpus-curation views a pipeline derives AFTER dedup
  * has built the pair graph — which documents are template hubs
  * (degree), and which are the most "central" boilerplate carriers
  * (PageRank). Both reuse the memoized [[NearDup]] index, so next to
  * the dedup family they cost one aggregate / a few tiny joins.
  *
  * Scale notes: degree is ONE map-side-combinable aggregate over the
  * pair set (pairs ≪ corpus by construction). PageRank iterates
  * joins+aggregates over the SAME pair graph — per round one
  * co-partitioned join on src and one combinable sum on dst, eagerly
  * checkpointed (the CC / GBT-horizon discipline: without the step
  * boundary each round's plan inlines the previous round's twice).
  * All rank arithmetic is integer-scaled (1e12 units) with floor
  * division on non-negative operands, so ten rounds of damping
  * produce bit-identical integers in any engine and any partitioning
  * — the same determinism trick as ts_decompose's micro-units.
  */
object Graph extends QueryModule {

  val Scale = 1000000000000L // 1e12 rank units
  val Iters = 10

  /** Both edge directions of the undirected pair graph. */
  private def edgesOf(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** F11 — per-document degree + strongest neighbor similarity in the
    * near-dup graph: the template-hub profile. One aggregate.
    */
  def graphDegree(spark: SparkSession, dir: String): DataFrame =
    degreeOf(NearDup.index(Tables.documents(spark, dir)).pairs)

  /** The degree body over any (doc_a, doc_b, jaccard) pair frame. */
  def degreeOf(pairs: DataFrame): DataFrame = {
    pairs.select(explode(array(
        struct(col("doc_a").as("v"), col("jaccard").as("j")),
        struct(col("doc_b").as("v"), col("jaccard").as("j")))).as("e"))
      .select(col("e.v").as("doc_id"), col("e.j").as("j"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("degree"), max("j").as("max_jaccard"))
      .orderBy("doc_id")
  }

  /** F12 — damped PageRank (d=0.85, 10 rounds) on the pair graph:
    * pr' = 0.15/N + 0.85 · Σ pr(src)/deg(src), computed as
    * pr' = (3·S) div (20·N) + (17·Σ(pr div deg)) div 20 in exact
    * integer rank units.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankOf(NearDup.index(Tables.documents(spark, dir)).pairs)

  /** The PageRank body over any (doc_a, doc_b) pair frame. */
  def pagerankOf(pairs: DataFrame): DataFrame = {
    val edges = edgesOf(pairs).localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nn = broadcast(deg.agg(count(lit(1)).as("n")))
    // deg is LOOP-INVARIANT: annotate each edge with its source's
    // out-degree ONCE instead of re-joining deg inside all Iters
    // rounds (10 joins saved per search; per-round work drops to one
    // co-partitioned join + one combinable sum)
    val edgesDeg = edges.join(deg, "src")
      .select("src", "dst", "deg").localCheckpoint(true)
    var pr = deg.crossJoin(nn)
      .select(col("src").as("doc_id"),
        expr(s"cast($Scale as bigint) div n").as("pr"))
    // Each round is consumed exactly ONCE by the next (single-branch
    // lineage), so unlike the CC loop no per-round action is needed —
    // only periodic checkpoints so neither lineage depth nor
    // optimizer time grows with the round count.
    for (i <- 1 to Iters) {
      pr = edgesDeg
        .join(pr.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst").as("doc_id"))
        .agg(sum("c").as("s"))
        .crossJoin(nn)
        .select(col("doc_id"),
          expr(s"(3 * cast($Scale as bigint)) div (20 * n)" +
            " + (17 * s) div 20").as("pr"))
      if (i % 4 == 0) pr = pr.localCheckpoint(true)
    }
    pr.join(deg.select(col("src").as("doc_id"), col("deg").as("degree")),
        "doc_id")
      .select(col("doc_id"), col("degree"),
        (col("pr").cast("double") / 1e12).as("pagerank"))
      .orderBy("doc_id")
  }

  override def queries: Map[String, Q] = Map(
    "graph_degree" -> (graphDegree _),
    "pagerank" -> (pagerank _))

  /** Oracle: the shared minhash pair CTEs + edges; PageRank unrolls
    * its fixed rounds as chained CTEs (pr0..pr10) over the same
    * integer recurrence — no recursion needed for a fixed iteration
    * count, and DuckDB's hugeint floor division agrees with Spark's
    * bigint `div` on the always-non-negative operands.
    */
  override def oracles: Map[String, String] = {
    val base = DedupQueries.minhashPairsCtes() + """,
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM deg)""".stripMargin
    val prChain = (1 to Iters).map { i =>
      s"""pr$i AS (SELECT e.dst AS doc_id,
         |    (3 * $Scale) // (20 * nn.n)
         |      + (17 * sum(p.pr // d.deg)) // 20 AS pr
         |  FROM edges e
         |  JOIN pr${i - 1} p ON e.src = p.doc_id
         |  JOIN deg d ON e.src = d.src, nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }.mkString(",\n")
    Map(
      "graph_degree" -> (base + """
        |SELECT doc_id, count(*) AS degree, max(j) AS max_jaccard
        |FROM (SELECT doc_a AS doc_id, jaccard AS j FROM pairs
        |      UNION ALL SELECT doc_b, jaccard FROM pairs)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      "pagerank" -> (base + s""",
        |pr0 AS (SELECT src AS doc_id, $Scale // nn.n AS pr FROM deg, nn),
        |$prChain
        |SELECT p.doc_id, d.deg AS degree,
        |  CAST(p.pr AS DOUBLE) / 1e12 AS pagerank
        |FROM pr$Iters p JOIN deg d ON p.doc_id = d.src
        |ORDER BY p.doc_id""".stripMargin))
  }
}
