package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search (SURVEY §2 G1/G2): brute-force and LSH-bucketed
  * top-k cosine over an `array<float>` embedding column.
  *
  * Scale design: brute force broadcasts the (small) query set against
  * the corpus — a map-only scan, no shuffle, TakeOrdered per query.
  * The LSH path computes an 8-bit random-hyperplane signature per
  * vector (one projection) and joins query↔corpus on the bucket key,
  * so the candidate join is co-partitioned and prunes ~255/256 of the
  * corpus per query at 100 TB; exact re-ranking runs only in-bucket.
  * Hyperplanes come from an LCG keyed by (plane, dim) — deterministic,
  * no stored model, reproducible in any engine.
  */
object Knn {

  /** The LCG hyperplane value for (plane h, dim d) — the single
    * source of truth mirrored by the DuckDB oracle.
    */
  def planeValue(h: Int, d: Int): Double =
    ((1103515245L * (h * 64 + d) + 12345L) % 2147483647L).toDouble /
      2147483647.0 - 0.5

  /** Random-hyperplane signature bucket (8 planes → 8-bit bucket).
    *
    * Hybrid fast/exact sign test: the codegen'd float dot against the
    * materialized plane decides the sign when it is clearly away from
    * zero (float-plane error ≲1e-6, margin 1e-4); only near-zero
    * projections fall back to the decimal-quantized reduction the
    * oracle computes — so results stay bit-compatible while the
    * BigDecimal path almost never runs.
    */
  def lshBucket(embCol: String): org.apache.spark.sql.Column = {
    (0 until 8).map { h =>
      val plane = (0 until 64).map(d => planeValue(h, d).toFloat).toArray
      val fast = graft.plans.VectorExpressions.dotF32(col(embCol), typedLit(plane))
      val exact = expr(
        s"""cast(aggregate(sequence(0, 63), cast(0 as decimal(24,12)), (pacc, d) ->
           |  cast(pacc + cast(cast(element_at($embCol, d + 1) as double)
           |    * ((cast((1103515245L * ($h * 64 + d) + 12345L) % 2147483647L as double)
           |        / 2147483647.0) - 0.5)
           |    as decimal(24,12)) as decimal(24,12))) as double)""".stripMargin)
      when(abs(fast) > 1e-4, (fast > 0).cast("long") * (1L << h))
        .otherwise((exact > 0).cast("long") * (1L << h))
    }.reduce(_ + _)
  }

  private def withCosine(pairs: DataFrame): DataFrame =
    pairs.withColumn("cosine",
      Vectors.cosineFrom(Vectors.dot("eq", "ec"), col("nq"), col("nc")))

  private def topK(scored: DataFrame, k: Int): DataFrame =
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "cosine", "neighbor_id", Nil, k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")

  /** G1 — exact top-k: broadcast queries × corpus scan. */
  def bruteForce(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    // single-file parquet → one input partition; spread the per-pair
    // reductions before the (partition-preserving) broadcast join
    val e = graft.Par.spread(emb)
      .select(col("vec_id"), col("embedding"),
        Vectors.normSq("embedding").as("nsq"))
    val q = e.filter(queryPred).select(col("vec_id").as("query_id"),
      col("embedding").as("eq"), col("nsq").as("nq"))
    val c = e.filter(!queryPred).select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ec"), col("nsq").as("nc"))
    topK(withCosine(c.crossJoin(broadcast(q))), k)
  }

  /** G7 — k-NN self-join: EVERY vector retrieves its top-k in-bucket
    * neighbors (the all-pairs companion to [[lsh]]'s query-set
    * search — what dedup/graph-construction pipelines run corpus-wide).
    * The signature frame is eagerly checkpointed ONCE and both join
    * sides read it, so hyperplane projections aren't recomputed per
    * branch; the candidate join is a bucket equi-join co-partitioned
    * on both sides (nothing broadcasts — at 100 TB both sides are the
    * corpus), pruning ~255/256 of all pairs before the exact re-rank.
    */
  def lshJoin(emb: DataFrame, k: Int): DataFrame = {
    val e = graft.Par.spread(emb)
      .select(col("vec_id"), col("embedding"),
        Vectors.normSq("embedding").as("nsq"),
        lshBucket("embedding").as("bucket"))
      .localCheckpoint(true)
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").as("eq"), col("nsq").as("nq"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ec"), col("nsq").as("nc"), col("bucket"))
    topK(withCosine(
      q.join(c, "bucket").filter(col("query_id") =!= col("neighbor_id"))), k)
  }

  /** G2 — LSH-bucketed approximate top-k: candidates share the
    * signature bucket; exact cosine re-rank in bucket.
    */
  def lsh(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val e = graft.Par.spread(emb) // see bruteForce note
      .select(col("vec_id"), col("embedding"),
        Vectors.normSq("embedding").as("nsq"),
        lshBucket("embedding").as("bucket"))
    val q = e.filter(queryPred).select(col("vec_id").as("query_id"),
      col("embedding").as("eq"), col("nsq").as("nq"), col("bucket"))
    val c = e.filter(!queryPred).select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ec"), col("nsq").as("nc"), col("bucket"))
    topK(withCosine(c.join(broadcast(q), "bucket")), k)
  }
}
