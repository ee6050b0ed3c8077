package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search (SURVEY §2 G1/G2/G7): brute-force and
  * LSH-bucketed top-k cosine over an `array<float>` embedding column.
  *
  * Scale design: brute force broadcasts the (small) query set against
  * the corpus — a map-only scan, no shuffle, TakeOrdered per query.
  * The LSH path computes a random-hyperplane signature per vector
  * (one projection) and joins query↔corpus on the bucket key, so the
  * candidate join is co-partitioned; exact re-ranking runs only
  * in-bucket. For the corpus-wide self-join the plane count DERIVES
  * from the corpus size (see [[planesFor]]) so bucket occupancy — and
  * with it the in-bucket pair work per vector — stays pinned as the
  * corpus grows instead of going quadratic under a fixed geometry.
  * Hyperplanes come from an LCG keyed by (plane, dim) — deterministic,
  * no stored model, reproducible in any engine.
  *
  * Scoring is hybrid fast/exact everywhere (the [[lshBucket]] sign
  * discipline applied to ranking): a codegen'd float-dot pass finds
  * each query's k-th fast cosine, and the DECIMAL(24,12) exact dot —
  * a 64-step BigDecimal fold per pair — re-scores only the pairs
  * within [[ScoreEps]] of that threshold, bit-identically to scoring
  * every pair (see [[hybridTopK]]).
  */
object Knn {

  /** The LCG hyperplane value for (plane h, dim d) — the single
    * source of truth mirrored by the DuckDB oracle.
    */
  def planeValue(h: Int, d: Int): Double =
    ((1103515245L * (h * 64 + d) + 12345L) % 2147483647L).toDouble /
      2147483647.0 - 0.5

  /** Target mean bucket occupancy for the corpus-wide self-join: the
    * in-bucket re-rank then touches ~[[TargetBucket]] candidates per
    * vector at ANY corpus size.
    */
  val TargetBucket = 64L

  /** Plane-count bounds: 8 planes floor (the query-set search
    * geometry), 20 cap (2²⁰ buckets ≈ 67M-vector corpora at target
    * occupancy — beyond that occupancy grows linearly again, which a
    * caller can re-cap by raising the cap).
    */
  val MinPlanes = 8
  val MaxPlanes = 20

  /** Hyperplane count for an n-vector corpus: the smallest p in
    * [[[MinPlanes]], [[MaxPlanes]]] with n ≤ TargetBucket·2ᵖ — pure
    * integer logic, replayed verbatim by the DuckDB oracle from
    * count(*), so Spark and the oracle always pick the same geometry.
    */
  def planesFor(n: Long): Int =
    (MinPlanes to MaxPlanes)
      .find(p => n <= (TargetBucket << p))
      .getOrElse(MaxPlanes)

  /** Random-hyperplane signature bucket (`planes` planes → a
    * `planes`-bit bucket).
    *
    * Hybrid fast/exact sign test: the codegen'd float dot against the
    * materialized plane decides the sign when it is clearly away from
    * zero (float-plane error ≲1e-6, margin 1e-4); only near-zero
    * projections fall back to the decimal-quantized reduction the
    * oracle computes — so results stay bit-compatible while the
    * BigDecimal path almost never runs.
    */
  def lshBucket(embCol: String, planes: Int = MinPlanes)
      : org.apache.spark.sql.Column = {
    (0 until planes).map { h =>
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

  /** Exact-scoring threshold slack. The float-dot cosine is within
    * ~1e-9 of the decimal-quantized one (double fold vs 1e-12 term
    * quantization over 64 terms), so any pair in the true exact top-k
    * has fast cosine ≥ (k-th fast cosine) − 2δ ≫ this margin — the
    * candidate set provably contains the exact top-k.
    */
  val ScoreEps = 1e-6

  private def topK(scored: DataFrame, k: Int): DataFrame =
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "cosine", "neighbor_id", Nil, k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")

  /** Hybrid top-k: rank by the cheap codegen'd float cosine first,
    * exact-score only near the k-th boundary — bit-identical output
    * to exact-scoring every pair (see [[ScoreEps]]).
    *
    * Shape: the pair join runs twice but only projects the NARROW
    * (query_id, neighbor_id, cos_f) rows into any shuffle; the k-th
    * threshold comes from the bounded-heap CollectTopK aggregate
    * (k rows per task per query), and the surviving candidates
    * (~k + boundary ties per query) re-join `q`/`c` to fetch
    * embeddings for the exact re-rank — so full-width vectors never
    * shuffle pair-wise, only candidate-wise.
    */
  private def hybridTopK(q: DataFrame, c: DataFrame, k: Int,
      pair: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    // NOTE deliberately NOT materialized: the narrow pair frame feeds
    // both the k-th-threshold aggregate and the candidate filter, so
    // the pair join runs twice — but a localCheckpoint of it was
    // measured NEUTRAL at sf0.1 (1.65→1.75 s warm on knn_join: the
    // |pairs|-row materialization costs what the dedup saves), and at
    // scale the checkpoint is byte-HEAVIER (n·cap narrow rows ≈
    // 6 KB/vector stored vs ~1 KB/vector of duplicated input
    // shuffle), so the recompute is the right trade both ways.
    val narrow = pair(q, c)
      .withColumn("cos_f", Vectors.cosineFrom(
        Vectors.dotFast("eq", "ec"), col("nq"), col("nc")))
      .select("query_id", "neighbor_id", "cos_f")
    // k-th largest fast cosine per query (min over its top-k heap);
    // a query with < k pairs keeps everything via its overall min
    val kth = graft.plans.AggExpressions
      .topKPerKey(narrow, "query_id", "cos_f", "neighbor_id", Nil, k)
      .groupBy("query_id").agg(min("cos_f").as("kth_f"))
    val cand = narrow.join(kth, "query_id")
      .filter(col("cos_f") >= col("kth_f") - ScoreEps)
      .select("query_id", "neighbor_id")
    topK(cand.join(q, "query_id").join(c, "neighbor_id")
      .withColumn("cosine", Vectors.cosineFrom(
        Vectors.dot("eq", "ec"), col("nq"), col("nc"))), k)
  }

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
    hybridTopK(q, c, k, (qf, cf) => cf.crossJoin(broadcast(qf)))
  }

  /** Per-bucket occupancy cap for the corpus-wide self-join: a bucket
    * past this size md5-salts into ceil(size/cap) cells, and the
    * candidate join runs within a (bucket, salt) cell. Adding planes
    * cannot split a bucket whose members agree with a corpus-wide
    * bias direction on every hyperplane (measured: top-bucket size
    * grows ∝ n under ANY plane count), so without the cap those
    * buckets alone keep the join quadratic; with it, a size-b bucket
    * contributes ≤ b·cap pairs and TOTAL pair work is ≤ n·cap —
    * strictly linear under any skew, the same per-key cap discipline
    * the n-gram join applies to stop-phrase grams. The price: inside
    * an over-hot bucket each vector ranks a uniform 1/ns sample of
    * its (near-equivalent) co-members rather than all of them.
    */
  val BucketCap: Int = 4 * TargetBucket.toInt

  /** Occupancy-cap salt for a signature frame carrying (vec_id,
    * bucket): bucket sizes come from ONE map-side-combinable
    * aggregate (≤ 2^planes rows at any corpus size) broadcast-joined
    * back — NEVER a whole-bucket Window, which would funnel the
    * corpus-bias bucket the salt exists to defuse through a single
    * window task just to learn its size (~1% of a 100 TB corpus
    * through one task). `bn` values are identical to the windowed
    * count, so the DuckDB oracle's bucket-size CTE replays it
    * unchanged. The caller checkpoints the (expensive) signature
    * input; the size frame is checkpointed here so each downstream
    * branch pays only a map-side broadcast join, not a re-aggregate.
    */
  def saltByOccupancy(sig: DataFrame): DataFrame = {
    val sizes = sig.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .localCheckpoint(true)
    sig.join(broadcast(sizes), "bucket")
      .withColumn("ns", expr(s"(bn + ${BucketCap - 1}) div $BucketCap"))
      .withColumn("salt", expr(
        """pmod(cast(conv(substring(md5(concat('knn|',
          |  cast(vec_id as string))), 1, 8), 16, 10) as bigint), ns)"""
          .stripMargin))
  }

  /** G7 — k-NN self-join: EVERY vector retrieves its top-k in-bucket
    * neighbors (the all-pairs companion to [[lsh]]'s query-set
    * search — what dedup/graph-construction pipelines run corpus-wide).
    * The plane count derives from the corpus size ([[planesFor]] from
    * one cheap count) and over-hot buckets are salted under
    * [[BucketCap]], so in-bucket pair work grows linearly with the
    * corpus instead of ~n² under a fixed 256-bucket geometry. The
    * signature frame is eagerly checkpointed ONCE and both join sides
    * read it, so hyperplane projections aren't recomputed per branch;
    * the candidate join is a (bucket, salt) equi-join co-partitioned
    * on both sides (nothing broadcasts — at 100 TB both sides are the
    * corpus).
    */
  def lshJoin(emb: DataFrame, k: Int): DataFrame = {
    val planes = planesFor(emb.count())
    val sig = graft.Par.spread(emb)
      .select(col("vec_id"), col("embedding"),
        Vectors.normSq("embedding").as("nsq"),
        lshBucket("embedding", planes).as("bucket"))
      .localCheckpoint(true)
    // salt cell from the combinable size aggregate (saltByOccupancy);
    // everything md5/count-derived, so the oracle replays it exactly
    val e = saltByOccupancy(sig)
      .select("vec_id", "embedding", "nsq", "bucket", "salt")
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").as("eq"), col("nsq").as("nq"),
      col("bucket"), col("salt"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ec"), col("nsq").as("nc"),
      col("bucket"), col("salt"))
    hybridTopK(q, c, k, (qf, cf) =>
      qf.join(cf, Seq("bucket", "salt"))
        .filter(col("query_id") =!= col("neighbor_id")))
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
    hybridTopK(q, c, k, (qf, cf) => cf.join(broadcast(qf), "bucket"))
  }
}
