package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** SURVEY §2 G — similarity search as driver queries. Query set =
  * vec_id < 5 against the rest of the corpus.
  */
object SimQueries extends QueryModule {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select("vec_id", "embedding")

  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    Knn.bruteForce(emb(spark, dir), col("vec_id") < 5, 3)

  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    Knn.lsh(emb(spark, dir), col("vec_id") < 5, 3)

  /** G7 — corpus-wide k-NN self-join over the LSH buckets. */
  def knnJoin(spark: SparkSession, dir: String): DataFrame =
    Knn.lshJoin(emb(spark, dir), 3)

  /** G3 — vector ops surface: norm / extrema / dimensionality. */
  def vectorOps(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"),
        Vectors.l2Norm("embedding").as("l2_norm"),
        expr("cast(array_max(embedding) as double)").as("max_c"),
        expr("cast(array_min(embedding) as double)").as("min_c"),
        size(col("embedding")).as("dims"))
      .orderBy("vec_id")

  /** G4 — symmetric int8 vector quantization: the 4×-memory scale
    * path for a 100 TB embedding store (serve the int8 copy, keep
    * floats cold). Per vector: scale = max|x| / 127, q_i = round
    * half-up of x_i/scale (so q ∈ [-127, 127] with no clamp needed),
    * and the quality surface a pipeline thresholds on — cosine of
    * the vector with its dequantized self, the max absolute
    * reconstruction error, and the saturated-lane count. One
    * map-only projection pass; the only aggregate-ish work is the
    * per-row array folds.
    *
    * FP parity: float→double casts, x/scale, q·scale and
    * floor(_ + 0.5) are all bit-exact in both engines; the cosine
    * reductions go through the same DECIMAL(24,12) term quantization
    * as every other vector reduction ([[Vectors]]).
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    embeddingQuantizeFrame(emb(spark, dir))

  /** The quantization body over any (vec_id, embedding) frame. */
  def embeddingQuantizeFrame(e: DataFrame): DataFrame =
    graft.Par.spread(e)
      .withColumn("amax",
        expr("array_max(transform(embedding, v -> abs(cast(v as double))))"))
      .withColumn("scale", col("amax") / 127.0d)
      .withColumn("q", expr(
        """IF(amax = 0d, transform(embedding, v -> 0),
          |   transform(embedding,
          |     v -> cast(floor(cast(v as double) / scale + 0.5d) as int)))"""
          .stripMargin))
      .withColumn("dq", expr("transform(q, qv -> qv * scale)"))
      .withColumn("n_sat", size(expr("filter(q, v -> abs(v) = 127)")))
      .withColumn("max_abs_err", expr(
        "array_max(zip_with(embedding, dq, (xv, dv) -> abs(cast(xv as double) - dv)))"))
      .withColumn("cos_q",
        when(col("amax") === 0d, lit(null).cast("double"))
          .otherwise(Vectors.cosineFrom(Vectors.dot("embedding", "dq"),
            Vectors.normSq("embedding"), Vectors.normSq("dq"))))
      .select("vec_id", "scale", "n_sat", "cos_q", "max_abs_err")
      .orderBy("vec_id")

  /** G5 — top-k over the INT8 copy (the serving path G4's
    * quantization exists for): ranking needs only the integer dot and
    * integer norms, because the per-vector scales cancel in the
    * cosine — cos(q_a·s_a, q_b·s_b) = qdot/√(qnsq_a·qnsq_b). All
    * arithmetic until the final division is exact int64, so the
    * ranking is bit-deterministic with no decimal machinery, and the
    * memory traffic is ¼ of the float path.
    */
  def knnQint8(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Par.spread(emb(spark, dir))
      .withColumn("amax",
        expr("array_max(transform(embedding, v -> abs(cast(v as double))))"))
      .withColumn("scale", col("amax") / 127.0d)
      .withColumn("q", expr(
        """IF(amax = 0d, transform(embedding, v -> 0),
          |   transform(embedding,
          |     v -> cast(floor(cast(v as double) / scale + 0.5d) as int)))"""
          .stripMargin))
      .withColumn("qnsq",
        expr("aggregate(q, 0L, (a, v) -> a + cast(v as bigint) * v)"))
      .select("vec_id", "q", "qnsq")
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("q").as("qa"),
        col("qnsq").as("na"))
    val cs = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("qnsq").as("nb"))
    val scored = cs.crossJoin(broadcast(qs))
      .withColumn("qdot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y), 0L, (a, v) -> a + v)"))
      .withColumn("cos_q8",
        col("qdot").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "cos_q8", "neighbor_id", Seq(), 3)
      .select("query_id", "rank", "neighbor_id", "cos_q8")
      .orderBy("query_id", "rank")
  }

  /** G6 — ANN quality eval: recall@k of the LSH index against the
    * brute-force ground truth, per query — the measurement loop every
    * approximate index ships with (you don't deploy an ANN index
    * without its recall curve). Both inputs are top-k outputs
    * (|queries|·k rows — tiny at any corpus size), so the eval join
    * costs nothing next to the searches themselves; queries the LSH
    * path misses entirely still score via the left join.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = knnBrute(spark, dir).select("query_id", "neighbor_id")
    val got = knnLsh(spark, dir).select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1))
    truth.join(got, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count("hit").as("n_hit"))
      .withColumn("recall_at_k", col("n_hit").cast("double") / lit(3.0d))
      .select("query_id", "n_hit", "recall_at_k")
      .orderBy("query_id")
  }

  /** G8 — per-class centroid + inertia over the labeled embedding
    * corpus: the cluster-quality profile (and the building block of
    * anything KMeans-shaped). One explode + ONE combinable aggregate
    * per (label, dim) for the centroids, one join-back + aggregate
    * for the inertia — both linear, shuffling O(labels × dims)
    * summary rows, never vectors against vectors. Centroid = exact
    * decimal component sum (one double) / count — a single double
    * division both engines compute identically, so no quantization
    * is needed; the inertia reduction quantizes terms at
    * DECIMAL(24,8) (scale 12 would let DuckDB's double-arithmetic
    * decimal cast flip roundings — see the comment in the body).
    */
  def embeddingCentroids(spark: SparkSession, dir: String): DataFrame =
    centroidsOf(Tables.embeddings(spark, dir))

  /** The centroid body over any (vec_id, embedding, label) frame. */
  def centroidsOf(e: DataFrame): DataFrame = {
    val comp = graft.Par.spread(e)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("v"))
    // Quantization scales are chosen so DuckDB's double-arithmetic
    // decimal cast cannot flip a rounding: at scale 12 the scaled
    // component (v·10¹² ≈ 10¹¹) carries ~3e-5 units of double error —
    // enough to cross a .5 boundary once in ~30k terms — while at
    // scale 6 the true products of small floats sit on a grid
    // (multiples of 5⁶/2^(j−6)) far coarser than the product error,
    // and exact .5 ties (odd multiples of 1/128) round half away
    // from zero in BOTH engines. DeterminismPropertySpec pins this.
    val cent = comp.groupBy("label", "i")
      .agg((expr("cast(sum(cast(v as decimal(18,6))) as double)")
        / count(lit(1))).as("c"),
        count(lit(1)).as("n_vecs"))
      // multi-branch boundary: the inertia join and the final select
      // both read cent — lazily each re-runs the full component
      // aggregate (and its explode scan); the frame is O(labels×dims)
      .localCheckpoint(true)
    val inertia = comp.join(cent.select("label", "i", "c"), Seq("label", "i"))
      .groupBy("label")
      .agg(expr(
        "cast(sum(cast((v - c) * (v - c) as decimal(24,8))) as double)")
        .as("inertia"))
    cent.join(broadcast(inertia), "label")
      .select(col("label"), col("n_vecs"), col("i").as("dim"),
        col("c"), col("inertia"))
      .orderBy("label", "dim")
  }

  /** G9 — k-NN classification: each query vector takes the majority
    * label of its top-3 exact neighbors (ties to the smaller label) —
    * the eval loop an embedding store runs to sanity-check that
    * neighborhoods respect labels. The vote runs on the top-k output
    * (queries × k rows), so it is free next to the search.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("label"))
    // broadcast the TOP-K SIDE (queries × k rows), never the corpus
    // labels frame — the label lookup streams the corpus scan against
    // the broadcast hash of the tiny search output
    val votes = broadcast(knnBrute(spark, dir))
      .join(labels, "neighbor_id")
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"))
    votes.groupBy("query_id")
      .agg(max_by(struct(col("label"), col("votes")),
        struct(col("votes"), -col("label"))).as("win"))
      .select(col("query_id"), col("win.label").as("pred_label"),
        col("win.votes").as("votes"))
      .orderBy("query_id")
  }

  override def queries: Map[String, Q] = Map(
    "embedding_centroids" -> (embeddingCentroids _),
    "knn_classify" -> (knnClassify _),
    "knn_brute" -> (knnBrute _),
    "knn_lsh" -> (knnLsh _),
    "vector_ops" -> (vectorOps _),
    "embedding_quantize" -> (embeddingQuantize _),
    "knn_qint8" -> (knnQint8 _),
    "knn_join" -> (knnJoin _),
    "ann_recall" -> (annRecall _))

  /** Shared relational CTEs: per-dimension components + norms. */
  private val compCte =
    """WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
      |         CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, 65)) u(i)),
      |norms AS (SELECT vec_id,
      |         CAST(CAST(sum(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS nsq
      |       FROM comp GROUP BY vec_id)
      |""".stripMargin

  /** The query-set search geometry: the fixed 8-plane floor. */
  private val staticPlanes =
    """planes AS (SELECT h, d,
      |         (CAST((1103515245 * (h * 64 + d) + 12345) % 2147483647 AS DOUBLE)
      |          / 2147483647.0) - 0.5 AS pv
      |       FROM UNNEST(range(0, 8)) u(h), UNNEST(range(0, 64)) v(d)),"""
      .stripMargin

  /** The corpus-sized self-join geometry — [[Knn.planesFor]] replayed
    * from count(*): smallest p in [8, 20] with n ≤ 64·2ᵖ (pure
    * integer logic, so both engines always pick the same plane count).
    */
  private val dynamicPlanes =
    """np AS (SELECT coalesce(min(p), 20) AS p
      |       FROM UNNEST(range(8, 21)) r(p),
      |            (SELECT count(*) AS n FROM embeddings) cnt
      |       WHERE cnt.n <= 64 * (CAST(1 AS BIGINT) << CAST(p AS INT))),
      |planes AS (SELECT h, d,
      |         (CAST((1103515245 * (h * 64 + d) + 12345) % 2147483647 AS DOUBLE)
      |          / 2147483647.0) - 0.5 AS pv
      |       FROM UNNEST(range(0, 20)) u(h), UNNEST(range(0, 64)) v(d), np
      |       WHERE h < np.p),""".stripMargin

  /** The plain in-bucket candidate CTE (query-set search shape). */
  private def plainCand(candCond: String) =
    s"""cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |       FROM buck q JOIN buck c ON q.bucket = c.bucket
      |         AND $candCond),""".stripMargin

  /** The occupancy-capped candidate CTE ([[Knn.BucketCap]] md5-salt
    * replayed relationally — see the lshJoin doc).
    */
  private def saltedCand(candCond: String) = {
    val cap = Knn.BucketCap
    s"""bsz AS (SELECT bucket, count(*) AS bn FROM buck GROUP BY bucket),
      |sbuck AS (SELECT b.vec_id, b.bucket,
      |         CAST('0x' || substr(md5('knn|' || CAST(b.vec_id AS VARCHAR)),
      |              1, 8) AS BIGINT)
      |           % ((bn + ${cap - 1}) // $cap) AS salt
      |       FROM buck b JOIN bsz USING (bucket)),
      |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |       FROM sbuck q JOIN sbuck c ON q.bucket = c.bucket
      |         AND q.salt = c.salt AND $candCond),""".stripMargin
  }

  /** Shared LSH chain (planes → signatures → buckets → candidates →
    * exact re-rank), parameterized by the candidate CTE — knn_lsh
    * restricts to the query set over plain buckets, knn_join takes
    * every ordered non-self pair within occupancy-capped cells — and
    * by the plane geometry (static 8-plane for the query-set search,
    * corpus-derived for the self-join).
    */
  private def lshChain(candCte: String,
      planesCte: String = staticPlanes) = s""",
      |$planesCte
      |sig AS (SELECT vec_id, h,
      |         CAST(CAST(sum(CAST(CAST(c.v * p.pv AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS s
      |       FROM comp c JOIN planes p ON c.i = p.d + 1 GROUP BY vec_id, h),
      |buck AS (SELECT vec_id,
      |         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(h AS INT))
      |             ELSE 0 END) AS bucket
      |       FROM sig GROUP BY vec_id),
      |$candCte
      |dots AS (SELECT cand.query_id, cand.neighbor_id,
      |         CAST(CAST(sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot
      |       FROM cand JOIN comp a ON a.vec_id = cand.query_id
      |                 JOIN comp b ON b.vec_id = cand.neighbor_id AND a.i = b.i
      |       GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |         dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) AS cosine
      |       FROM dots JOIN norms nq ON query_id = nq.vec_id
      |                 JOIN norms nc ON neighbor_id = nc.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |       FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** The brute-force ranked chain without its final projection —
    * shared by knn_brute and the knn_classify vote.
    */
  private val bruteRanked = compCte.stripSuffix("\n") + """,
      |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot
      |       FROM comp q JOIN comp c ON q.i = c.i
      |         AND q.vec_id < 5 AND c.vec_id >= 5
      |       GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id,
      |         dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) AS cosine
      |       FROM dots JOIN norms nq ON query_id = nq.vec_id
      |                 JOIN norms nc ON neighbor_id = nc.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |       FROM scored)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "knn_join" -> (compCte.stripSuffix("\n") +
      lshChain(saltedCand("q.vec_id <> c.vec_id"), dynamicPlanes)),
    "knn_brute" -> (bruteRanked + """
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin),
    "knn_classify" -> (bruteRanked + """,
      |v AS (SELECT r.query_id, e.label, count(*) AS votes
      |      FROM ranked r JOIN embeddings e ON r.neighbor_id = e.vec_id
      |      WHERE r.rank <= 3 GROUP BY 1, 2),
      |w AS (SELECT query_id, label, votes,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY votes DESC, label ASC) AS rn
      |      FROM v)
      |SELECT query_id, label AS pred_label, votes
      |FROM w WHERE rn = 1 ORDER BY query_id""".stripMargin),
    "embedding_centroids" ->
      """WITH comp AS (SELECT vec_id, label, CAST(i AS INT) AS i,
        |         CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS v
        |       FROM embeddings, UNNEST(range(1, 65)) u(i)),
        |cent AS (SELECT label, i,
        |         CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |           AS c,
        |         count(*) AS n_vecs
        |       FROM comp GROUP BY 1, 2),
        |inert AS (SELECT comp.label,
        |         CAST(sum(CAST((v - c) * (v - c) AS DECIMAL(24,8)))
        |              AS DOUBLE) AS inertia
        |       FROM comp JOIN cent
        |         ON comp.label = cent.label AND comp.i = cent.i
        |       GROUP BY 1)
        |SELECT cent.label, cent.n_vecs, cent.i AS dim, cent.c,
        |  inert.inertia
        |FROM cent JOIN inert ON cent.label = inert.label
        |ORDER BY cent.label, dim""".stripMargin,
    "knn_lsh" -> (compCte.stripSuffix("\n") +
      lshChain(plainCand("q.vec_id < 5 AND c.vec_id >= 5"))),
    "knn_qint8" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      v -> abs(CAST(CAST(v AS FLOAT) AS DOUBLE)))) AS amax
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, amax,
        |    amax / CAST(127 AS DOUBLE) AS scale FROM e),
        |q AS (SELECT vec_id,
        |    CASE WHEN amax = 0 THEN list_transform(embedding, v -> 0)
        |         ELSE list_transform(embedding,
        |           v -> CAST(floor(CAST(CAST(v AS FLOAT) AS DOUBLE) / scale + 0.5) AS INT))
        |    END AS qv
        |  FROM s),
        |comp AS (SELECT vec_id, CAST(i AS INT) AS i,
        |    CAST(qv[CAST(i AS INT)] AS BIGINT) AS v
        |  FROM q, UNNEST(range(1, 65)) u(i)),
        |qn AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS qnsq
        |  FROM comp GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(sum(a.v * b.v) AS BIGINT) AS qdot
        |  FROM comp a JOIN comp b ON a.i = b.i
        |    AND a.vec_id < 5 AND b.vec_id >= 5
        |  GROUP BY 1, 2),
        |scored AS (SELECT query_id, neighbor_id,
        |    CAST(qdot AS DOUBLE)
        |      / sqrt(CAST(qa.qnsq * qb.qnsq AS DOUBLE)) AS cos_q8
        |  FROM dots JOIN qn qa ON query_id = qa.vec_id
        |            JOIN qn qb ON neighbor_id = qb.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, cos_q8,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos_q8 DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos_q8
        |FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      v -> abs(CAST(CAST(v AS FLOAT) AS DOUBLE)))) AS amax
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, amax,
        |    amax / CAST(127 AS DOUBLE) AS scale FROM e),
        |q AS (SELECT vec_id, embedding, amax, scale,
        |    CASE WHEN amax = 0 THEN list_transform(embedding, v -> 0)
        |         ELSE list_transform(embedding,
        |           v -> CAST(floor(CAST(CAST(v AS FLOAT) AS DOUBLE) / scale + 0.5) AS INT))
        |    END AS qv
        |  FROM s),
        |comp AS (SELECT vec_id,
        |    CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS x,
        |    qv[CAST(i AS INT)] * scale AS d
        |  FROM q, UNNEST(range(1, 65)) u(i)),
        |sums AS (SELECT vec_id,
        |    CAST(CAST(sum(CAST(CAST(x * d AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot,
        |    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS nx,
        |    CAST(CAST(sum(CAST(CAST(d * d AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS nd,
        |    max(abs(x - d)) AS max_abs_err
        |  FROM comp GROUP BY vec_id)
        |SELECT q.vec_id, q.scale,
        |  CAST(len(list_filter(q.qv, v -> abs(v) = 127)) AS INTEGER) AS n_sat,
        |  CASE WHEN q.amax = 0 THEN NULL
        |       ELSE s2.dot / (sqrt(s2.nx) * sqrt(s2.nd)) END AS cos_q,
        |  s2.max_abs_err
        |FROM q JOIN sums s2 USING (vec_id)
        |ORDER BY q.vec_id""".stripMargin,
    "ann_recall" -> (compCte.stripSuffix("\n") + """,
      |bdots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         CAST(CAST(sum(CAST(CAST(q.v * c.v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot
      |       FROM comp q JOIN comp c ON q.i = c.i
      |         AND q.vec_id < 5 AND c.vec_id >= 5
      |       GROUP BY 1, 2),
      |branked AS (SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) DESC,
      |                    neighbor_id ASC) AS rank
      |       FROM bdots JOIN norms nq ON query_id = nq.vec_id
      |                  JOIN norms nc ON neighbor_id = nc.vec_id),
      |planes AS (SELECT h, d,
      |         (CAST((1103515245 * (h * 64 + d) + 12345) % 2147483647 AS DOUBLE)
      |          / 2147483647.0) - 0.5 AS pv
      |       FROM UNNEST(range(0, 8)) u(h), UNNEST(range(0, 64)) v(d)),
      |sig AS (SELECT vec_id, h,
      |         CAST(CAST(sum(CAST(CAST(c.v * p.pv AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS s
      |       FROM comp c JOIN planes p ON c.i = p.d + 1 GROUP BY vec_id, h),
      |buck AS (SELECT vec_id,
      |         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(h AS INT))
      |             ELSE 0 END) AS bucket
      |       FROM sig GROUP BY vec_id),
      |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |       FROM buck q JOIN buck c ON q.bucket = c.bucket
      |         AND q.vec_id < 5 AND c.vec_id >= 5),
      |ldots AS (SELECT cand.query_id, cand.neighbor_id,
      |         CAST(CAST(sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot
      |       FROM cand JOIN comp a ON a.vec_id = cand.query_id
      |                 JOIN comp b ON b.vec_id = cand.neighbor_id AND a.i = b.i
      |       GROUP BY 1, 2),
      |lranked AS (SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY dot / (sqrt(nq.nsq) * sqrt(nc.nsq)) DESC,
      |                    neighbor_id ASC) AS rank
      |       FROM ldots JOIN norms nq ON query_id = nq.vec_id
      |                  JOIN norms nc ON neighbor_id = nc.vec_id)
      |SELECT b.query_id, count(l.neighbor_id) AS n_hit,
      |  CAST(count(l.neighbor_id) AS DOUBLE) / 3.0 AS recall_at_k
      |FROM (SELECT query_id, neighbor_id FROM branked WHERE rank <= 3) b
      |LEFT JOIN (SELECT query_id, neighbor_id FROM lranked WHERE rank <= 3) l
      |  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      |GROUP BY b.query_id
      |ORDER BY b.query_id""".stripMargin),
    "vector_ops" -> (compCte.stripSuffix("\n") + """
      |SELECT e.vec_id, sqrt(n.nsq) AS l2_norm,
      |  CAST(list_aggregate(list_transform(embedding,
      |    v -> CAST(v AS FLOAT)), 'max') AS DOUBLE) AS max_c,
      |  CAST(list_aggregate(list_transform(embedding,
      |    v -> CAST(v AS FLOAT)), 'min') AS DOUBLE) AS min_c,
      |  CAST(len(embedding) AS INTEGER) AS dims
      |FROM embeddings e JOIN norms n ON e.vec_id = n.vec_id
      |ORDER BY e.vec_id""".stripMargin))
}
