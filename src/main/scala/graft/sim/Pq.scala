package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** Product quantization (SURVEY §2 G10/G11): the FAISS-style
  * memory-compression layer a billion-vector serving index stands on
  * — each 64-dim float vector (256 bytes) is stored as [[NumSub]]
  * one-byte codes (argmin codeword per 16-dim subspace), and
  * asymmetric-distance (ADC) search scores a candidate with M lookup
  * additions instead of d float multiplies.
  *
  * Scale shape: encoding is one broadcast join (the codebook is tiny
  * by construction) + a map-side-combinable argmin — a linear scan at
  * any corpus size; search precomputes the per-query lookup table
  * (queries × M × K rows — broadcastable at any corpus size) and the
  * candidate scoring is a broadcast equi-join on (subspace, code) +
  * one combinable sum: no per-candidate vector math at all, which is
  * the entire point of PQ at 10⁹ vectors.
  *
  * Gate shape (the given-centroids discipline, Ivf.scala): the
  * codebook is the subvectors of a FIXED id set (vec_id <
  * [[CodebookIds]]) rather than a trained k-means product codebook,
  * so encode, LUT and ADC ranking are plain relational algebra and
  * both queries sit fully inside the DuckDB hash gate. Distances use
  * the [[Vectors]] DECIMAL(24,12) term-quantization discipline so the
  * reductions are order-free and engine-exact.
  */
object Pq extends QueryModule {

  val Dim = 64
  val NumSub = 4
  val SubDim: Int = Dim / NumSub
  /** Codeword source rows: subvectors of vec_id < this. */
  val CodebookIds = 16
  /** Query set: vec_id < this (the G-block convention). */
  val QueryIds = 5
  val K = 3

  /** Quantized-exact squared L2 over subspace m of two float-array
    * columns — the subspace form of [[Vectors.normSq]]'s fold.
    */
  private def subDistSq(x: String, y: String, m: Int): Column =
    expr(s"""cast(aggregate(
      |  zip_with(slice($x, ${m * SubDim + 1}, $SubDim),
      |           slice($y, ${m * SubDim + 1}, $SubDim),
      |    (xv, yv) -> cast((cast(xv as double) - cast(yv as double))
      |      * (cast(xv as double) - cast(yv as double)) as decimal(24,12))),
      |  cast(0 as decimal(24,12)),
      |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)"""
      .stripMargin)

  private def codebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < CodebookIds)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  // one encode build serves both queries (the Ivf givenListed
  // discipline); the codes frame is narrow (vec_id + M ints) and
  // checkpointed so clearCache between queries doesn't rebuild
  private val codesCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Per-vector PQ codes: argmin codeword per subspace, ties to the
    * smaller codeword id. One broadcast join + one combinable argmin.
    */
  def codes(emb: DataFrame): DataFrame = {
    val key = (emb.sparkSession, graft.Memo.planKey(emb))
    codesCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    codesCache.synchronized {
      codesCache.getOrElseUpdate(key, {
        val e = graft.Par.spread(emb.select("vec_id", "embedding"))
        val long = e.crossJoin(broadcast(codebook(emb)))
          .select(col("vec_id") +: col("cid") +:
            (0 until NumSub).map(m =>
              subDistSq("embedding", "ce", m).as(s"d$m")): _*)
          .selectExpr("vec_id", "cid",
            s"stack($NumSub, ${(0 until NumSub)
              .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
        long.groupBy("vec_id", "m")
          .agg(min_by(col("cid"), struct(col("dsq"), col("cid")))
            .as("code"))
          .localCheckpoint(true)
      })
    }
  }

  /** Force the encode build (Bench bills it separately). */
  def prebuild(spark: SparkSession, dir: String): Unit = {
    codes(Tables.embeddings(spark, dir).select("vec_id", "embedding")); ()
  }

  /** G10 — `pq_encode`: the stored form, one row per vector with its
    * M codes (the 256-byte → M-byte compression a vector store
    * actually persists).
    */
  def encode(emb: DataFrame): DataFrame = {
    val codeCols = (0 until NumSub).map(m =>
      max(when(col("m") === m, col("code"))).as(s"code_$m"))
    codes(emb).groupBy("vec_id")
      .agg(codeCols.head, codeCols.tail: _*)
      .orderBy("vec_id")
  }

  /** G11 — `knn_pq`: ADC top-k. The per-query lookup table (queries ×
    * M × K codewords) is computed exact once and broadcast; each
    * candidate is scored by M equi-join lookups + one quantized sum —
    * zero vector arithmetic per candidate.
    */
  def knn(emb: DataFrame): DataFrame = {
    val e = emb.select("vec_id", "embedding")
    val lut = e.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
      .crossJoin(broadcast(codebook(emb)))
      .select(col("query_id") +: col("cid") +:
        (0 until NumSub).map(m => subDistSq("eq", "ce", m).as(s"d$m")): _*)
      .selectExpr("query_id", "cid",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
    val cand = codes(emb).filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("m"), col("code"))
    val adist = cand
      .join(broadcast(lut),
        cand("m") === lut("m") && cand("code") === lut("cid"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dsq").cast("decimal(24,12)")).cast("double")
        .as("adist"))
      .withColumn("sim", -col("adist"))
    graft.plans.AggExpressions
      .topKPerKey(adist, "query_id", "sim", "neighbor_id",
        Seq("adist"), K)
      .select("query_id", "rank", "neighbor_id", "adist")
      .orderBy("query_id", "rank")
  }

  def encodeQ(spark: SparkSession, dir: String): DataFrame =
    encode(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def knnQ(spark: SparkSession, dir: String): DataFrame =
    knn(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  override def queries: Map[String, Q] = Map(
    "pq_encode" -> (encodeQ _),
    "knn_pq" -> (knnQ _))

  /** Shared encode CTE chain: per-dimension rows with the subspace
    * index, quantized subspace distances vector × codeword, argmin
    * codes — the relational mirror of [[codes]].
    */
  private val encodeCtes =
    s"""WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
      |         CAST((CAST(i AS INT) - 1) // $SubDim AS INT) AS m,
      |         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) u(i)),
      |dists AS (SELECT a.vec_id, a.m, b.vec_id AS cid,
      |         CAST(sum(CAST((a.v - b.v) * (a.v - b.v)
      |              AS DECIMAL(24,12))) AS DOUBLE) AS dsq
      |       FROM comp a JOIN comp b
      |         ON a.i = b.i AND b.vec_id < $CodebookIds
      |       GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, cid AS code
      |       FROM (SELECT vec_id, m, cid,
      |               row_number() OVER (PARTITION BY vec_id, m
      |                 ORDER BY dsq ASC, cid ASC) AS rn
      |             FROM dists)
      |       WHERE rn = 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "pq_encode" -> (encodeCtes + s"""
      |SELECT vec_id,
      |${(0 until NumSub).map(m =>
          s"  max(CASE WHEN m = $m THEN code END) AS code_$m")
          .mkString(",\n")}
      |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    "knn_pq" -> (encodeCtes + s""",
      |luts AS (SELECT vec_id AS query_id, m, cid, dsq FROM dists
      |       WHERE vec_id < $QueryIds),
      |cand AS (SELECT vec_id AS neighbor_id, m, code FROM codes
      |       WHERE vec_id >= $QueryIds),
      |adist AS (SELECT l.query_id, c.neighbor_id,
      |         CAST(sum(CAST(l.dsq AS DECIMAL(24,12))) AS DOUBLE) AS adist
      |       FROM cand c JOIN luts l ON l.m = c.m AND l.cid = c.code
      |       GROUP BY 1, 2),
      |ranked AS (SELECT query_id, neighbor_id, adist,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY adist ASC, neighbor_id ASC) AS rank
      |       FROM adist)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adist
      |FROM ranked WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin))
}
