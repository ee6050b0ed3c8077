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

  /** [[subDistSq]] where x is already a double array (a residual) and
    * y is a float-array codeword — the residual-encoding distance.
    */
  private[sim] def subDistSqD(x: String, y: String, m: Int): Column =
    expr(s"""cast(aggregate(
      |  zip_with(slice($x, ${m * SubDim + 1}, $SubDim),
      |           slice($y, ${m * SubDim + 1}, $SubDim),
      |    (xv, yv) -> cast((xv - cast(yv as double))
      |      * (xv - cast(yv as double)) as decimal(24,12))),
      |  cast(0 as decimal(24,12)),
      |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)"""
      .stripMargin)

  /** Quantized-exact squared L2 over the FULL vector (both float
    * arrays) — the ground-truth metric [[recall]] evaluates against.
    */
  private def fullDistSq(x: String, y: String): Column =
    expr(s"""cast(aggregate(
      |  zip_with($x, $y,
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

  /** The codebook packed into ONE row (`cb` = cid-sorted array of
    * (cid, ce) structs) — the broadcastable static side of the
    * streaming encode face ([[graft.streaming.Streaming.pqEncodeStream]]):
    * a stream can't run the batch groupBy argmin, but it can fold a
    * 16-struct array column in a stateless projection.
    */
  def packedCodebook(emb: DataFrame): DataFrame =
    codebook(emb)
      .agg(sort_array(collect_list(struct(col("cid"), col("ce"))))
        .as("cb"))
      .withColumn("j", lit(1))

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

  /** Persist the PQ artifact (SURVEY §2 G16): the tiny codebook plus
    * the PACKED codes table ([[encode]]'s one-row-per-vector layout —
    * the M-byte form a vector store actually keeps on disk). Raw
    * embeddings are deliberately NOT saved: serving from this
    * artifact proves the compressed form is sufficient.
    */
  def save(emb: DataFrame, dir: String): Unit = {
    codebook(emb).write.mode("overwrite").parquet(s"$dir/codebook")
    encode(emb).write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** ADC top-k served from a SAVED artifact: queries arrive with raw
    * vectors (the serve-time contract — only the corpus is stored
    * compressed), the per-query LUT is computed against the loaded
    * codebook exactly as the fresh path does, and candidates unpack
    * from the packed codes with one `stack` projection. Bit-identical
    * to [[knn]] on the same corpus.
    */
  def servedKnn(spark: SparkSession, dir: String, queries: DataFrame,
      candPred: Column): DataFrame = {
    val cb = spark.read.parquet(s"$dir/codebook")
    val lut = queries.crossJoin(broadcast(cb))
      .select(col("query_id") +: col("cid") +:
        (0 until NumSub).map(m => subDistSq("eq", "ce", m).as(s"d$m")): _*)
      .selectExpr("query_id", "cid",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
    val cand = spark.read.parquet(s"$dir/codes").filter(candPred)
      .selectExpr("vec_id AS neighbor_id",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, code_$m").mkString(", ")}) as (m, code)")
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

  /** G11 — `knn_pq`: ADC top-k. The per-query lookup table (queries ×
    * M × K codewords) is computed exact once and broadcast; each
    * candidate is scored by M equi-join lookups + one quantized sum —
    * zero vector arithmetic per candidate.
    */
  def knn(emb: DataFrame): DataFrame =
    graft.plans.AggExpressions
      .topKPerKey(adcScores(emb), "query_id", "sim", "neighbor_id",
        Seq("adist"), K)
      .select("query_id", "rank", "neighbor_id", "adist")
      .orderBy("query_id", "rank")

  /** The per-(query, candidate) ADC score frame — the shared stage-1
    * body of [[knn]] (top-k directly) and [[knnRerank]] (top-R
    * shortlist, then exact rescoring).
    */
  private[sim] def adcScores(emb: DataFrame): DataFrame = {
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
    cand
      .join(broadcast(lut),
        cand("m") === lut("m") && cand("code") === lut("cid"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dsq").cast("decimal(24,12)")).cast("double")
        .as("adist"))
      .withColumn("sim", -col("adist"))
  }

  /** Shortlist size of the rerank's first stage (R > k; the
    * compressed index proposes R, the exact metric disposes k).
    */
  val RerankR = 10

  /** G24 — `knn_pq_rerank`: TWO-STAGE retrieval, the standard serving
    * pattern a compressed index runs in production (FAISS's
    * refine/rerank stage): the ADC stage proposes a top-[[RerankR]]
    * shortlist per query with zero per-candidate vector arithmetic,
    * then ONLY those queries×R rows fetch raw embeddings and re-score
    * with the exact quantized squared-L2 — so the expensive exact
    * metric touches R candidates per query instead of the corpus, and
    * ADC's quantization error can no longer reorder the final top-k
    * WITHIN the shortlist (recall(rerank@k) ≥ recall(adc@k),
    * spec-pinned against the brute-force ground truth).
    *
    * Scale shape: stage 1 is [[knn]]'s bounded ADC plan; stage 2
    * broadcasts the queries×R shortlist (with the 5 query vectors)
    * into the corpus scan — one broadcast hash join, no shuffle of
    * the data side, exact arithmetic on R×queries rows only.
    */
  def knnRerank(emb: DataFrame): DataFrame = {
    val e = emb.select("vec_id", "embedding")
    val shortlist = graft.plans.AggExpressions
      .topKPerKey(adcScores(emb), "query_id", "sim", "neighbor_id",
        Seq("adist"), RerankR)
      .select("query_id", "neighbor_id", "adist")
    val q = e.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val withQ = shortlist.join(broadcast(q), "query_id")
    val scored = e.filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("en"))
      .join(broadcast(withQ), "neighbor_id")
      .withColumn("dist", fullDistSq("eq", "en"))
      .withColumn("sim", -col("dist"))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id",
        Seq("dist", "adist"), K)
      .select("query_id", "rank", "neighbor_id", "dist", "adist")
      .orderBy("query_id", "rank")
  }

  /** Residual PQ codes under the GIVEN coarse quantizer (the FAISS
    * IVFPQ storage layout): each vector quantizes its residual
    * x − centroid(list(x)) — not x itself — so codes spend their
    * precision on within-list variation, which is why IVFPQ beats
    * flat PQ at equal bytes. Assignment rides the shared
    * [[Ivf.givenListed]] build (one broadcast-argmax build serves
    * G2c/F10b/G12); the residual is one broadcast centroid join +
    * a zip_with projection, and code argmin is the same broadcast
    * codebook join + combinable min_by as [[codes]] — linear at any
    * corpus size.
    */
  // one residual-encode build serves search + any re-probe (the codes
  // memo discipline); narrow rows, checkpointed past clearCache
  private val residCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Bench instrumentation only: evict so a sweep re-times the builds cold. */
  private[graft] def clearCacheForBench(): Unit = {
    codesCache.clear(); residCache.clear()
  }

  def residualCodes(emb: DataFrame): DataFrame = {
    val key = (emb.sparkSession, graft.Memo.planKey(emb))
    residCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    residCache.synchronized {
      residCache.getOrElseUpdate(key, {
        val (cents, assigned) = Ivf.givenListed(emb)
        val resid = assigned
          .join(broadcast(cents.select(col("cid").as("list_id"), col("ce"))),
            "list_id")
          .withColumn("resid", expr(
            "zip_with(embedding, ce, (x, c) -> cast(x as double) - cast(c as double))"))
          .select("vec_id", "list_id", "resid")
        // per-subspace argmins fused into ONE aggregate over the
        // (vec, candidate-codeword) rows, then unpivoted: the former
        // stack-first form exploded the distance rows ×NumSub before
        // aggregating and shuffled 4 rows per vector — this ships one
        // map-side-reduced row per vector and stacks AFTER the
        // aggregate (a projection: no exchange, and the (vec_id,
        // list_id) partitioning survives for saveIvfPq's re-pivot).
        // min_by per m over the same (dsq, cid) order — codes
        // identical.
        resid.crossJoin(broadcast(codebook(emb)))
          .select(col("vec_id") :: col("list_id") :: col("cid") ::
            (0 until NumSub).map(m =>
              subDistSqD("resid", "ce", m).as(s"d$m")).toList: _*)
          .groupBy("vec_id", "list_id")
          .agg(
            min_by(col("cid"), struct(col("d0"), col("cid"))).as("code_0"),
            (1 until NumSub).map(m =>
              min_by(col("cid"), struct(col(s"d$m"), col("cid")))
                .as(s"code_$m")): _*)
          .selectExpr("vec_id", "list_id",
            s"stack($NumSub, ${(0 until NumSub)
              .map(m => s"$m, code_$m").mkString(", ")}) as (m, code)")
          .localCheckpoint(true)
      })
    }
  }

  /** Force the residual-encode build (Bench bills it separately). */
  def prebuildResidual(spark: SparkSession, dir: String): Unit = {
    residualCodes(
      Tables.embeddings(spark, dir).select("vec_id", "embedding")); ()
  }

  /** G12 — `knn_ivfpq`: the composed billion-vector serving index
    * (FAISS IVFPQ shape). A query ranks the broadcast centroid table
    * (the G2c probe rule — cosine routing, shared assignment chain),
    * takes its residual AGAINST EACH PROBED LIST's centroid, builds
    * the per-(query, list) ADC lookup table exact once (queries ×
    * nProbe × M × K rows — broadcastable at any corpus size), and
    * scores only candidates stored in probed lists by M equi-join
    * lookups + one quantized sum. Per-query work is O(√n-ish list
    * scan) with zero per-candidate vector arithmetic — the IVF probe
    * bound and the PQ scoring bound composed, which is the layout
    * actually serving 10⁹-vector search.
    */
  def knnIvfPq(emb: DataFrame): DataFrame =
    graft.plans.AggExpressions
      .topKPerKey(ivfPqScores(emb), "query_id", "sim", "neighbor_id",
        Seq("adist", "list_id"), K)
      .select("query_id", "rank", "neighbor_id", "adist", "list_id")
      .orderBy("query_id", "rank")

  /** G25 — `knn_ivfpq_rerank`: the refine stage over the COMPOSED
    * index (the G24 two-stage pattern applied to the production
    * IVFPQ shape — coarse routing + residual ADC proposes, exact
    * re-scores): top-[[RerankR]] ADC candidates per query fetch raw
    * embeddings via a broadcast of the shortlist into the corpus
    * scan and re-rank by exact quantized squared-L2. The IVF probe
    * bound and the PQ scoring bound still govern stage 1; stage 2
    * touches queries×R rows at any corpus size.
    */
  def knnIvfPqRerank(emb: DataFrame): DataFrame = {
    val e = emb.select("vec_id", "embedding")
    val shortlist = graft.plans.AggExpressions
      .topKPerKey(ivfPqScores(emb), "query_id", "sim", "neighbor_id",
        Seq("adist", "list_id"), RerankR)
      .select("query_id", "neighbor_id", "adist")
    val q = e.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val withQ = shortlist.join(broadcast(q), "query_id")
    val scored = e.filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("en"))
      .join(broadcast(withQ), "neighbor_id")
      .withColumn("dist", fullDistSq("eq", "en"))
      .withColumn("sim", -col("dist"))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id",
        Seq("dist", "adist"), K)
      .select("query_id", "rank", "neighbor_id", "dist", "adist")
      .orderBy("query_id", "rank")
  }

  /** The per-(query, candidate) residual-ADC score frame — the shared
    * stage-1 body of [[knnIvfPq]] and [[knnIvfPqRerank]].
    */
  private[sim] def ivfPqScores(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, assigned) = Ivf.givenListed(emb)
    val queries = assigned.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"),
        col("nsq").as("nq"))
    val probeRank = Window.partitionBy("query_id")
      .orderBy(desc("c_cos"), asc("cid"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("c_cos", Vectors.cosineFrom(
        Vectors.dot("eq", "ce"), col("nq"), col("cn")))
      .withColumn("prnk", row_number().over(probeRank))
      .filter(col("prnk") <= Ivf.GivenProbe)
      .select(col("query_id"), col("eq"), col("cid").as("list_id"),
        col("ce"))
    val lut = probes
      .withColumn("qres", expr(
        "zip_with(eq, ce, (x, c) -> cast(x as double) - cast(c as double))"))
      .select("query_id", "list_id", "qres")
      .crossJoin(broadcast(codebook(emb)))
      .select(col("query_id") :: col("list_id").as("l_list") :: col("cid") ::
        (0 until NumSub).map(m =>
          subDistSqD("qres", "ce", m).as(s"d$m")).toList: _*)
      .selectExpr("query_id", "l_list", "cid",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
    val cand = residualCodes(emb).filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("list_id"),
        col("m").as("c_m"), col("code"))
    val adist = cand.join(broadcast(lut),
        cand("list_id") === lut("l_list") && cand("c_m") === lut("m") &&
          cand("code") === lut("cid"))
      .groupBy("query_id", "neighbor_id", "list_id")
      .agg(sum(col("dsq").cast("decimal(24,12)")).cast("double")
        .as("adist"))
      .withColumn("sim", -col("adist"))
    adist
  }

  // --- persisted IVFPQ (SURVEY §2 G26/G27) ---------------------------

  /** Persist the COMPOSED IVFPQ index — the production billion-vector
    * layout (FAISS IVFPQ + IndexRefineFlat), which until round 16
    * existed only in-session:
    *
    *  - `centroids/` — the coarse quantizer (cid, ce, cn): tiny,
    *    broadcast at serve time;
    *  - `codebook/`  — the PQ codeword table: tiny, broadcast into
    *    the per-(query, list) LUT build;
    *  - `codes/`     — RESIDUAL codes packed one row per vector
    *    (M one-byte codes in M columns), PARTITIONED BY list_id with
    *    one file per list directory (the IndexStore layout: an
    *    inverted list is read whole or not at all, and the probe set
    *    becomes a partition IN-filter so an unprobed list costs
    *    nothing — not even a scan-and-discard);
    *  - `refine/`    — raw vectors partitioned by list_id, read ONLY
    *    by the rerank face's shortlist fetch (FAISS keeps the refine
    *    layer's raw vectors beside the compressed index the same
    *    way; the ADC serve path never touches it).
    */
  def saveIvfPq(emb: DataFrame, dir: String): Unit = {
    val (cents, assigned) = graft.Profiling.phase("saveivfpq.givenListed") {
      Ivf.givenListed(emb) }
    // materialize the shared prerequisite of the codes layout before
    // forking: residualCodes is a synchronized memo build, so forcing
    // it here keeps the parallel region free of lock convoys
    val rc = graft.Profiling.phase("saveivfpq.residualCodes") {
      residualCodes(emb.select("vec_id", "embedding")) }
    val codeCols = (0 until NumSub).map(m =>
      max(when(col("m") === m, col("code"))).as(s"code_$m"))
    // four independent writes into disjoint subdirs (guide §2.6):
    // centroids/codebook are tiny commits, codes and refine each a
    // single-shuffle write off already-checkpointed inputs
    graft.Par.jobs[Unit](Seq(
      () => graft.Profiling.phase("saveivfpq.centroids_codebook") {
        cents.write.mode("overwrite").parquet(s"$dir/centroids")
        codebook(emb).write.mode("overwrite").parquet(s"$dir/codebook")
      },
      () => graft.Profiling.phase("saveivfpq.codes") {
        rc.groupBy("vec_id", "list_id")
          .agg(codeCols.head, codeCols.tail: _*)
          .repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id")
          .parquet(s"$dir/codes")
      },
      () => graft.Profiling.phase("saveivfpq.refine") {
        assigned.select("vec_id", "embedding", "list_id")
          .repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id")
          .parquet(s"$dir/refine")
      }))
  }

  // explicit schemas (the r9 empty-corpus discipline, and partition
  // directories must type list_id BIGINT like the fresh path)
  private[sim] def loadIvfPqCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("vec_id BIGINT, " +
        (0 until NumSub).map(m => s"code_$m BIGINT").mkString(", ") +
        ", list_id BIGINT")
      .parquet(s"$dir/codes")

  private def loadIvfPqRefine(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, list_id BIGINT")
      .parquet(s"$dir/refine")

  /** G28 — incremental maintenance of the composed index (the
    * [[graft.sim.IndexStore.appendGiven]] arrival path applied to
    * IVFPQ): assign ONLY the new vectors against the SAVED coarse
    * quantizer (one broadcast-argmax pass), residual-encode them
    * against the SAVED codebook (one broadcast join + combinable
    * argmin), and append packed codes + raw refine rows into the
    * partitioned layouts — existing lists are never read or
    * rewritten. For a fixed quantizer and codebook the result is
    * IDENTICAL to a full rebuild over the union corpus (assignment
    * and encoding are per-vector; spec-pinned), which is exactly why
    * production indexes pin both and retrain offline.
    */
  def appendIvfPq(newEmb: DataFrame, dir: String): Unit = {
    val spark = newEmb.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebook")
    val e = newEmb.select(col("vec_id"), col("embedding"),
      Vectors.normSq("embedding").as("nsq"))
    val assignNarrow = e.crossJoin(broadcast(cents))
      .withColumn("c_cos", Vectors.cosineFrom(
        Vectors.dot("embedding", "ce"), col("nsq"), col("cn")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("c_cos"), -col("cid")))
        .as("list_id"))
    // consumed twice (codes + refine writes): checkpoint so the
    // broadcast-argmax assignment runs once per batch
    val assigned = e.join(assignNarrow, "vec_id").localCheckpoint(true)
    val resid = assigned
      .join(broadcast(cents.select(col("cid").as("list_id"), col("ce"))),
        "list_id")
      .withColumn("resid", expr(
        "zip_with(embedding, ce, (x, c) -> cast(x as double) - cast(c as double))"))
      .select("vec_id", "list_id", "resid")
    // per-subspace argmins in ONE aggregate directly over the
    // (vec, candidate-codeword) rows: the former stack-unpivot +
    // groupBy(vec, list, m) + pivot-groupBy(vec, list) chain ran TWO
    // shuffles and exploded the distance rows ×NumSub first — the
    // fused form ships each (vec, cid) row once and its map-side
    // partial aggregate already reduces to one row per vector
    // (min_by per m over the same (dsq, cid) order — identical codes)
    val codeCols = (0 until NumSub).map(m =>
      min_by(col("cid"), struct(col(s"d$m"), col("cid"))).as(s"code_$m"))
    val codesWide = resid.crossJoin(broadcast(cb))
      .select(col("vec_id") :: col("list_id") :: col("cid") ::
        (0 until NumSub).map(m =>
          subDistSqD("resid", "ce", m).as(s"d$m")).toList: _*)
      .groupBy("vec_id", "list_id")
      .agg(codeCols.head, codeCols.tail: _*)
    // both appends read the checkpointed assignment and land in
    // disjoint layouts — overlap them (guide §2.6)
    graft.Par.jobs[Unit](Seq(
      () => codesWide
        .repartition(col("list_id"))
        .write.mode("append").partitionBy("list_id")
        .parquet(s"$dir/codes"),
      () => assigned.select("vec_id", "embedding", "list_id")
        .repartition(col("list_id"))
        .write.mode("append").partitionBy("list_id")
        .parquet(s"$dir/refine")))
  }

  /** [[appendIvfPq]] guarded by a batch-id marker (the
    * SnapshotStore.applyDiffOnce discipline): an at-least-once
    * re-delivered batch — the Structured Streaming foreachBatch
    * contract — is a no-op instead of appending duplicate vec_id rows
    * into codes/ and refine/. This is the ingest entry the J-block
    * stream face uses; callers of the RAW [[appendIvfPq]] must
    * deduplicate and serialize their own batches (two concurrent
    * appends can interleave writes into the same partition
    * directories). Residual window (the applyDiffOnce caveat applies
    * here too): the append is two write jobs (codes and refine,
    * overlapped — either may commit first) and
    * the marker lands only after both — a crash after either append
    * committed but before the marker means the replay re-appends the
    * whole batch, duplicating its landed vec_id rows in the
    * already-committed layout(s). Closable only by a transactional
    * manifest across both layouts; until then a post-crash recovery
    * should [[deleteIvfPq]] the batch's ids before replaying.
    */
  def appendIvfPqOnce(newEmb: DataFrame, dir: String,
      batchId: Long): Unit =
    graft.FsOps.onceByMarker(
      graft.FsOps.fs(newEmb.sparkSession, dir), dir, batchId) {
      appendIvfPq(newEmb, dir)
    }

  /** G29 — compaction for the composed index: each [[appendIvfPq]]
    * lays one file per touched list in BOTH layouts, so a long-lived
    * index accumulates small files (listing + per-file open dominate
    * a probe's read). Rewrites codes/ and refine/ to one file per
    * list directory via CHECKED staged swaps ([[graft.FsOps.swapDir]]
    * — rename failures throw instead of silently losing a layout, and
    * stale `_old` leftovers from a prior crash are cleared first).
    * Crash contract: per-LAYOUT atomicity — each layout is swapped
    * whole (mid-swap the data survives under its `_old`); a crash
    * BETWEEN the two layouts' swaps leaves codes/ and refine/ from
    * different compaction generations, both complete and serving
    * identically (compaction never changes content) — re-run to
    * reconverge. Serving is unchanged (spec-pinned); the rewrite
    * touches each layout once, bounded by index size, never the raw
    * corpus.
    */
  def compactIvfPq(spark: SparkSession, dir: String): Unit = {
    recoverDeleteOld(spark, dir)
    val fs = graft.FsOps.fs(spark, dir)
    // the two layout rewrites are independent (disjoint staging dirs,
    // per-layout swap atomicity — the documented crash contract
    // already allows the layouts to sit in different compaction
    // generations) — overlap them (guide §2.6)
    graft.Par.jobs[Unit](Seq(
      "codes" -> loadIvfPqCodes(spark, dir),
      "refine" -> loadIvfPqRefine(spark, dir)).map { case (sub, df) =>
      () => {
        val staged = s"$dir/${sub}_compact_staging"
        df.repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id").parquet(staged)
        graft.FsOps.swapDir(fs, staged, s"$dir/$sub")
      }
    })
  }

  /** G30 — deletion from the composed index, completing its CRUD
    * lifecycle (save / serve / append / compact / DELETE — the
    * [[graft.sim.IndexStore.deleteGiven]] discipline applied to both
    * IVFPQ layouts): the delete set joins the codes once to find the
    * TOUCHED lists (O(nLists) driver rows, the probe-set bound), only
    * those list directories rewrite in codes/ AND refine/ via
    * staging + per-directory swap (an emptied list's directory
    * drops), untouched lists never read.
    */
  /** Crash recovery for [[deleteIvfPq]]'s per-list swap: a list
    * directory stranded under a `_delete_old` sidecar whose live
    * counterpart is ABSENT is the surviving copy from an interrupted
    * swap (renamed out; crash before the staged rewrite renamed in) —
    * roll it back into the live layout before proceeding (the
    * SnapshotStore purge roll-back-first discipline). Lists present
    * in BOTH places are superseded copies, left for the next delete's
    * stale sweep. Every maintenance entry point that reads or rewrites
    * the layouts ([[deleteIvfPq]], [[compactIvfPq]],
    * [[rebalanceIvfPq]]) runs this first; pure serve loads don't
    * mutate, so a post-crash serve before any maintenance can still
    * miss the stranded lists — the price of read paths staying
    * read-only.
    */
  private[sim] def recoverDeleteOld(spark: SparkSession, dir: String,
      subs: Seq[String] = Seq("codes", "refine")): Unit = {
    val fs = graft.FsOps.fs(spark, dir)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    for (sub <- subs) {
      val oldRoot = path(s"$dir/${sub}_delete_old")
      if (fs.exists(oldRoot))
        for (st <- fs.listStatus(oldRoot)
            if st.getPath.getName.startsWith("list_id=")) {
          val live = path(s"$dir/$sub/${st.getPath.getName}")
          if (!fs.exists(live))
            require(fs.rename(st.getPath, live),
              s"ivfpq delete recovery at $dir: " +
                s"rename ${st.getPath} to $live failed")
        }
      // the emptied sidecar holds only COMMITTED-deleted rows (lists
      // a delete legitimately emptied — parked there precisely so
      // the live-absent rollback above cannot resurrect them); clear
      fs.delete(path(s"$dir/${sub}_delete_emptied"), true)
    }
  }

  def deleteIvfPq(spark: SparkSession, dir: String,
      ids: DataFrame): Unit = {
    // recover FIRST: after a mid-loop crash the live layout can be
    // missing lists whose only copy sits under _delete_old — roll
    // those back before anything reads the layout (the touched-list
    // scan below would silently miss their rows) and before the old
    // sidecar is cleared as stale (the r17 ADVICE window: re-running
    // the delete — the natural recovery — destroyed them)
    recoverDeleteOld(spark, dir)
    val del = ids.select(col("vec_id")).distinct().localCheckpoint(true)
    // touched lists computed PER LAYOUT, not from codes alone: after
    // a crash between the codes and refine passes the ids are
    // already gone from codes, and a codes-derived set would make
    // the re-run — the documented recovery — return early while
    // refine/ retains the deleted vectors' raw embeddings forever
    // (found by review in round 18)
    for ((sub, df) <- Seq(
        "codes" -> loadIvfPqCodes(spark, dir),
        "refine" -> loadIvfPqRefine(spark, dir))) {
      val touched = df.join(del, "vec_id")
        .select("list_id").distinct()
        .collect().map(_.getLong(0)).sorted
      if (touched.nonEmpty)
        deleteFromListLayout(spark, dir, sub, df, del, touched)
    }
  }

  /** The per-layout half of [[deleteIvfPq]], shared with the trained
    * index's codes-only delete ([[PqTrained.deleteTrained]]): stage
    * the touched lists' anti-joined rewrite, then per-list swap with
    * CHECKED renames — the live directory moves to a sidecar
    * `_delete_old` root FIRST (outside the layout, so partition
    * discovery never sees it), then the staged rewrite renames in; a
    * crash mid-swap leaves every touched list's data recoverable
    * under _delete_old, never destroyed (callers run
    * [[recoverDeleteOld]] before reading or clearing anything). A
    * concurrent reader during the loop can still observe a touched
    * list briefly absent (quiesce serving during deletes, or read
    * through a snapshot) — the old rows, however, are never the only
    * casualty of a crash.
    */
  private[sim] def deleteFromListLayout(spark: SparkSession,
      dir: String, sub: String, df: DataFrame, del: DataFrame,
      touched: Array[Long]): Unit = {
    val fs = graft.FsOps.fs(spark, dir)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val staged = s"$dir/${sub}_delete_staging"
    df.filter(col("list_id").isin(touched: _*))
      .join(del, Seq("vec_id"), "left_anti")
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(staged)
    val oldRoot = s"$dir/${sub}_delete_old"
    val emptiedRoot = s"$dir/${sub}_delete_emptied"
    // safe to clear: recoverDeleteOld already rolled back any list
    // whose only copy lived under _delete_old, and _delete_emptied
    // only ever holds committed-deleted data
    fs.delete(path(oldRoot), true)
    fs.delete(path(emptiedRoot), true)
    fs.mkdirs(path(oldRoot))
    fs.mkdirs(path(emptiedRoot))
    for (lid <- touched) {
      val live = path(s"$dir/$sub/list_id=$lid")
      val next = path(s"$staged/list_id=$lid")
      if (fs.exists(next)) {
        require(fs.rename(live, path(s"$oldRoot/list_id=$lid")),
          s"ivfpq delete at $dir: rename $live to $oldRoot failed")
        require(fs.rename(next, live),
          s"ivfpq delete at $dir: rename $next to $live failed")
      } else
        // the delete emptied this list: live-absent IS the final
        // state, so the old rows must NOT land under _delete_old —
        // recoverDeleteOld's live-absent rollback heuristic would
        // resurrect them into the next compact/rebalance (found by
        // review in round 18). They park under the emptied sidecar,
        // which recovery only ever clears.
        require(fs.rename(live, path(s"$emptiedRoot/list_id=$lid")),
          s"ivfpq delete at $dir: rename $live to $emptiedRoot failed")
    }
    fs.delete(path(staged), true)
    fs.delete(path(oldRoot), true)
    fs.delete(path(emptiedRoot), true)
    ()
  }

  /** G31 — occupancy REBALANCE for the composed index (the G23
    * split/merge arc applied to IVFPQ): what makes this a distinct
    * operator from the flat-IVF rebalance is that moving a vector to
    * a NEW list changes its RESIDUAL — codes quantize x − centroid,
    * so every moved (and split-reassigned) vector must RE-ENCODE
    * against its new centroid. The refine sidecar is what makes that
    * possible without the original corpus: raw vectors read from the
    * touched lists only, re-encoded against the loaded codebook, and
    * both layouts rewrite through per-directory staged swaps.
    *
    * Decision algebra is [[graft.sim.IndexStore.rebalanceGiven]]'s
    * (same policy bands, quantile seeding, keep-only merge targets,
    * survivors-not-keeps quantizer filter — the round-16 mass-loss
    * lesson baked in from the start); target lists' own members keep
    * their centroid, so their re-encode is a bit-identical no-op and
    * staging them costs only their directory rewrite. Returns whether
    * the pass acted; iterate with a cap for convergence exactly like
    * `rebalanceUntilBand`.
    */
  def rebalanceIvfPq(spark: SparkSession, dir: String,
      policy: IndexStore.RebalancePolicy =
        IndexStore.RebalancePolicy.Standard): Boolean = {
    import spark.implicits._
    recoverDeleteOld(spark, dir)
    val cents = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebook")
    val counts = loadIvfPqCodes(spark, dir).groupBy("list_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return false
    val total = counts.values.sum
    val nl = counts.size.toLong
    val splits = counts.collect { case (l, n)
      if n * nl * policy.splitDen > policy.splitNum * total => l }.toSet
    val mergesRaw = counts.collect { case (l, n)
      if n * nl * policy.mergeDen < policy.mergeNum * total => l }.toSet
    val keeps = counts.keySet -- splits -- mergesRaw
    val merges = if (keeps.isEmpty) Set.empty[Long] else mergesRaw
    if (splits.isEmpty && merges.isEmpty) return false
    val survivors = counts.keySet -- splits -- merges

    val mtgt: Map[Long, Long] =
      if (merges.isEmpty) Map.empty
      else cents.filter(col("cid").isin(merges.toSeq: _*))
        .select(col("cid").as("mc"), col("ce").as("me"), col("cn").as("mn"))
        .crossJoin(broadcast(cents.filter(col("cid").isin(keeps.toSeq: _*))))
        .withColumn("cos", Vectors.cosineFrom(
          Vectors.dot("me", "ce"), col("mn"), col("cn")))
        .groupBy("mc")
        .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("tgt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(mtgt.keySet == merges,
      s"ivfpq rebalance at $dir: merge lists ${merges -- mtgt.keySet} " +
        "have no centroid row — centroids/ diverged from codes/")

    val refine = loadIvfPqRefine(spark, dir)
      .withColumn("nsq", Vectors.normSq("embedding"))
    val splitSeq = splits.toSeq.sorted
    val subcents: Option[DataFrame] =
      if (splits.isEmpty) None
      else {
        import org.apache.spark.sql.expressions.Window
        val ranks = splitSeq.flatMap { p =>
          val n = counts(p)
          val s = math.max(2L, math.min((n * nl + total - 1) / total, n))
          (0L until s).map(j => (p, ((2 * j + 1) * n) / (2 * s) + 1))
        }.toDF("list_id", "mr")
        val ranked = refine.filter(col("list_id").isin(splitSeq: _*))
          .join(broadcast(cents), col("list_id") === col("cid"))
          .withColumn("pcos", Vectors.cosineFrom(
            Vectors.dot("embedding", "ce"), col("nsq"), col("cn")))
          .withColumn("mr", row_number().over(Window
            .partitionBy("list_id").orderBy(desc("pcos"), asc("vec_id"))))
        Some(ranked.join(broadcast(ranks), Seq("list_id", "mr"))
          .select(col("list_id").as("parent"), col("vec_id").as("subcid"),
            col("embedding").as("se"), col("nsq").as("sn"))
          .localCheckpoint(true))
      }

    // staged raw rows, each under its NEW list id
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    subcents.foreach { sc =>
      val sa = refine.filter(col("list_id").isin(splitSeq: _*))
        .join(broadcast(sc), col("list_id") === col("parent"))
        .withColumn("scos", Vectors.cosineFrom(
          Vectors.dot("embedding", "se"), col("nsq"), col("sn")))
        .groupBy("vec_id")
        .agg(max_by(col("subcid"), struct(col("scos"), -col("subcid")))
          .as("new_list"))
      staged += refine.filter(col("list_id").isin(splitSeq: _*))
        .join(sa, "vec_id")
        .select(col("vec_id"), col("embedding"),
          col("new_list").as("list_id"))
    }
    if (merges.nonEmpty) {
      val mt = mtgt.toSeq.sorted.toDF("m", "tgt")
      staged += refine.filter(col("list_id").isin(merges.toSeq: _*))
        .join(broadcast(mt), col("list_id") === col("m"))
        .select(col("vec_id"), col("embedding"), col("tgt").as("list_id"))
      val targets = mtgt.values.toSet.toSeq.sorted
      staged += refine.filter(col("list_id").isin(targets: _*))
        .select("vec_id", "embedding", "list_id")
    }
    val stagedRaw = staged.reduce(_.unionByName(_)).localCheckpoint(true)

    // the post-rebalance quantizer (survivors + sub-centroids)
    val newCents = subcents match {
      case Some(sc) => cents.filter(col("cid").isin(survivors.toSeq: _*))
        .unionByName(sc.select(col("subcid").as("cid"),
          col("se").as("ce"), col("sn").as("cn")))
      case None => cents.filter(col("cid").isin(survivors.toSeq: _*))
    }

    // RE-ENCODE staged rows against their NEW centroid — the step
    // that distinguishes this from the flat-IVF rebalance
    val stagedResid = stagedRaw
      .join(broadcast(newCents.select(col("cid").as("list_id"),
        col("ce"))), "list_id")
      .withColumn("resid", expr(
        "zip_with(embedding, ce, (x, c) -> cast(x as double) - cast(c as double))"))
      .select("vec_id", "list_id", "resid")
    val codeCols = (0 until NumSub).map(m =>
      max(when(col("m") === m, col("code"))).as(s"code_$m"))
    val stagedCodes = stagedResid.crossJoin(broadcast(cb))
      .select(col("vec_id") :: col("list_id") :: col("cid") ::
        (0 until NumSub).map(m =>
          subDistSqD("resid", "ce", m).as(s"d$m")).toList: _*)
      .selectExpr("vec_id", "list_id", "cid",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
      .groupBy("vec_id", "list_id", "m")
      .agg(min_by(col("cid"), struct(col("dsq"), col("cid"))).as("code"))
      .groupBy("vec_id", "list_id")
      .agg(codeCols.head, codeCols.tail: _*)

    // commit: staged layouts + centroids, then per-directory swaps
    // in BOTH layouts (split parents out, staged in, merges out),
    // every rename CHECKED (a false return throws instead of leaving
    // a half-swapped layout silently). CONSISTENCY CONTRACT: the
    // three layouts (codes, refine, centroids) do not flip atomically
    // — a crash or concurrent read between the codes swap and the
    // centroids swap observes the OLD quantizer over partially-moved
    // lists and can silently miss the moved vectors. Serving must be
    // QUIESCED for the duration of a rebalance pass (only
    // between-pass states are serveable); a deployment wanting
    // serve-during-rebalance would commit all three layouts through
    // one version pointer (the SnapshotStore v=<n>/_current
    // discipline) at the cost of a full-index copy per pass.
    val fs = graft.FsOps.fs(spark, dir)
    val centsStaging = s"$dir/centroids_rebalance_staging"
    newCents.write.mode("overwrite").parquet(centsStaging)
    for ((sub, df) <- Seq("codes" -> stagedCodes,
        "refine" -> stagedRaw.select("vec_id", "embedding", "list_id"))) {
      val stagingDir = s"$dir/${sub}_rebalance_staging"
      df.repartition(col("list_id"))
        .write.mode("overwrite").partitionBy("list_id").parquet(stagingDir)
      def listDir(l: Long) = new org.apache.hadoop.fs.Path(
        s"$dir/$sub/list_id=$l")
      for (p <- splitSeq) fs.delete(listDir(p), true)
      for (st <- fs.listStatus(new org.apache.hadoop.fs.Path(stagingDir))
           if st.getPath.getName.startsWith("list_id=")) {
        val live = new org.apache.hadoop.fs.Path(
          s"$dir/$sub/${st.getPath.getName}")
        if (fs.exists(live)) fs.delete(live, true)
        require(fs.rename(st.getPath, live),
          s"ivfpq rebalance at $dir: rename ${st.getPath} to $live failed")
      }
      for (m <- merges.toSeq.sorted) fs.delete(listDir(m), true)
      fs.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
    }
    graft.FsOps.swapDir(fs, centsStaging, s"$dir/centroids")
    true
  }

  /** [[rebalanceIvfPq]] iterated to convergence — same contract as
    * `IndexStore.rebalanceUntilBand` (eager per-pass commits; a
    * return equal to `maxPasses` signals an unsatisfiable band).
    */
  def rebalanceIvfPqUntilBand(spark: SparkSession, dir: String,
      policy: IndexStore.RebalancePolicy =
        IndexStore.RebalancePolicy.Standard,
      maxPasses: Int = 8): Int = {
    var passes = 0
    while (passes < maxPasses && rebalanceIvfPq(spark, dir, policy))
      passes += 1
    passes
  }

  /** J20 — a STREAM of query vectors answered from the SAVED composed
    * IVFPQ index (the online half of G26's serving story, under the
    * same Structured-Streaming constraints as the IVF serve stream):
    *
    *  - probe selection is STATELESS — the loaded centroids pack into
    *    ONE broadcast row and each query scores/sorts/slices them
    *    inside a projection (windows are disallowed on streams);
    *  - the residual-ADC distance computes INLINE per candidate from
    *    the packed codebook row (codeword looked up by code id inside
    *    the projection) instead of materializing the per-(query,
    *    list) LUT — arithmetic is the same decimal-quantized per-
    *    subspace sums in the same order, so scores are BIT-equal to
    *    the batch serve (spec-pinned);
    *  - candidates come from a stream-static equi-join on list_id
    *    against the loaded codes;
    *  - per-query top-k is the collectTopK aggregate in UPDATE mode.
    */
  def ivfPqServeStream(queries: DataFrame, indexDir: String,
      candPred: Column): DataFrame = {
    val spark = queries.sparkSession
    val packedCents = spark.read.parquet(s"$indexDir/centroids")
      .agg(sort_array(collect_list(struct(col("cid"), col("ce"),
        col("cn")))).as("cents"))
      .withColumn("j", lit(1))
    val packedCb = spark.read.parquet(s"$indexDir/codebook")
      .agg(sort_array(collect_list(struct(col("cid"), col("ce"))))
        .as("cbk"))
      .withColumn("j", lit(1))
    // (negcos, cid) struct sort = the batch probe ranking (cos desc,
    // cid asc); ce rides along for the residual
    val scoredArr =
      s"""transform(cents, c -> named_struct(
         |  'negcos', -(cast(aggregate(
         |      zip_with(eq, c.ce, (xv, yv) ->
         |        cast(cast(xv as double) * cast(yv as double)
         |             as decimal(24,12))),
         |      cast(0 as decimal(24,12)),
         |      (acc, v) -> cast(acc + v as decimal(24,12))) as double)
         |    / (sqrt(nq) * sqrt(c.cn))),
         |  'cid', c.cid, 'ce', c.ce))""".stripMargin
    val probes = queries
      .select(col("query_id"), col("eq"), Vectors.normSq("eq").as("nq"),
        lit(1).as("j"))
      .join(broadcast(packedCents), "j")
      .select(col("query_id"), col("j"),
        explode(expr(
          s"slice(array_sort($scoredArr), 1, ${Ivf.GivenProbe})"))
          .as("p"),
        col("eq"))
      .select(col("query_id"), col("j"), col("p.cid").as("list_id"),
        expr("zip_with(eq, p.ce, " +
          "(x, c) -> cast(x as double) - cast(c as double))").as("qres"))
      .join(broadcast(packedCb), "j")
    val cand = loadIvfPqCodes(spark, indexDir).filter(candPred)
      .select(col("vec_id").as("neighbor_id") +: col("list_id") +:
        (0 until NumSub).map(m => col(s"code_$m")): _*)
    // per-subspace quantized distance against the code's codeword,
    // looked up in the packed codebook row — subDistSqD inlined
    def dm(m: Int): String =
      s"""cast(aggregate(
         |  zip_with(slice(qres, ${m * SubDim + 1}, $SubDim),
         |    slice(filter(cbk, c -> c.cid = code_$m)[0].ce,
         |      ${m * SubDim + 1}, $SubDim),
         |    (xv, yv) -> cast((xv - cast(yv as double))
         |      * (xv - cast(yv as double)) as decimal(24,12))),
         |  cast(0 as decimal(24,12)),
         |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)"""
        .stripMargin
    val scored = probes.join(cand, "list_id")
      .withColumn("adist", expr(
        s"cast(${(0 until NumSub)
          .map(m => s"cast(${dm(m)} as decimal(24,12))")
          .mkString(" + ")} as double)"))
      .withColumn("sim", -col("adist"))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id",
        Seq("adist", "list_id"), K)
      .select("query_id", "rank", "neighbor_id", "adist", "list_id")
  }

  /** The served stage-1 residual-ADC score frame — [[ivfPqScores]]
    * replayed from the loaded artifact: probe routing against the
    * loaded centroids, per-(query, list) LUT against the loaded
    * codebook, and the candidate scan bounded by PARTITION PRUNING on
    * the driver-collected probe set (O(#queries × nProbe) ids — the
    * serving-size quantity, never the corpus). Bit-identical scores:
    * parquet round-trips floats/doubles losslessly and every
    * reduction is the same decimal-quantized sum.
    */
  private def servedIvfPqScores(spark: SparkSession, dir: String,
      queries: DataFrame, candPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebook")
    val q = queries.withColumn("nq", Vectors.normSq("eq"))
    val probeRank = Window.partitionBy("query_id")
      .orderBy(desc("c_cos"), asc("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("c_cos", Vectors.cosineFrom(
        Vectors.dot("eq", "ce"), col("nq"), col("cn")))
      .withColumn("prnk", row_number().over(probeRank))
      .filter(col("prnk") <= Ivf.GivenProbe)
      .select(col("query_id"), col("eq"), col("cid").as("list_id"),
        col("ce"))
    val lut = probes
      .withColumn("qres", expr(
        "zip_with(eq, ce, (x, c) -> cast(x as double) - cast(c as double))"))
      .select("query_id", "list_id", "qres")
      .crossJoin(broadcast(cb))
      .select(col("query_id") :: col("list_id").as("l_list") :: col("cid") ::
        (0 until NumSub).map(m =>
          subDistSqD("qres", "ce", m).as(s"d$m")).toList: _*)
      .selectExpr("query_id", "l_list", "cid",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, d$m").mkString(", ")}) as (m, dsq)")
    val probedIds = probes.select("list_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cand = loadIvfPqCodes(spark, dir)
      .filter(candPred && col("list_id").isin(probedIds: _*))
      .selectExpr("vec_id AS neighbor_id", "list_id",
        s"stack($NumSub, ${(0 until NumSub)
          .map(m => s"$m, code_$m").mkString(", ")}) as (c_m, code)")
    cand.join(broadcast(lut),
        cand("list_id") === lut("l_list") && cand("c_m") === lut("m") &&
          cand("code") === lut("cid"))
      .groupBy("query_id", "neighbor_id", "list_id")
      .agg(sum(col("dsq").cast("decimal(24,12)")).cast("double")
        .as("adist"))
      .withColumn("sim", -col("adist"))
  }

  /** G26 — IVFPQ top-k served from the SAVED composed index: queries
    * arrive raw (the serve-time contract), every stored byte the ADC
    * stage touches is compressed, and unprobed lists are partition-
    * pruned out of the scan. Bit-identical to [[knnIvfPq]] on the
    * same corpus — the gate runs it against knn_ivfpq's oracle
    * VERBATIM (the G15/G16 persisted-lifecycle discipline).
    */
  def servedIvfPqKnn(spark: SparkSession, dir: String,
      queries: DataFrame, candPred: Column): DataFrame =
    graft.plans.AggExpressions
      .topKPerKey(servedIvfPqScores(spark, dir, queries, candPred),
        "query_id", "sim", "neighbor_id", Seq("adist", "list_id"), K)
      .select("query_id", "rank", "neighbor_id", "adist", "list_id")
      .orderBy("query_id", "rank")

  /** G27 — the refine stage over the SAVED index ([[knnIvfPqRerank]]
    * served): the ADC shortlist proposes top-[[RerankR]], then ONLY
    * those queries×R candidates fetch raw vectors from the `refine/`
    * sidecar — partition-pruned to the shortlist's own lists — and
    * re-rank by exact quantized squared-L2. Gated by
    * knn_ivfpq_rerank's oracle verbatim.
    */
  def servedIvfPqRerank(spark: SparkSession, dir: String,
      queries: DataFrame, candPred: Column): DataFrame = {
    val shortlist = graft.plans.AggExpressions
      .topKPerKey(servedIvfPqScores(spark, dir, queries, candPred),
        "query_id", "sim", "neighbor_id", Seq("adist", "list_id"),
        RerankR)
      .select("query_id", "neighbor_id", "adist", "list_id")
      .localCheckpoint(true) // read twice: list ids + the join below
    val shortIds = shortlist.select("list_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val withQ = shortlist.select("query_id", "neighbor_id", "adist")
      .join(broadcast(queries), "query_id")
    val scored = loadIvfPqRefine(spark, dir)
      .filter(candPred && col("list_id").isin(shortIds: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("en"))
      .join(broadcast(withQ), "neighbor_id")
      .withColumn("dist", fullDistSq("eq", "en"))
      .withColumn("sim", -col("dist"))
    graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id",
        Seq("dist", "adist"), K)
      .select("query_id", "rank", "neighbor_id", "dist", "adist")
      .orderBy("query_id", "rank")
  }

  /** G13 — `pq_recall`: recall@k of the ADC search ([[knn]]) against
    * exact squared-L2 ground truth — the G6 measurement loop applied
    * to the PQ index (the number a serving team actually watches when
    * they trade bytes for recall). Both inputs are top-k outputs
    * (queries × k rows at any corpus size) so the eval join is free
    * next to the searches; queries the ADC index misses entirely
    * still surface with recall 0 via the left join.
    */
  def recall(emb: DataFrame): DataFrame = {
    val e = graft.Par.spread(emb.select("vec_id", "embedding"))
    val q = e.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = e.filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("dsq", fullDistSq("eq", "ec"))
      .withColumn("sim", -col("dsq"))
    val exact = graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id", Nil, K)
      .select("query_id", "neighbor_id")
    val adc = knn(emb).select("query_id", "neighbor_id")
    val hits = adc.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    q.select("query_id").join(hits, Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall", col("hits").cast("double") / K)
      .orderBy("query_id")
  }

  def encodeQ(spark: SparkSession, dir: String): DataFrame =
    encode(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def knnQ(spark: SparkSession, dir: String): DataFrame =
    knn(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def knnIvfPqQ(spark: SparkSession, dir: String): DataFrame =
    knnIvfPq(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def recallQ(spark: SparkSession, dir: String): DataFrame =
    recall(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def knnRerankQ(spark: SparkSession, dir: String): DataFrame =
    knnRerank(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  def knnIvfPqRerankQ(spark: SparkSession, dir: String): DataFrame =
    knnIvfPqRerank(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** `ivfpq_recall` — the G13/G6 measurement loop applied to the
    * COMPOSED index: recall@[[K]] of the given-quantizer IVFPQ search
    * against exact squared-L2 ground truth over the full corpus (the
    * number a serving team trades probes/bytes/latency against).
    * Fully hash-gated: both stages are the already-gated relational
    * chains. Misses from unprobed lists are exactly what this
    * measures; queries the index misses entirely surface with
    * recall 0 via the left join.
    */
  def ivfPqRecall(emb: DataFrame): DataFrame = {
    val e = graft.Par.spread(emb.select("vec_id", "embedding"))
    val q = e.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = e.filter(col("vec_id") >= QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("dsq", fullDistSq("eq", "ec"))
      .withColumn("sim", -col("dsq"))
    val exact = graft.plans.AggExpressions
      .topKPerKey(scored, "query_id", "sim", "neighbor_id", Nil, K)
      .select("query_id", "neighbor_id")
    val adc = knnIvfPq(emb).select("query_id", "neighbor_id")
    val hits = adc.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    q.select("query_id").join(hits, Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall", col("hits").cast("double") / K)
      .orderBy("query_id")
  }

  def ivfPqRecallQ(spark: SparkSession, dir: String): DataFrame =
    ivfPqRecall(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  override def queries: Map[String, Q] = Map(
    "pq_encode" -> (encodeQ _),
    "knn_pq" -> (knnQ _),
    "knn_pq_rerank" -> (knnRerankQ _),
    "knn_ivfpq_given" -> (knnIvfPqQ _),
    "knn_ivfpq_rerank" -> (knnIvfPqRerankQ _),
    "pq_recall" -> (recallQ _),
    "ivfpq_recall" -> (ivfPqRecallQ _))

  /** Shared encode CTE chain: per-dimension rows with the subspace
    * index, quantized subspace distances vector × codeword, argmin
    * codes — the relational mirror of [[codes]].
    */
  private val encodeCtes =
    s"""WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
      |         CAST((CAST(i AS INT) - 1) // $SubDim AS INT) AS m,
      |         CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) u(i)),
      |dists AS (SELECT a.vec_id, a.m, b.vec_id AS cid,
      |         CAST(CAST(sum(CAST(CAST((a.v - b.v) * (a.v - b.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dsq
      |       FROM comp a JOIN comp b
      |         ON a.i = b.i AND b.vec_id < $CodebookIds
      |       GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, cid AS code
      |       FROM (SELECT vec_id, m, cid,
      |               row_number() OVER (PARTITION BY vec_id, m
      |                 ORDER BY dsq ASC, cid ASC) AS rn
      |             FROM dists)
      |       WHERE rn = 1)""".stripMargin

  /** [[encodeCtes]] extended with the ADC ranking (LUTs → candidate
    * scores → per-query rank) — shared by the G11 oracle and the G24
    * rerank oracle's stage 1.
    */
  private val adcCtes = encodeCtes + s""",
    |luts AS (SELECT vec_id AS query_id, m, cid, dsq FROM dists
    |       WHERE vec_id < $QueryIds),
    |cand AS (SELECT vec_id AS neighbor_id, m, code FROM codes
    |       WHERE vec_id >= $QueryIds),
    |adist AS (SELECT l.query_id, c.neighbor_id,
    |         CAST(CAST(sum(CAST(CAST(l.dsq AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS adist
    |       FROM cand c JOIN luts l ON l.m = c.m AND l.cid = c.code
    |       GROUP BY 1, 2),
    |ranked AS (SELECT query_id, neighbor_id, adist,
    |         row_number() OVER (PARTITION BY query_id
    |           ORDER BY adist ASC, neighbor_id ASC) AS rank
    |       FROM adist)""".stripMargin

  /** The full IVFPQ CTE chain through the per-query ADC ranking —
    * shared by the G12 oracle and the G25 rerank oracle.
    */
  private def ivfPqCtes(
      candWhere: String = s"vec_id >= $QueryIds"): String =
    s"""WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
      |         CAST((CAST(i AS INT) - 1) // $SubDim AS INT) AS m,
      |         CAST(CAST(embedding[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) u(i)),
      |norms AS (SELECT vec_id,
      |         CAST(CAST(sum(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS nsq
      |       FROM comp GROUP BY vec_id),
      |cdots AS (SELECT a.vec_id, b.vec_id AS cid,
      |         CAST(CAST(sum(CAST(CAST(a.v * b.v AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dot
      |       FROM comp a JOIN comp b
      |         ON a.i = b.i AND b.vec_id < $CodebookIds
      |       GROUP BY 1, 2),
      |assign AS (SELECT cdots.vec_id, cid AS list_id,
      |         row_number() OVER (PARTITION BY cdots.vec_id
      |           ORDER BY dot / (sqrt(nv.nsq) * sqrt(nc.nsq)) DESC,
      |                    cid ASC) AS rn
      |       FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
      |                  JOIN norms nc ON cdots.cid = nc.vec_id),
      |lists AS (SELECT vec_id, list_id FROM assign WHERE rn = 1),
      |rcomp AS (SELECT a.vec_id, a.i, a.m, l.list_id, a.v - c.v AS rv
      |       FROM comp a JOIN lists l ON a.vec_id = l.vec_id
      |         JOIN comp c ON c.vec_id = l.list_id AND c.i = a.i),
      |rdists AS (SELECT r.vec_id, r.list_id, r.m, cb.vec_id AS cid,
      |         CAST(CAST(sum(CAST(CAST((r.rv - cb.v) * (r.rv - cb.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dsq
      |       FROM rcomp r JOIN comp cb
      |         ON cb.i = r.i AND cb.vec_id < $CodebookIds
      |       GROUP BY 1, 2, 3, 4),
      |rcodes AS (SELECT vec_id, list_id, m, cid AS code
      |       FROM (SELECT vec_id, list_id, m, cid,
      |               row_number() OVER (PARTITION BY vec_id, m
      |                 ORDER BY dsq ASC, cid ASC) AS rn
      |             FROM rdists)
      |       WHERE rn = 1),
      |probes AS (SELECT vec_id AS query_id, list_id FROM assign
      |       WHERE vec_id < $QueryIds AND rn <= ${Ivf.GivenProbe}),
      |qres AS (SELECT p.query_id, p.list_id, a.i, a.m, a.v - c.v AS rv
      |       FROM probes p JOIN comp a ON a.vec_id = p.query_id
      |         JOIN comp c ON c.vec_id = p.list_id AND c.i = a.i),
      |luts AS (SELECT q.query_id, q.list_id, q.m, cb.vec_id AS cid,
      |         CAST(CAST(sum(CAST(CAST((q.rv - cb.v) * (q.rv - cb.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dsq
      |       FROM qres q JOIN comp cb
      |         ON cb.i = q.i AND cb.vec_id < $CodebookIds
      |       GROUP BY 1, 2, 3, 4),
      |cand AS (SELECT vec_id AS neighbor_id, list_id, m, code FROM rcodes
      |       WHERE $candWhere),
      |adist AS (SELECT l.query_id, c.neighbor_id, c.list_id,
      |         CAST(CAST(sum(CAST(CAST(l.dsq AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS adist
      |       FROM cand c JOIN luts l
      |         ON l.list_id = c.list_id AND l.m = c.m AND l.cid = c.code
      |       GROUP BY 1, 2, 3),
      |ranked AS (SELECT query_id, neighbor_id, adist, list_id,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY adist ASC, neighbor_id ASC) AS rank
      |       FROM adist)""".stripMargin

  /** The G12 search oracle with a parameterized candidate filter —
    * the knn_ivf_deleted discipline applied to the composed index
    * (serving after a delete must equal the fresh search over the
    * surviving candidates).
    */
  private[sim] def ivfPqKnnSql(candWhere: String): String =
    ivfPqCtes(candWhere) + s"""
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adist, list_id
      |FROM ranked WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin

  override def oracles: Map[String, String] = Map(
    "pq_encode" -> (encodeCtes + s"""
      |SELECT vec_id,
      |${(0 until NumSub).map(m =>
          s"  max(CASE WHEN m = $m THEN code END) AS code_$m")
          .mkString(",\n")}
      |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    "knn_pq" -> (adcCtes + s"""
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adist
      |FROM ranked WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin),
    // two-stage: ADC shortlist (rank <= R) -> exact quantized L2 over
    // ONLY those rows -> re-rank; the relational mirror of [[knnRerank]]
    "knn_pq_rerank" -> (adcCtes + s""",
      |short AS (SELECT query_id, neighbor_id, adist FROM ranked
      |       WHERE rank <= $RerankR),
      |ex AS (SELECT s.query_id, s.neighbor_id, s.adist,
      |         CAST(CAST(sum(CAST(CAST((a.v - b.v) * (a.v - b.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dist
      |       FROM short s
      |       JOIN comp a ON a.vec_id = s.query_id
      |       JOIN comp b ON b.vec_id = s.neighbor_id AND b.i = a.i
      |       GROUP BY 1, 2, 3),
      |rr AS (SELECT query_id, neighbor_id, dist, adist,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY dist ASC, neighbor_id ASC) AS rank
      |       FROM ex)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  dist, adist
      |FROM rr WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin),
    // IVFPQ given-quantizer twin: the G2c assignment/probe chain
    // (cosine routing) composed with residual-PQ codes and per-(query,
    // list) ADC tables — the relational mirror of [[knnIvfPq]],
    // replayed step for step. (The TRAINED production path is
    // `knn_ivfpq` in [[PqTrained]] — rows-only by design, like
    // knn_ivf.)
    "knn_ivfpq_given" -> (ivfPqCtes() + s"""
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adist, list_id
      |FROM ranked WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin),
    // recall@k of the composed given-quantizer index vs exact
    // squared-L2 ground truth — the pq_recall tail over ivfPqCtes's
    // probe-bounded ranking
    "ivfpq_recall" -> (ivfPqCtes() + s""",
      |adck AS (SELECT query_id, neighbor_id FROM ranked
      |       WHERE rank <= $K),
      |edists AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         CAST(CAST(sum(CAST(CAST((a.v - b.v) * (a.v - b.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dsq
      |       FROM comp a JOIN comp b
      |         ON a.i = b.i AND a.vec_id < $QueryIds
      |           AND b.vec_id >= $QueryIds
      |       GROUP BY 1, 2),
      |exk AS (SELECT query_id, neighbor_id
      |       FROM (SELECT query_id, neighbor_id,
      |               row_number() OVER (PARTITION BY query_id
      |                 ORDER BY dsq ASC, neighbor_id ASC) AS rank
      |             FROM edists)
      |       WHERE rank <= $K),
      |hits AS (SELECT a.query_id, count(*) AS hits
      |       FROM adck a JOIN exk e
      |         ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      |       GROUP BY 1)
      |SELECT q.query_id, COALESCE(h.hits, 0) AS hits,
      |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / $K AS recall
      |FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
      |      WHERE vec_id < $QueryIds) q
      |LEFT JOIN hits h ON q.query_id = h.query_id
      |ORDER BY q.query_id""".stripMargin),
    // G25: residual-ADC shortlist (rank <= R) -> exact full-vector
    // quantized L2 -> re-rank; the relational mirror of
    // [[knnIvfPqRerank]]
    "knn_ivfpq_rerank" -> (ivfPqCtes() + s""",
      |short AS (SELECT query_id, neighbor_id, adist FROM ranked
      |       WHERE rank <= $RerankR),
      |ex AS (SELECT s.query_id, s.neighbor_id, s.adist,
      |         CAST(CAST(sum(CAST(CAST((a.v - b.v) * (a.v - b.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dist
      |       FROM short s
      |       JOIN comp a ON a.vec_id = s.query_id
      |       JOIN comp b ON b.vec_id = s.neighbor_id AND b.i = a.i
      |       GROUP BY 1, 2, 3),
      |rr AS (SELECT query_id, neighbor_id, dist, adist,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY dist ASC, neighbor_id ASC) AS rank
      |       FROM ex)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  dist, adist
      |FROM rr WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin),
    // recall@k: the knn_pq ADC chain next to exact squared-L2 ground
    // truth from the same component rows; hits via an IN-join.
    "pq_recall" -> (encodeCtes + s""",
      |luts AS (SELECT vec_id AS query_id, m, cid, dsq FROM dists
      |       WHERE vec_id < $QueryIds),
      |cand AS (SELECT vec_id AS neighbor_id, m, code FROM codes
      |       WHERE vec_id >= $QueryIds),
      |adist AS (SELECT l.query_id, c.neighbor_id,
      |         CAST(CAST(sum(CAST(CAST(l.dsq AS VARCHAR) AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS adist
      |       FROM cand c JOIN luts l ON l.m = c.m AND l.cid = c.code
      |       GROUP BY 1, 2),
      |adck AS (SELECT query_id, neighbor_id
      |       FROM (SELECT query_id, neighbor_id,
      |               row_number() OVER (PARTITION BY query_id
      |                 ORDER BY adist ASC, neighbor_id ASC) AS rank
      |             FROM adist)
      |       WHERE rank <= $K),
      |edists AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         CAST(CAST(sum(CAST(CAST((a.v - b.v) * (a.v - b.v) AS VARCHAR)
      |              AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dsq
      |       FROM comp a JOIN comp b
      |         ON a.i = b.i AND a.vec_id < $QueryIds
      |           AND b.vec_id >= $QueryIds
      |       GROUP BY 1, 2),
      |exk AS (SELECT query_id, neighbor_id
      |       FROM (SELECT query_id, neighbor_id,
      |               row_number() OVER (PARTITION BY query_id
      |                 ORDER BY dsq ASC, neighbor_id ASC) AS rank
      |             FROM edists)
      |       WHERE rank <= $K),
      |hits AS (SELECT a.query_id, count(*) AS hits
      |       FROM adck a JOIN exk e
      |         ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      |       GROUP BY 1)
      |SELECT q.query_id, COALESCE(h.hits, 0) AS hits,
      |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / $K AS recall
      |FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
      |      WHERE vec_id < $QueryIds) q
      |LEFT JOIN hits h ON q.query_id = h.query_id
      |ORDER BY q.query_id""".stripMargin))
}
