package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.dedup.{DedupQueries, NearDup}
import graft.sources.Tables
import graft.text.Analysis

/** SURVEY §2 L — corpus-preparation composition ops: what a training
  * pipeline actually runs end-to-end over its document store.
  *
  * L1 `corpus_sample`: deterministic hash bucketing into
  * train/val/test — the only split that works at 100 TB (no global
  * shuffle or count; any worker can re-derive any doc's split from
  * its id; adding data never reshuffles old assignments). Same
  * md5-prefix integer both engines compute identically.
  *
  * L2 `corpus_clean`: the keep-list = quality gate ∧ exact-dup keeper
  * ∧ near-dup cluster representative — composes H2 quality metrics,
  * F1 exact dedup and F2/F6 MinHash clustering into one verdict per
  * document. Every stage is the already-scale-shaped operator; the
  * composition adds two hash joins on doc_id.
  */
object Corpus extends QueryModule {

  /** Quality gate thresholds (tokens ≥ 20, stopword ratio ≤ 0.25). */
  val MinTokens = 20
  val MaxStopwordRatio = 0.25

  /** L1 — deterministic train/val/test hash split (800/100/100). */
  def corpusSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select("doc_id", "lang")
      .withColumn("bucket", expr(
        """cast(conv(substring(md5(concat('smp|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  /** L7 — corpus composition report: per (split, lang) doc counts,
    * whitespace-token and byte volumes, and each cell's share of the
    * corpus — the reporting rollup a data team watches while L1-L6
    * run. One map-side-combinable aggregate over a projection; the
    * corpus total rides along as a broadcast 1-row aggregate (no
    * separate count action), same shape as the tf-idf corpus stats.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "lang", "text")
      .withColumn("bucket", expr(
        """cast(conv(substring(md5(concat('smp|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "val")
          .otherwise("test"))
    d.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("n_tokens"),
        sum(octet_length(col("text")).cast("bigint")).as("n_bytes"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n_total"))))
      .withColumn("doc_share",
        col("n_docs").cast("double") / col("n_total"))
      .select("split", "lang", "n_docs", "n_tokens", "n_bytes", "doc_share")
      .orderBy("split", "lang")
  }

  /** L2 — per-document keep-list with the three gate verdicts. */
  def corpusClean(spark: SparkSession, dir: String): DataFrame =
    verdictsOf(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The L2 verdict body over any documents frame — also the label
    * source for the L10 distilled filter ([[QualityModel]]).
    */
  def verdictsOf(docs: DataFrame): DataFrame = {
    val quality = Analysis
      .quality(graft.Par.spread(docs.select("doc_id", "text")), "text")
      .select(col("doc_id"),
        (col("n_tokens") >= MinTokens &&
          col("stopword_ratio") <= MaxStopwordRatio).as("keep_quality"))
    val keepExact = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("keeper",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .select(col("doc_id"), (col("doc_id") === col("keeper")).as("keep_exact"))
    val neardup = NearDup.index(docs).labels
      .select(col("doc_id"), (col("doc_id") === col("cluster")).as("nd_keep"))
    quality
      .join(keepExact, "doc_id")
      .join(neardup, Seq("doc_id"), "left")
      .withColumn("keep_neardup", coalesce(col("nd_keep"), lit(true)))
      .withColumn("keep",
        col("keep_quality") && col("keep_exact") && col("keep_neardup"))
      .select("doc_id", "keep_quality", "keep_exact", "keep_neardup", "keep")
  }

  /** L9 — per-stage attrition funnel of the cleaning pipeline: how
    * many documents each gate removes (ingest → quality → exact dup
    * → near dup) — the observability report a production corpus run
    * publishes next to its keep-list. ONE aggregate over the L2
    * verdict frame reshaped by a constant-size `stack`; output is
    * O(stages) at any corpus size.
    */
  def corpusLossReport(spark: SparkSession, dir: String): DataFrame =
    corpusClean(spark, dir)
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep_quality"), 1)).as("n_q"),
        count(when(col("keep_quality") && col("keep_exact"), 1)).as("n_qe"),
        count(when(col("keep"), 1)).as("n_kept"))
      .selectExpr("""stack(4,
        0, 'ingest', n_total, cast(0 as bigint),
        1, 'quality_gate', n_q, n_total - n_q,
        2, 'exact_dedup', n_qe, n_q - n_qe,
        3, 'near_dedup', n_kept, n_qe - n_kept)
        as (stage_id, stage, n_surviving, n_dropped)""")
      .orderBy("stage_id")

  /** L3 — token budget per packed training sequence. (512 so the
    * sf0.01 correctness gate exercises real sequence cuts; a training
    * run sets its context length here.)
    */
  val PackBudget = 512

  /** L3 — pack shards: sequences are packed independently within each
    * hash shard, so the cumulative-sum window parallelizes across
    * shards instead of being one global ordered scan (the difference
    * between a many-task and a 1-task plan at 100 TB; a real run
    * sizes this to the cluster).
    */
  val PackShards = 8

  /** L3 — deterministic sequence packing: documents are concatenated
    * in doc_id order within their hash shard and cut into
    * [[PackBudget]]-token training sequences; each doc is assigned
    * the sequence containing its first token (GPT-style packing with
    * document spanning). One window per shard — no global sort, no
    * driver loop.
    */
  def corpusPack(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir).select("doc_id", "text")
      .withColumn("n_tokens", size(split(lower(col("text")), " ")))
      .withColumn("bucket", expr(
        s"""cast(conv(substring(md5(concat('pck|', cast(doc_id as string))),
           |  1, 8), 16, 10) as bigint) % $PackShards""".stripMargin))
      .withColumn("tok_start",
        (sum("n_tokens").over(w) - col("n_tokens")).cast("long"))
      .withColumn("seq_id", expr(s"tok_start div $PackBudget"))
      .select("doc_id", "bucket", "n_tokens", "tok_start", "seq_id")
      .orderBy("doc_id")
  }

  /** L4 — stratified sampling: rebalance the corpus by downsampling
    * the dominant language to 25% with the same deterministic
    * md5-bucket coin as [[corpusSample]] — any worker re-derives any
    * doc's verdict from its id alone; no global count, no shuffle
    * beyond the scan.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select("doc_id", "lang")
      .withColumn("bucket", expr(
        """cast(conv(substring(md5(concat('str|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))
      .withColumn("rate", when(col("lang") === "en", 250).otherwise(1000))
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")

  /** L5 — word n-gram size for contamination detection: long enough
    * that a shared gram means real textual overlap (the GPT-2/GPT-3
    * decontamination range), short enough that these short synthetic
    * docs can collide at all.
    */
  val DecontamN = 5

  /** L5 — benchmark decontamination: training docs that share at
    * least one word [[DecontamN]]-gram with the held-out test split
    * (the [[corpusSample]] coin decides membership, so any worker
    * re-derives the split). The join is train-gram rows against the
    * DISTINCT eval gram set — linear in corpus gram volume, never a
    * doc × doc pair join, so a stop-phrase gram cannot create a
    * quadratic reducer at any scale.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val n = DecontamN
    // g feeds three branches (eval set, train join side, train
    // totals) and is deliberately NOT cached: it is a map-only
    // projection of the scan, and at corpus scale re-running a
    // projection beats materializing TBs of gram rows
    val g = graft.Par.spread(
        Tables.documents(spark, dir).select("doc_id", "text"))
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      // guard before sequence(): sequence(1, 0) DESCENDS in Spark
      .select(col("doc_id"), explode(expr(
        s"""IF(size(ws) >= $n,
           |   array_distinct(transform(sequence(1, size(ws) - ${n - 1}),
           |     i -> concat_ws(' ', slice(ws, i, $n)))),
           |   array())""".stripMargin)).as("g"))
      .withColumn("bucket", expr(
        """cast(conv(substring(md5(concat('smp|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000""".stripMargin))
    val evalGrams = g.filter(col("bucket") >= 900).select("g").distinct()
    val train = g.filter(col("bucket") < 800)
    val totals = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    train.join(evalGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .join(totals, "doc_id")
      .withColumn("contam_ratio",
        col("n_shared").cast("double") / col("n_grams"))
      .select("doc_id", "n_shared", "n_grams", "contam_ratio")
      .orderBy("doc_id")
  }

  /** L8 — shard count for the domain-mixture windows: the cumsum that
    * enforces a token budget runs per (source, shard), so budget
    * enforcement parallelizes across sources × shards instead of one
    * ordered scan per source (a real run sizes this to the cluster).
    */
  val MixShards = 4

  /** L8 — sources treated as the over-represented crawl slice. */
  val MixDownweighted: Seq[String] = Seq("src0", "src1", "src2")

  /** L8 — token-budget domain mixture: sample each source down to a
    * target token share (the crawl-heavy sources to 20%, the rest to
    * 80%) — how a training run actually weights its data sources: by
    * TOKENS, not documents. Docs are taken in deterministic md5-coin
    * order within (source, shard) until the shard's budget
    * (source_tokens × weight / shards) is hit, so the cut is exact
    * per shard, any re-run keeps the identical docs, and the plan is
    * one map-side-combinable totals aggregate (broadcast back) + one
    * window per (source, shard) — no global sort, no driver loop.
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "source", "text")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
      .withColumn("k", md5(concat(lit("mix|"), col("doc_id").cast("string"))))
      .withColumn("shard", expr(
        s"cast(conv(substring(k, 1, 8), 16, 10) as bigint) % $MixShards"))
      .drop("text")
    val totals = d.groupBy("source")
      .agg(sum("n_tokens").as("tot_tokens"))
    val w = Window.partitionBy("source", "shard").orderBy("k", "doc_id")
    d.join(broadcast(totals), "source")
      .withColumn("weight",
        when(col("source").isin(MixDownweighted: _*), 0.2d).otherwise(0.8d))
      .withColumn("budget",
        floor(col("tot_tokens").cast("double") * col("weight")
          / lit(MixShards.toDouble)).cast("bigint"))
      .withColumn("cum_before",
        (sum("n_tokens").over(w) - col("n_tokens")).cast("bigint"))
      .withColumn("keep", col("cum_before") < col("budget"))
      .select("doc_id", "source", "shard", "n_tokens", "budget",
        "cum_before", "keep")
      .orderBy("doc_id")
  }

  /** L6 — shard count for the deterministic training shuffle. */
  val ShuffleShards = 16

  /** L6 — deterministic global shuffle for training-order
    * randomization: shard by one md5 coin, order within the shard by
    * the full md5 key — a per-shard window, never a global sort, and
    * any re-run derives the identical order (the property a resumable
    * training job needs from its data order).
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select("doc_id")
      .withColumn("k", md5(concat(lit("shu|"), col("doc_id").cast("string"))))
      .withColumn("shard", expr(
        s"""cast(conv(substring(k, 1, 8), 16, 10) as bigint)
           |  % $ShuffleShards""".stripMargin))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("k", "doc_id")))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")

  /** L11 — DSIR hashed-unigram feature buckets. */
  val DsirBuckets = 256

  /** L11 — the target-domain sources the selection steers toward. */
  val DsirTarget: Seq[String] = Seq("src0", "src1")

  /** L11 — resample size. */
  val DsirK = 100

  /** L11 — DSIR: Data Selection via Importance Resampling (Xie et al.
    * 2023 shape) — pick the general-corpus documents that look most
    * like a trusted target domain, the principled alternative to
    * hand-written quality rules. Per-doc importance log-weight =
    * Σ_tokens ln p̂_target(bucket) − ln p̂_general(bucket) over
    * [[DsirBuckets]] hashed-unigram buckets (add-one smoothed), and
    * the resample-without-replacement draw ∝ exp(logw) is taken by
    * GUMBEL-TOP-K: key = logw + Gumbel(md5(doc_id)) — so "sampling"
    * is an orderBy-limit (TakeOrdered, never a full sort) and any
    * re-run draws the identical sample.
    *
    * Scale shape: the two bucket distributions are one combinable
    * aggregate each over exploded token rows (256-row outputs,
    * broadcast back); per-doc weights are a co-partitioned bucket
    * join + one combinable decimal sum; corpus totals ride as a
    * broadcast 1-row aggregate. FP parity: every ln takes an exact
    * integer-ratio (or exact-dyadic) double and is quantized to
    * decimal(18,9) (the H7 discipline); sums/additions stay decimal
    * until the output cast, so the gate is bit-exact. The inner
    * Gumbel ln is clamped one quantum below zero so a u ≈ 1 draw
    * can't reach ln(0) (−∞) after quantization.
    */
  def dsir(docs: DataFrame, target: Seq[String], k: Int): DataFrame = {
    // ONE explode + per-token md5 pass, aggregated immediately to
    // per-(doc, bucket) counts and checkpointed: the four consumers
    // below (target dist, general dist, totals, per-doc weights)
    // previously each re-derived the token rows — 4× the hash work —
    // and now read a ≤ docs×DsirBuckets-row frame. Values are
    // unchanged: Σ_tokens lr = Σ_buckets n·lr exactly, because lr is
    // per-bucket and the decimal arithmetic is exact.
    val docBuckets = docs.select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .withColumn("b", expr(
        s"""cast(conv(substring(md5(concat('dsir|', w)), 1, 8), 16, 10)
           |  as bigint) % $DsirBuckets""".stripMargin))
      .groupBy("doc_id", "source", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tgt = docBuckets.filter(col("source").isin(target: _*))
      .groupBy("b").agg(sum("n").as("ct"))
    val gen = docBuckets.groupBy("b").agg(sum("n").as("cg"))
    val tots = broadcast(docBuckets.agg(
      sum(when(col("source").isin(target: _*), col("n")).otherwise(0L)).as("nt"),
      sum("n").as("ng")))
    val weights = docBuckets
      .join(broadcast(tgt), Seq("b"), "left")
      .join(broadcast(gen), Seq("b"))
      .crossJoin(tots)
      .withColumn("lr", expr(
        s"""cast(cast(ln(cast(coalesce(ct, 0L) + 1 as double)
           |             / cast(nt + $DsirBuckets as double))
           |       as decimal(18,9))
           |   - cast(ln(cast(cg + 1 as double)
           |             / cast(ng + $DsirBuckets as double))
           |       as decimal(18,9)) as decimal(19,9))""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"),
        sum((col("lr") * col("n").cast("decimal(9,0)"))
          .cast("decimal(28,9)")).as("logw_dec"))
    val keyed = weights
      .withColumn("u", (expr(
        """cast(conv(substring(md5(concat('dsg|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint)""".stripMargin).cast("double")
        + lit(0.5d)) / lit(4294967296.0d))
      .withColumn("lnu", least(expr("cast(ln(u) as decimal(18,9))"),
        expr("cast(-0.000000001 as decimal(18,9))")))
      .withColumn("g", expr(
        "cast(-ln(cast(-lnu as double)) as decimal(18,9))"))
      // both operands down to decimal(28,9) first: a (38,9)+(38,9)
      // addition needs precision 39, which Spark caps at 38 by
      // REDUCING SCALE to 8 — silently dropping the 9th decimal the
      // gate compares; (28,9)+(28,9) → (29,9) stays exact
      .withColumn("score_dec",
        col("logw_dec").cast("decimal(28,9)")
          + col("g").cast("decimal(28,9)"))
    keyed.orderBy(desc("score_dec"), asc("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score_dec"), asc("doc_id"))))
      .select(col("doc_id"), col("n_tokens"),
        col("logw_dec").cast("double").as("logw"),
        col("g").cast("double").as("gumbel"),
        col("score_dec").cast("double").as("score"), col("rank"))
      .orderBy("rank")
  }

  def dsirSample(spark: SparkSession, dir: String): DataFrame =
    dsir(Tables.documents(spark, dir).select("doc_id", "source", "text"),
      DsirTarget, DsirK)

  /** L10 — the distilled quality filter ([[QualityModel]]), scored
    * through the rendered-margin path. Running it registers its
    * model-derived oracle (the fitted weights are only known
    * post-fit; Verify dumps oracle_sql AFTER running every query, so
    * the rendered text lands in the dump like a static entry — the
    * E5b given-model discipline).
    */
  def qualityClassifyQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val df = QualityModel.classifyGiven(docs)
    QualityModel.modelFor(docs).foreach(m =>
      dynOracles.put("quality_classify_given_model",
        qualityClassifySql(QualityModel.marginSql(m))))
    df.orderBy("doc_id")
  }

  /** L12 sample size per lang group. */
  val QpfK = 64

  /** L12 — sample-quantile corpus TRIM: keep documents inside
    * [p10, p99] of their LANGUAGE's token-count distribution, with
    * both thresholds taken from the K39 bottom-K-by-hash sample
    * instead of an exact percentile. The exact form needs a global
    * sort (or percentile_disc shuffle) PER GROUP over the full
    * corpus; the sample form computes thresholds from O(K) state per
    * lang via the same bounded heap as KMV — one map-side-combinable
    * aggregate — then applies them in the same scan-shaped pass as
    * every other per-doc verdict, with the O(langs)-row threshold
    * table broadcast. Trimming BOTH tails is the curation shape
    * (too-short docs carry no signal, extreme-length outliers are
    * concatenation junk); per-lang thresholds because length
    * distributions differ by language. Index arithmetic is the K39
    * integer ceil-division; below-K langs get textbook-exact
    * percentiles (the sample IS the group).
    */
  def qualityPercentileFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Par.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val th = d
      .withColumn("hv",
        expr(graft.relational.Sketches.h48("qpf", "doc_id")))
      .groupBy("lang")
      .agg(graft.plans.AggExpressions.collectTopK(
        struct(col("hv"), col("n_tokens")), QpfK, largestFirst = false)
        .as("_s"))
      .withColumn("vals", sort_array(expr("transform(_s, x -> x.n_tokens)")))
      .withColumn("ns", size(col("vals")))
      .select(col("lang"),
        element_at(col("vals"),
          expr("cast((ns + 9) div 10 as int)")).as("lo"),
        element_at(col("vals"),
          expr("cast((99 * ns + 99) div 100 as int)")).as("hi"))
    d.join(broadcast(th), "lang")
      .withColumn("kept",
        col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .select("doc_id", "lang", "n_tokens", "lo", "hi", "kept")
      .orderBy("doc_id")
  }

  /** L13 — mixture reweighting PLAN (the DoReMi-adjacent planning
    * half of L8's mixture execution): per language, observed token
    * share vs a uniform target, a downsample-only multiplier
    * `least(1, target/observed)` (upsampling = repeating data, a
    * decision a human makes), the token budget the multiplier keeps,
    * and the post-reweight expected shares — the table a pretraining
    * data lead reads before committing a mixture. Shapes: ONE
    * map-side-combined token aggregate over the corpus (the L7
    * tokenization, gate-proven identical cross-engine), then all
    * ratio algebra on the O(langs)-row frame with two broadcast 1-row
    * totals (the corpus_stats shape). Integer ppm shares; the
    * multiplier is one double division (divisor floored at 1 ppm so a
    * vanishingly small lang can't divide by zero at 100 TB) and
    * keep_tokens = floor(n·mult) — single IEEE ops, identical in
    * either engine.
    */
  def mixtureReweight(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir).filter(col("lang").isNotNull)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("bigint"))
        .as("n_tokens"))
    val t = g.agg(sum("n_tokens").cast("bigint").as("tok_total"),
      count(lit(1)).as("n_langs"))
    val j = g.crossJoin(broadcast(t))
      .withColumn("obs_ppm", expr("(n_tokens * 1000000) div tok_total"))
      .withColumn("target_ppm", expr("1000000 div n_langs"))
      .withColumn("mult", least(lit(1.0),
        col("target_ppm").cast("double") /
          greatest(col("obs_ppm"), lit(1L)).cast("double")))
      .withColumn("keep_tokens",
        expr("cast(floor(cast(n_tokens as double) * mult) as bigint)"))
    val t2 = j.agg(sum("keep_tokens").cast("bigint").as("keep_total"))
    j.crossJoin(broadcast(t2))
      .withColumn("exp_ppm", expr("(keep_tokens * 1000000) div keep_total"))
      .select("lang", "n_tokens", "obs_ppm", "target_ppm", "mult",
        "keep_tokens", "exp_ppm", "tok_total", "keep_total")
      .orderBy("lang")
  }

  /** L14 — EXECUTE the L13 mixture plan (round 15, the plan→action
    * discipline): downsample each language's documents toward the
    * uniform token target by a deterministic per-document coin. The
    * multiplier is INTEGER ppm — `least(1e6, target_ppm·1e6 div
    * max(obs_ppm, 1))`, the L13 ratio with no double ever deciding a
    * row — and a document keeps iff its md5 coin (the L1 'smp'
    * discipline with a 'mix' tag, mod 1e6) lands under it, so any
    * worker — or the oracle — re-derives any document's fate
    * bit-for-bit. Document-level sampling approximates the plan's
    * token-mass target in expectation (exact token packing would
    * need per-document knapsack state); the realized per-language
    * share is REPORTED next to the multiplier, so the approximation
    * is visible in the output, not hidden. Languages at or under
    * target keep everything (multiplier 1e6 — downsample-only, the
    * L13 contract). Per language: total/kept docs, multiplier, kept
    * tokens, realized share. Plan shape: one token aggregate +
    * broadcast O(langs) multipliers into the scan's filter + one
    * map-side-combined aggregate; a language dropped to zero keeps
    * its row via the left join from the plan frame.
    */
  def mixtureApply(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .withColumn("coin", expr(
        """cast(conv(substring(md5(concat('mix|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000000""".stripMargin))
    val g = d.groupBy("lang")
      .agg(sum("n_tok").as("n_tokens"), count(lit(1)).as("n_docs"))
    val t = g.agg(sum("n_tokens").cast("bigint").as("tok_total"),
      count(lit(1)).as("n_langs"))
    val m = g.crossJoin(broadcast(t))
      .withColumn("obs_ppm", expr("(n_tokens * 1000000) div tok_total"))
      .withColumn("target_ppm", expr("1000000 div n_langs"))
      .withColumn("mult_ppm", expr(
        "least(1000000, (target_ppm * 1000000) div greatest(obs_ppm, 1))"))
      .select("lang", "n_docs", "mult_ppm")
    val kept = d.join(broadcast(m.select("lang", "mult_ppm")), "lang")
      .filter(col("coin") < col("mult_ppm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum("n_tok").cast("bigint").as("tokens_kept"))
    val kt = kept.agg(coalesce(sum("tokens_kept"), lit(0L))
      .cast("bigint").as("kept_total"))
    m.join(kept, Seq("lang"), "left")
      .na.fill(0L, Seq("n_docs_kept", "tokens_kept"))
      .crossJoin(broadcast(kt))
      .withColumn("realized_ppm",
        expr("(tokens_kept * 1000000) div greatest(kept_total, 1)"))
      .select("lang", "n_docs", "n_docs_kept", "mult_ppm",
        "tokens_kept", "realized_ppm", "kept_total")
      .orderBy("lang")
  }

  override def queries: Map[String, Q] = Map(
    "quality_percentile_filter" -> (qualityPercentileFilter _),
    "mixture_reweight" -> (mixtureReweight _),
    "mixture_apply" -> (mixtureApply _),
    "corpus_sample" -> (corpusSample _),
    "corpus_clean" -> (corpusClean _),
    "corpus_loss_report" -> (corpusLossReport _),
    "corpus_pack" -> (corpusPack _),
    "stratified_sample" -> (stratifiedSample _),
    "decontaminate" -> (decontaminate _),
    "corpus_shuffle" -> (corpusShuffle _),
    "corpus_stats" -> (corpusStats _),
    "quality_classify_given_model" -> (qualityClassifyQ _),
    "dsir_sample" -> (dsirSample _),
    "domain_mix" -> (domainMix _))

  /** Model-derived oracle entries, registered when their query runs. */
  private val dynOracles =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The L10 oracle: recompute the 8 features with the exact SQL the
    * gated text_quality / repetition_ratio rows established (their
    * doubles are proven bit-identical to Spark's), then replay the
    * rendered margin verbatim. Empty documents are excluded on both
    * sides (their ratio features are NULL).
    */
  private def qualityClassifySql(marginSql: String): String =
    s"""WITH q AS (SELECT doc_id,
      |    CAST(length(t) AS INTEGER) AS n_chars_m,
      |    CAST(len(string_split(t, ' ')) AS INTEGER) AS n_tokens,
      |    CAST(len(list_filter(string_split(t, ' '),
      |      x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |      / nullif(len(string_split(t, ' ')), 0) AS stopword_ratio,
      |    CAST(length(t) - length(regexp_replace(t, '[.,!?;:'']', '', 'g'))
      |         AS DOUBLE) / nullif(length(t), 0) AS punct_ratio,
      |    CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
      |         AS DOUBLE) / nullif(length(t), 0) AS digit_ratio,
      |    CAST(length(t) - (len(string_split(t, ' ')) - 1) AS DOUBLE)
      |      / nullif(len(string_split(t, ' ')), 0) AS avg_word_len
      |  FROM (SELECT doc_id, lower(text) AS t FROM documents)
      |  WHERE length(t) > 0),
      |toks AS (SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |rep0 AS (SELECT doc_id, CAST(sum(c) AS INTEGER) AS n_tokens_r,
      |    CAST(count(*) AS INTEGER) AS n_distinct,
      |    CAST(max(c) AS INTEGER) AS top_count
      |  FROM toks GROUP BY doc_id),
      |rep AS (SELECT doc_id,
      |    CAST(n_tokens_r - n_distinct AS DOUBLE) / nullif(n_tokens_r, 0)
      |      AS repetition_ratio,
      |    CAST(top_count AS DOUBLE) / nullif(n_tokens_r, 0)
      |      AS top_token_ratio
      |  FROM rep0),
      |f AS (SELECT q.*, rep.repetition_ratio, rep.top_token_ratio
      |  FROM q JOIN rep USING (doc_id)),
      |m AS (SELECT doc_id, ($marginSql) AS margin FROM f)
      |SELECT doc_id, margin, margin > 0 AS pred_keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** The DuckDB mirror of the Spark-side gram generator: 1-based list
    * indexing, range(a, b) is [a, b).
    */
  private val gramSelSql: String =
    (0 until DecontamN).map(j => s"ws[i + $j]").mkString(" || ' ' || ")

  override def oracles: Map[String, String] = staticOracles ++ dynOracles

  private val staticOracles: Map[String, String] = Map(
    "mixture_apply" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 1000000 AS coin
        |  FROM documents WHERE lang IS NOT NULL),
        |g AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM g),
        |m AS (SELECT lang, n_docs,
        |    LEAST(1000000, (((1000000 // n_langs) * 1000000)
        |      // GREATEST((n_tokens * 1000000) // tok_total, 1)))
        |      AS mult_ppm
        |  FROM g CROSS JOIN t),
        |kept AS (SELECT d.lang,
        |    CAST(count(*) AS BIGINT) AS n_docs_kept,
        |    CAST(sum(d.n_tok) AS BIGINT) AS tokens_kept
        |  FROM d JOIN m ON d.lang = m.lang
        |  WHERE d.coin < m.mult_ppm GROUP BY 1),
        |kt AS (SELECT CAST(COALESCE(sum(tokens_kept), 0) AS BIGINT)
        |    AS kept_total FROM kept)
        |SELECT m.lang, m.n_docs,
        |  CAST(COALESCE(kept.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
        |  CAST(m.mult_ppm AS BIGINT) AS mult_ppm,
        |  CAST(COALESCE(kept.tokens_kept, 0) AS BIGINT) AS tokens_kept,
        |  CAST((COALESCE(kept.tokens_kept, 0) * 1000000)
        |    // GREATEST(kt.kept_total, 1) AS BIGINT) AS realized_ppm,
        |  kt.kept_total
        |FROM m LEFT JOIN kept ON m.lang = kept.lang CROSS JOIN kt
        |ORDER BY m.lang""".stripMargin,
    "mixture_reweight" ->
      """WITH g AS (SELECT lang,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM g),
        |j AS (SELECT lang, n_tokens, tok_total, n_langs,
        |    CAST((n_tokens * 1000000) // tok_total AS BIGINT) AS obs_ppm,
        |    CAST(1000000 // n_langs AS BIGINT) AS target_ppm
        |  FROM g CROSS JOIN t),
        |m AS (SELECT *,
        |    LEAST(1.0, CAST(target_ppm AS DOUBLE) /
        |      CAST(GREATEST(obs_ppm, 1) AS DOUBLE)) AS mult
        |  FROM j),
        |k AS (SELECT *,
        |    CAST(floor(CAST(n_tokens AS DOUBLE) * mult) AS BIGINT)
        |      AS keep_tokens
        |  FROM m),
        |t2 AS (SELECT CAST(sum(keep_tokens) AS BIGINT) AS keep_total
        |  FROM k)
        |SELECT lang, n_tokens, obs_ppm, target_ppm, mult, keep_tokens,
        |  CAST((keep_tokens * 1000000) // keep_total AS BIGINT)
        |    AS exp_ppm,
        |  tok_total, keep_total
        |FROM k CROSS JOIN t2
        |ORDER BY lang""".stripMargin,
    "quality_percentile_filter" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${graft.relational.Sketches.sqlH48("qpf", "doc_id")} AS hv
        |  FROM documents),
        |r AS (SELECT lang, n_tokens,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY hv, n_tokens) AS rn
        |  FROM d),
        |v AS (SELECT lang, n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS vr,
        |    CAST(count(*) OVER (PARTITION BY lang) AS INT) AS ns
        |  FROM r WHERE rn <= $QpfK),
        |th AS (SELECT lang,
        |    max(CASE WHEN vr = (ns + 9) // 10 THEN n_tokens END) AS lo,
        |    max(CASE WHEN vr = (99 * ns + 99) // 100 THEN n_tokens END) AS hi
        |  FROM v GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_tokens, th.lo, th.hi,
        |  d.n_tokens >= th.lo AND d.n_tokens <= th.hi AS kept
        |FROM d JOIN th USING (lang)
        |ORDER BY d.doc_id""".stripMargin,
    // weight literals go VARCHAR→DOUBLE: DuckDB's decimal→double cast
    // is not correctly rounded (same discipline as the Holt oracle)
    "domain_mix" ->
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5('mix|' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |s AS (SELECT d.*,
        |    CAST('0x' || substr(k, 1, 8) AS BIGINT) % $MixShards AS shard
        |  FROM d),
        |t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
        |      FROM d GROUP BY source),
        |x AS (SELECT s.doc_id, s.source, s.shard, s.n_tokens,
        |    CAST(floor(CAST(t.tot_tokens AS DOUBLE) *
        |      (CASE WHEN s.source IN (${MixDownweighted.map(x => s"'$x'").mkString(", ")})
        |            THEN CAST('0.2' AS DOUBLE)
        |            ELSE CAST('0.8' AS DOUBLE) END)
        |      / $MixShards.0) AS BIGINT) AS budget,
        |    CAST(sum(s.n_tokens) OVER (PARTITION BY s.source, s.shard
        |           ORDER BY s.k, s.doc_id ROWS UNBOUNDED PRECEDING)
        |         - s.n_tokens AS BIGINT) AS cum_before
        |  FROM s JOIN t USING (source))
        |SELECT doc_id, source, shard, n_tokens, budget, cum_before,
        |  cum_before < budget AS keep
        |FROM x ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 1000 AS bucket
        |  FROM documents),
        |s AS (SELECT lang, text,
        |    CASE WHEN bucket < 800 THEN 'train'
        |         WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
        |  FROM d),
        |g AS (SELECT split, lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
        |  FROM s GROUP BY 1, 2)
        |SELECT split, lang, n_docs, n_tokens, n_bytes,
        |  CAST(n_docs AS DOUBLE) / (SELECT count(*) FROM documents) AS doc_share
        |FROM g ORDER BY split, lang""".stripMargin,
    "decontaminate" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws,
        |    CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 1000 AS bucket
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, bucket,
        |    unnest(list_transform(range(1, len(ws) - ${DecontamN - 2}),
        |                          i -> $gramSelSql)) AS g
        |  FROM t),
        |ev AS (SELECT DISTINCT g FROM g WHERE bucket >= 900),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g
        |        WHERE bucket < 800 GROUP BY doc_id)
        |SELECT h.doc_id, h.n_shared, tot.n_grams,
        |  CAST(h.n_shared AS DOUBLE) / tot.n_grams AS contam_ratio
        |FROM (SELECT g.doc_id, count(*) AS n_shared
        |      FROM g JOIN ev USING (g) WHERE bucket < 800
        |      GROUP BY g.doc_id) h
        |JOIN tot USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "corpus_shuffle" ->
      s"""SELECT doc_id, shard, CAST(row_number() OVER (
        |    PARTITION BY shard ORDER BY k, doc_id) AS INTEGER) AS pos
        |FROM (
        |  SELECT doc_id, md5('shu|' || CAST(doc_id AS VARCHAR)) AS k,
        |    CAST('0x' || substr(md5('shu|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % $ShuffleShards AS shard
        |  FROM documents)
        |ORDER BY shard, pos""".stripMargin,
    "corpus_pack" ->
      s"""SELECT doc_id, bucket, n_tokens, tok_start,
        |  tok_start // $PackBudget AS seq_id
        |FROM (
        |  SELECT doc_id, bucket, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_start
        |  FROM (
        |    SELECT doc_id,
        |      CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
        |      CAST('0x' || substr(md5('pck|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |           AS BIGINT) % $PackShards AS bucket
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5('str|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 1000 AS bucket,
        |    CASE WHEN lang = 'en' THEN 250 ELSE 1000 END AS rate
        |  FROM documents)
        |WHERE bucket < rate
        |ORDER BY doc_id""".stripMargin,
    "corpus_sample" ->
      """SELECT doc_id, lang,
        |  CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS BIGINT) % 1000 AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |            AS BIGINT) % 1000 < 800 THEN 'train'
        |       WHEN CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |            AS BIGINT) % 1000 < 900 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dsir_sample" ->
      s"""WITH tb AS (
        |  SELECT doc_id, source,
        |    CAST('0x' || substr(md5('dsir|' || w), 1, 8) AS BIGINT)
        |      % $DsirBuckets AS b
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(lower(text), ' ')) AS w
        |        FROM documents)),
        |tgt AS (SELECT b, count(*) AS ct FROM tb
        |        WHERE source IN (${DsirTarget.map(s => s"'$s'")
             .mkString(", ")}) GROUP BY 1),
        |gen AS (SELECT b, count(*) AS cg FROM tb GROUP BY 1),
        |tots AS (SELECT sum(CASE WHEN source IN (${DsirTarget
             .map(s => s"'$s'").mkString(", ")})
        |               THEN 1 ELSE 0 END) AS nt,
        |           count(*) AS ng FROM tb),
        |lr AS (SELECT tb.doc_id,
        |    CAST(CAST(ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
        |                 / CAST(tots.nt + $DsirBuckets AS DOUBLE))
        |           AS DECIMAL(18,9))
        |       - CAST(ln(CAST(gen.cg + 1 AS DOUBLE)
        |                 / CAST(tots.ng + $DsirBuckets AS DOUBLE))
        |           AS DECIMAL(18,9)) AS DECIMAL(19,9)) AS lr
        |  FROM tb LEFT JOIN tgt ON tb.b = tgt.b
        |          JOIN gen ON tb.b = gen.b
        |          CROSS JOIN tots),
        |dw AS (SELECT doc_id, count(*) AS n_tokens,
        |         sum(CAST(lr AS DECIMAL(28,9))) AS logw_dec
        |       FROM lr GROUP BY 1),
        |gk AS (SELECT doc_id, n_tokens, logw_dec,
        |    (CAST(CAST('0x' || substr(md5('dsg|' || CAST(doc_id AS VARCHAR)),
        |          1, 8) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        |  FROM dw),
        |g1 AS (SELECT *, least(CAST(ln(u) AS DECIMAL(18,9)),
        |         CAST(-0.000000001 AS DECIMAL(18,9))) AS lnu FROM gk),
        |g2 AS (SELECT *, CAST(-ln(CAST(-lnu AS DOUBLE))
        |         AS DECIMAL(18,9)) AS g FROM g1),
        |sc AS (SELECT doc_id, n_tokens, logw_dec, g,
        |         CAST(logw_dec AS DECIMAL(28,9))
        |           + CAST(g AS DECIMAL(28,9)) AS score_dec FROM g2),
        |top AS (SELECT *, row_number()
        |          OVER (ORDER BY score_dec DESC, doc_id ASC) AS rank
        |        FROM sc)
        |SELECT doc_id, n_tokens, CAST(logw_dec AS DOUBLE) AS logw,
        |  CAST(g AS DOUBLE) AS gumbel, CAST(score_dec AS DOUBLE) AS score,
        |  CAST(rank AS INTEGER) AS rank
        |FROM top WHERE rank <= $DsirK
        |ORDER BY rank""".stripMargin,
    "corpus_clean" -> (cleanCtes +
      "\nSELECT * FROM verdicts ORDER BY doc_id"),
    "corpus_loss_report" -> (cleanCtes + """,
        |agg AS (SELECT count(*) AS n_total,
        |    count(*) FILTER (keep_quality) AS n_q,
        |    count(*) FILTER (keep_quality AND keep_exact) AS n_qe,
        |    count(*) FILTER (keep) AS n_kept
        |  FROM verdicts)
        |SELECT * FROM (
        |  SELECT 0 AS stage_id, 'ingest' AS stage,
        |    n_total AS n_surviving, CAST(0 AS BIGINT) AS n_dropped
        |  FROM agg
        |  UNION ALL SELECT 1, 'quality_gate', n_q, n_total - n_q FROM agg
        |  UNION ALL SELECT 2, 'exact_dedup', n_qe, n_q - n_qe FROM agg
        |  UNION ALL SELECT 3, 'near_dedup', n_kept, n_qe - n_kept
        |  FROM agg)
        |ORDER BY stage_id""".stripMargin))

  /** The shared verdict CTE chain (pairs → components → quality/
    * exact gates → one verdict row per doc), reused by corpus_clean
    * and corpus_loss_report.
    */
  private def cleanCtes: String =
    DedupQueries.minhashPairsCtes(recursive = true) + s""",
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(rdoc, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.rdoc),
        |cc AS (SELECT rdoc AS doc_id, min(r) AS cluster_rep
        |       FROM reach GROUP BY rdoc),
        |kq AS (SELECT doc_id,
        |         CAST(len(string_split(lt, ' ')) AS INTEGER) >= $MinTokens AND
        |         (CAST(len(list_filter(string_split(lt, ' '),
        |            x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |          / nullif(len(string_split(lt, ' ')), 0)) <= $MaxStopwordRatio
        |         AS keep_quality
        |       FROM (SELECT doc_id, lower(text) AS lt FROM documents)),
        |ex AS (SELECT doc_id,
        |         doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_exact
        |       FROM documents),
        |verdicts AS (SELECT d.doc_id, kq.keep_quality, ex.keep_exact,
        |  COALESCE(cc.doc_id = cc.cluster_rep, TRUE) AS keep_neardup,
        |  kq.keep_quality AND ex.keep_exact
        |    AND COALESCE(cc.doc_id = cc.cluster_rep, TRUE) AS keep
        |FROM documents d
        |JOIN kq USING (doc_id) JOIN ex USING (doc_id)
        |LEFT JOIN cc ON cc.doc_id = d.doc_id)""".stripMargin
}
