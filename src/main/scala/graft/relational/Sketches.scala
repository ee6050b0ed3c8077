package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.plans.AggExpressions
import graft.sources.Tables

/** Mergeable sketches — the 100 TB cardinality/frequency primitives —
  * made DETERMINISTIC and therefore DuckDB hash-gated.
  *
  * `q_approx` (K6) ships Spark's native HLL++/KLL sketches, whose
  * register hashing is engine-private — it can only ever be a
  * rows-only check. This module is the complement: the same sketch
  * ALGEBRA built on the repo's cross-engine hash discipline
  * (`conv(md5(tag|key)[0:12], 16, 10)` — 48 bits, exact in BIGINT and
  * as a dyadic double), so every register, counter, bit and estimate
  * is bit-reproducible on both engines and the whole sketch lands
  * inside the correctness gate. A deployment keeps K6 for ad-hoc
  * speed; these are the AUDITABLE sketches a pipeline can assert on.
  *
  * Scale shapes (all map-side combinable, nothing corpus-sized on the
  * driver): KMV = ONE bounded dedup-in-heap aggregate
  * ([[graft.plans.BottomKLongsDistinct]] — ≤K longs per (task, group)
  * on the wire, no distinct exchange, no per-group sort); HLL =
  * ONE max-aggregate over (group, 64 registers) cells; CMS = ONE
  * count-aggregate over d×w cells broadcast back onto the candidate
  * set; Bloom = a ≤m-row distinct-position table broadcast into the
  * probe scan (the runtime-filter/DPP shape: the probe side is
  * pre-filtered by the build side's membership summary before any
  * exact join).
  */
object Sketches extends QueryModule {

  /** Shared 48-bit cross-engine hash (graft.dedup.Dedup discipline,
    * widened to 12 hex digits so KMV's order statistics have
    * negligible collision mass while staying exact in a double).
    */
  private[graft] def h48(tag: String, key: String): String =
    s"cast(conv(substring(md5(concat('$tag|', cast($key as string))), 1, 12), 16, 10) as bigint)"

  private[graft] def sqlH48(tag: String, key: String): String =
    s"CAST('0x' || substr(md5('$tag|' || CAST($key AS VARCHAR)), 1, 12) AS BIGINT)"

  // ---------------------------------------------------------------
  // KMV (k-minimum-values / bottom-k theta sketch): distinct user_id
  // per event_type. Keep the K smallest DISTINCT hashes; the K-th
  // smallest normalized to [0,1) estimates density: est = (K-1)/θ.
  // ---------------------------------------------------------------

  val KmvK = 16
  private[graft] val TwoPow48 = 281474976710656.0 // exact dyadic
  private[graft] val TwoPow48L = 281474976710656L

  /** KMV hash rows per group, duplicates INCLUDED — dedup lives in
    * the [[kmvBottomK]] aggregate's bounded state, not a separate
    * distinct exchange.
    */
  def kmvHashes(ev: DataFrame): DataFrame =
    ev.filter(col("user_id").isNotNull)
      .select(col("event_type"), expr(h48("kmv", "user_id")).as("hv"))

  /** The per-group KMV state: k smallest DISTINCT hashes, ascending.
    * One exchange of ≤k longs per (task, group) — the former
    * distinct-then-heap form paid a full (group, hv) distinct shuffle
    * FIRST, the dominant sketch cost at corpus scale. Idempotent
    * under re-delivery (a re-inserted hash is a no-op) — the
    * streaming face [[graft.streaming.Streaming.kmvSketchStream]]
    * runs this same body in update mode.
    */
  def kmvBottomK(hv: DataFrame): DataFrame =
    hv.groupBy("event_type")
      .agg(AggExpressions.bottomKLongsDistinct(col("hv"), KmvK).as("bot"))

  /** Estimate assembly from a KMV state frame (event_type, bot) —
    * shared by the fresh build and the persisted-rollup serve
    * ([[SketchStore]]), so a rollup answers in exactly the fresh
    * build's algebra.
    */
  def kmvEstimate(bot: DataFrame,
      keys: Seq[String] = Seq("event_type")): DataFrame =
    bot.withColumn("n_kept", size(col("bot")))
      .withColumn("kth",
        when(col("n_kept") === KmvK, element_at(col("bot"), KmvK)))
      // below K observed distinct the sketch IS the exact count;
      // (K-1)*2^48 is exact in a double (< 2^52), so the estimate is
      // one deterministic division on both engines
      .withColumn("est_distinct",
        when(col("n_kept") < KmvK, col("n_kept").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * TwoPow48) / col("kth")))
      .select(keys.map(col) ++
        Seq(col("n_kept"), col("kth"), col("est_distinct")): _*)
      .orderBy(keys.map(col): _*)

  def sketchKmv(spark: SparkSession, dir: String): DataFrame =
    kmvEstimate(kmvBottomK(kmvHashes(Tables.events(spark, dir))))

  // ---------------------------------------------------------------
  // HLL: 64 registers, register = h mod 64, rho = leading-zero count
  // of the remaining 42 bits + 1 — computed EXACTLY via bin()'s
  // minimal binary string (identical semantics both engines), never
  // floating log2. Σ 2^-Mj is kept as the INTEGER Σ 2^(43-Mj) (every
  // term exact, 64 terms < 2^50), so the raw estimate is a single
  // double division from exact integers.
  // ---------------------------------------------------------------

  val HllM = 64
  private[graft] val HllMaxRho = 43 // 42 payload bits + 1
  private val TwoPow43 = 8796093022208.0
  /** alpha_64 · m² · 2^43 — folded to ONE literal so both engines do
    * exactly one division (the shortest-repr double round-trips
    * through the SQL text losslessly).
    */
  private[graft] val HllC = 0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 * TwoPow43

  /** Adds (j, w, rho) to a frame carrying an `hv` hash column — the
    * per-row register derivation shared by the whole-corpus registers
    * ([[hllRegisters]]) and the day-keyed daily states
    * ([[SketchStore.hllDaily]]).
    */
  private[graft] def withHllRegisterCols(hashed: DataFrame): DataFrame =
    hashed.withColumn("j", (col("hv") % HllM).cast("int"))
      .withColumn("w", expr(s"hv div ${HllM}"))
      .withColumn("rho",
        when(col("w") === 0, lit(HllMaxRho))
          .otherwise(lit(HllMaxRho) - length(bin(col("w")))))

  /** Occupied HLL registers per group: (event_type, j, mj). The
    * mergeable sketch STATE — max-idempotent, so the identical body
    * runs batch (here) and as the streaming update-mode aggregate
    * ([[graft.streaming.Streaming.hllRegisterStream]]); merging two
    * shards' registers is an elementwise max (spec-pinned law).
    */
  def hllRegisters(ev: DataFrame): DataFrame =
    withHllRegisterCols(
      ev.filter(col("user_id").isNotNull)
        .select(col("event_type"), expr(h48("hll", "user_id")).as("hv")))
      .groupBy("event_type", "j").agg(max("rho").as("mj"))

  /** Estimate assembly from occupied-register rows (event_type, j,
    * mj) — shared by the fresh build and the persisted-rollup serve.
    * The 64-register grid derives from the register frame itself
    * (any group with ≥1 hashed row has ≥1 occupied register), so the
    * caller needs nothing but the mergeable state.
    */
  def hllEstimate(rho: DataFrame): DataFrame = {
    // every group carries all 64 registers (empty register ⇒ rho 0);
    // the grid is O(groups·64) — never event volume
    val grid = rho.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(0), lit(HllM - 1))).as("j"))
    grid.join(rho, Seq("event_type", "j"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
      .groupBy("event_type")
      .agg(
        sum(when(col("mj") === 0, 1).otherwise(0)).cast("int").as("v_zero"),
        sum(expr(s"shiftleft(cast(1 as bigint), $HllMaxRho - mj)"))
          .cast("bigint").as("s_scaled"))
      .withColumn("est_raw", lit(HllC) / col("s_scaled").cast("double"))
      // small-range correction: linear counting below 2.5m when any
      // register is empty; the ln rides the H7 decimal(18,9) quantize
      .withColumn("est_distinct",
        when(col("v_zero") > 0 && col("est_raw") <= lit(2.5 * HllM),
          lit(HllM.toDouble) * expr(
            s"cast(cast(ln(cast($HllM as double) / v_zero) as decimal(18,9)) as double)"))
          .otherwise(col("est_raw")))
      .select("event_type", "v_zero", "s_scaled", "est_raw", "est_distinct")
      .orderBy("event_type")
  }

  def sketchHll(spark: SparkSession, dir: String): DataFrame =
    hllEstimate(hllRegisters(Tables.events(spark, dir)))

  // ---------------------------------------------------------------
  // Count-min: d=3 salted hash rows × w=256 buckets; every counter is
  // an exact long. est(key) = min over rows of its bucket counter —
  // ≥ exact count by construction (spec-pinned). Heavy hitters =
  // top-10 candidates by estimate (TakeOrdered, never a full sort).
  // ---------------------------------------------------------------

  val CmsD = 3
  // CMS width is an ERROR budget, not a corpus function (ε ≈ e/w of
  // total mass per counter) — fixed geometry is the honest choice,
  // unlike the Bloom m below which must track the build side
  val CmsW = 256

  /** One row per (key, CMS row, bucket): each key's d salted hash
    * positions. Shared by the batch top-k and the streaming counter
    * face.
    */
  def cmsPositions(ev: DataFrame, extraKeys: Seq[String] = Nil): DataFrame =
    ev.filter(col("user_id").isNotNull)
      .select(extraKeys.map(col) ++ Seq(col("user_id"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("r")): _*)
      .withColumn("b",
        expr(h48Salted("cms", "r", "user_id")) % CmsW)

  /** The CMS counter cells (r, b, c) — the mergeable sketch STATE:
    * merging two shards is an elementwise SUM (spec-pinned law).
    * Additive, not idempotent: unlike HLL's max registers, a
    * re-delivered row INFLATES its counters — the sketch is exact
    * under effectively-once delivery and over-counts (never under)
    * otherwise. Runs identically batch (here) and as the streaming
    * update-mode aggregate
    * ([[graft.streaming.Streaming.cmsCounterStream]]).
    */
  def cmsCounters(ev: DataFrame): DataFrame =
    cmsPositions(ev).groupBy("r", "b").agg(count(lit(1)).as("c"))

  def sketchCmsTopk(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: the per-user count (needed for exact_cnt
    // anyway) comes first, then positions hash per DISTINCT user —
    // counters are the per-cell SUM of hitting users' counts, value-
    // identical to counting events per cell but with the md5 and the
    // cell aggregation on O(users·d) rows instead of O(events·d)
    val perUser = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull).select("user_id")
      .groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    val pos = cmsPositions(perUser, Seq("exact_cnt"))
    val counters = pos.groupBy("r", "b").agg(sum("exact_cnt").as("c"))
    pos.join(broadcast(counters), Seq("r", "b"))
      .groupBy("user_id").agg(min("c").as("est_cnt"),
        max("exact_cnt").as("exact_cnt"))
      .orderBy(desc("est_cnt"), asc("user_id"))
      .limit(10)
      .select("user_id", "est_cnt", "exact_cnt")
  }

  /** Row-salted hash: the salt folds into the md5 tag so each CMS row
    * (and each Bloom probe) is an independent hash function.
    */
  private[graft] def h48Salted(tag: String, saltCol: String, key: String): String =
    s"""cast(conv(substring(md5(concat('$tag', cast($saltCol as string),
       | '|', cast($key as string))), 1, 12), 16, 10) as bigint)"""
      .stripMargin.replace("\n", "")

  private[graft] def sqlH48Salted(tag: String, saltCol: String, key: String): String =
    s"CAST('0x' || substr(md5('$tag' || CAST($saltCol AS VARCHAR) || '|' || CAST($key AS VARCHAR)), 1, 12) AS BIGINT)"

  // ---------------------------------------------------------------
  // Bloom-filter join pruning (the runtime-filter shape): the build
  // side's membership collapses to a ≤m-row distinct-bit-position
  // table broadcast into the probe scan; a probe row survives iff all
  // k=3 of its positions are set. No false negatives by construction;
  // the false-positive count is DETERMINISTIC (same bits both
  // engines) and emitted — the quantity that prices the filter.
  //
  // m is SIZE-DERIVED (the simhash-W/knn-planes ladder discipline): a
  // fixed m saturates when the build side grows 10× — here m = the
  // smallest power of 2 ≥ 16·n_build (~5 bits/key at k=3 → ~9% load,
  // fp ≈ 0.1%), exact integer arithmetic via bin()'s bit length so
  // both engines derive the identical geometry from ONE count.
  // ---------------------------------------------------------------

  // ---------------------------------------------------------------
  // Quantile sketch: a bottom-K-BY-HASH uniform row sample per group
  // (deterministic reservoir — the K rows with the smallest
  // h48(event_id) ARE a uniform without-replacement sample, fixed by
  // the hash, not by scan order), then explicit order statistics
  // ceil(q·n) over the sorted sample. O(K) state per group via the
  // same bounded heap as KMV — mergeable: the bottom-K of two shards'
  // bottom-Ks is the bottom-K of the union (spec-pinned law). The
  // index arithmetic is the SAME double product/ceil on both engines
  // (no percentile_disc — its interpolation/tie rules are engine
  // lore; an explicit element pick is bit-reproducible).
  // ---------------------------------------------------------------

  val QtlK = 64
  /** (name, num, den): est_q = ceil(num·n/den)-th order statistic of
    * the sorted sample — INTEGER ceil-division on both engines. A
    * double `ceil(q*n)` is a trap twice over: DuckDB parses `0.9` as
    * DECIMAL (exact ·n) while Spark's literal is a double (0.9·20 =
    * 18.000…004 → ceil 19), so the engines disagree at exact
    * boundaries AND neither matches textbook percentile_disc.
    */
  private[graft] val QtlQs =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** Order-statistic assembly from a sampled frame (event_type,
    * n_total, _s: array<struct<hv,value>>) — shared by the fresh
    * build and the persisted-rollup serve.
    */
  def qtlEstimate(sampled: DataFrame): DataFrame = {
    val withVals = sampled
      .withColumn("vals",
        sort_array(expr("transform(_s, x -> x.value)")))
      .withColumn("n_sample", size(col("vals")))
    QtlQs.foldLeft(withVals) { case (df, (name, num, den)) =>
      df.withColumn(name,
        element_at(col("vals"),
          expr(s"cast(($num * n_sample + ${den - 1}) div $den as int)")))
    }.select(Seq(col("event_type"), col("n_total"), col("n_sample")) ++
        QtlQs.map { case (n, _, _) => col(n) }: _*)
      .orderBy("event_type")
  }

  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        expr(h48("qtl", "event_id")).as("hv"))
    // (hv, value) struct: hv dominates the bounded-heap order; value
    // rides as payload (and breaks a 48-bit collision identically to
    // the oracle's ORDER BY hv, value)
    qtlEstimate(ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        AggExpressions.collectTopK(struct(col("hv"), col("value")),
          QtlK, largestFirst = false).as("_s")))
  }

  /** Equi-depth histogram buckets per group — the CBO companion to
    * K23's fixed-WIDTH histogram: boundary i of B buckets is the
    * ceil(i·n_s/B)-th order statistic of the SAME bottom-K-by-hash
    * sample as K39 (sample-based equi-depth is the standard ANALYZE
    * histogram; exact equi-depth needs a per-group global sort).
    * Long-form output (group, bucket, boundary) — O(groups·B) rows.
    */
  val HistBuckets = 8

  def sketchEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        expr(h48("qtl", "event_id")).as("hv"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        AggExpressions.collectTopK(struct(col("hv"), col("value")),
          QtlK, largestFirst = false).as("_s"))
      .withColumn("vals",
        sort_array(expr("transform(_s, x -> x.value)")))
      .withColumn("n_sample", size(col("vals")))
      .select(col("event_type"), col("n_total"), col("n_sample"),
        explode(sequence(lit(1), lit(HistBuckets - 1))).as("bucket"),
        col("vals"))
      .withColumn("boundary",
        element_at(col("vals"), expr(
          s"cast((bucket * n_sample + ${HistBuckets - 1}) div $HistBuckets as int)")))
      .drop("vals")
      .orderBy("event_type", "bucket")
  }

  // ---------------------------------------------------------------
  // Theta-sketch set operations over the SAME KMV bottom-K state:
  // pairwise |A∩B| / |A∪B| / Jaccard estimates between event-type
  // audiences (user_id sets) — the overlap-estimation primitive a
  // training pipeline runs between corpus shards or train/eval
  // splits, at O(K) state per set instead of a distinct-join. For a
  // pair: θ = min of the two sketches' thetas (a group below K
  // distinct is EXACT — its θ is 2^48), retained = hashes < θ;
  // est = |retained| · 2^48 / θ, and Jaccard = n∩/n∪ — θ cancels, so
  // the ratio needs no scaling at all. The G² pair stage runs on
  // O(groups·K) rows — corpus size only enters the one KMV aggregate.
  // ---------------------------------------------------------------

  def sketchThetaOps(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (eager, like decontaminateNeardup): the pair
    // stage self-joins this O(groups)-row frame — without
    // materialization each join side recomputes the corpus KMV
    // aggregate, and unlike persist() the blocks carry no cache-
    // manager entry to leak across a long session of invocations
    val bot = kmvBottomK(kmvHashes(Tables.events(spark, dir)))
      .withColumn("kth",
        when(size(col("bot")) === KmvK, element_at(col("bot"), KmvK)))
      .localCheckpoint(true)
    val a = bot.select(col("event_type").as("et_a"), col("bot").as("bot_a"),
      coalesce(col("kth"), lit(TwoPow48L)).as("th_a"))
    val b = bot.select(col("event_type").as("et_b"), col("bot").as("bot_b"),
      coalesce(col("kth"), lit(TwoPow48L)).as("th_b"))
    a.join(b, col("et_a") < col("et_b"))
      .withColumn("theta", least(col("th_a"), col("th_b")))
      .withColumn("n_inter",
        size(expr("filter(array_intersect(bot_a, bot_b), x -> x < theta)")))
      .withColumn("n_union",
        size(expr(
          "filter(array_distinct(concat(bot_a, bot_b)), x -> x < theta)")))
      // n_inter·2^48 < 2^52 and θ < 2^48: both sides exact in a
      // double, one division each; a fully-exact pair (θ = 2^48)
      // estimates its true counts verbatim
      .withColumn("est_inter",
        col("n_inter").cast("double") * TwoPow48 / col("theta"))
      .withColumn("est_union",
        col("n_union").cast("double") * TwoPow48 / col("theta"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union"))
      .select("et_a", "et_b", "theta", "n_inter", "n_union",
        "est_inter", "est_union", "jaccard")
      .orderBy("et_a", "et_b")
  }

  /** K53 — join-KEY skew report: the diagnostic a 100 TB deployment
    * runs BEFORE a big join to decide whether the key needs salting
    * or AQE skew handling. One count-groupBy over the key (map-side
    * combined, so the hot keys being diagnosed partial-aggregate per
    * task instead of flooding one reducer — the classic reason a
    * count survives the very skew it measures), then top-10 keys by
    * count (TakeOrdered, never a full sort) against the broadcast
    * 1-row totals. `skew` = cnt·ndv/n_rows — the key's multiple of a
    * uniform key's share (1.0 = perfectly uniform; a planner salts
    * when max skew × per-key bytes exceeds a task's budget). The
    * grouped frame feeds both the totals and the top-10; AQE's
    * exchange reuse shares the one shuffle between them. Exact
    * integer counts; share_ppm integer div; skew is one multiply +
    * one divide in the same order both engines.
    */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .groupBy(col("user_id").as("key_val"))
      .agg(count(lit(1)).as("cnt"))
    val t = g.agg(sum("cnt").cast("bigint").as("n_rows"),
      count(lit(1)).as("ndv"))
    g.crossJoin(broadcast(t))
      .withColumn("share_ppm", expr("(cnt * 1000000) div n_rows"))
      .withColumn("skew",
        col("cnt").cast("double") * col("ndv") / col("n_rows"))
      .select("key_val", "cnt", "share_ppm", "skew", "n_rows", "ndv")
      .orderBy(desc("cnt"), asc("key_val"))
      .limit(10)
  }

  // ---------------------------------------------------------------
  // K54/K55 — the write-path half of the operations story. K53 asks
  // "is this JOIN key skewed"; these ask "how should the WRITE be
  // laid out": per-partition file counts (the small-file problem)
  // and sample-derived range boundaries with an exact balance audit
  // (the repartitionByRange plan, surfaced as a query).
  // ---------------------------------------------------------------

  /** Target rows per output file for [[partitionLayoutPlan]] — at a
    * deployment this is bytes-derived config; the gate pins the
    * arithmetic, not the constant.
    */
  val WriteTargetRows = 1024L

  /** K54 — write-layout plan per day partition of events: how many
    * files tonight's partition write should produce (integer-ceil of
    * rows/target), how full the LAST file lands (a chronically
    * low-fill tail is the small-file problem), the partition's share
    * and skew vs a uniform day (the K53 skew form on the PARTITION
    * axis), and a coalesce-candidate flag (under half a target file
    * — the partitions a nightly compactor should merge). ONE
    * map-side-combined count-groupBy on the partition key + a
    * broadcast 1-row totals frame; all-integer arithmetic except the
    * same-order double skew.
    */
  def partitionLayoutPlan(spark: SparkSession, dir: String): DataFrame =
    layoutOf(
      Tables.events(spark, dir).filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows")),
      "day")

  /** The K54 layout algebra over a prepared (key, n_rows) partition
    * frame — split out so the same audit runs on ANY partition axis:
    * the day partitions of the raw layout (the gate query) and the
    * rewrite batches of the COMPACTED layout
    * ([[graft.relational.Compactor]]'s spec re-runs it there to prove
    * compaction cleared the small-partition flags).
    */
  private[graft] def layoutOf(g: DataFrame, key: String): DataFrame = {
    val t = g.agg(sum("n_rows").cast("bigint").as("n_total"),
      count(lit(1)).as("n_days"))
    g.crossJoin(broadcast(t))
      .withColumn("n_files",
        expr(s"(n_rows + ${WriteTargetRows - 1}) div $WriteTargetRows"))
      .withColumn("last_fill_ppm", expr(
        s"((n_rows - (n_files - 1) * $WriteTargetRows) * 1000000) div $WriteTargetRows"))
      .withColumn("share_ppm", expr("(n_rows * 1000000) div n_total"))
      .withColumn("skew",
        col("n_rows").cast("double") * col("n_days") / col("n_total"))
      .withColumn("is_small",
        expr(s"cast(case when n_rows * 2 < $WriteTargetRows then 1 else 0 end as bigint)"))
      .select(key, "n_rows", "n_files", "last_fill_ppm", "share_ppm",
        "skew", "is_small", "n_total", "n_days")
      .orderBy(key)
  }

  /** Sample size / bucket count for [[rangePartitionPlan]]. */
  val RppS = 256
  val RppB = 8

  /** K55 — range-partition plan + exact balance audit: the
    * `repartitionByRange` / sorted-export planner surfaced as a
    * query. Boundaries come from a BOUNDED deterministic sample
    * (bottom-[[RppS]] rows by the shared 48-bit hash of the primary
    * key — ONE combinable O(S)-state aggregate, the K39/K49
    * discipline; Spark's own RangePartitioner samples the same way,
    * non-deterministically) via the integer-ceil order statistic
    * `ceil(i·ns/B)`; then ONE full scan assigns every row its
    * planned bucket through a codegen'd comparison chain (the B-1
    * boundary values are driver-collected literals from the
    * 256-value sample — the bounded-collect pattern the cutoff
    * literals already use) and counts per bucket, map-side combined
    * into ≤ B groups. The audit answers the question a 100 TB export
    * asks BEFORE the global sort: would these boundaries balance the
    * shuffle (skew = bucket's multiple of the uniform 1/B share)?
    * `lo`/`hi` carry each bucket's planned boundary values (NULL at
    * the open ends) via two broadcast joins against the B-1-row
    * boundary frame. Exact counts; boundary doubles are data values
    * selected, never computed, so they cross engines bit-exact.
    */
  /** The K55 (v, hv) frame over orders — shared by the plan query
    * and the exporter ([[RangeExport]]), so both derive boundaries
    * from the identical deterministic sample.
    */
  private[relational] def rangeFrame(spark: SparkSession,
      dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_totalprice").as("v"),
        expr(h48("rpp", "o_orderkey")).as("hv"))

  /** Sample-derived range boundaries over a prepared (v, hv) frame:
    * ONE bounded combinable aggregate (bottom-[[RppS]] by the shared
    * hash) + the integer-ceil order statistic — the only driver-side
    * materialization, O([[RppS]]) values at any table size.
    */
  private[relational] def rangeBoundsOf(e: DataFrame): Seq[Double] = {
    val vals = e
      .agg(AggExpressions.collectTopK(struct(col("hv"), col("v")),
        RppS, largestFirst = false).as("_s"))
      .select(expr("transform(_s, x -> x.v)").as("vals"))
      .head().getSeq[Double](0).sorted
    val ns = vals.length
    // empty relation → no sample → a single open-ended bucket plan
    // over zero rows (the empty frame), never an index out of bounds
    if (ns == 0) Seq.empty[Double]
    else (1 until RppB).map(i => vals((i * ns + RppB - 1) / RppB - 1))
  }

  /** The planned bucket of a `v` column under `bounds` — a codegen'd
    * comparison chain over the B-1 driver-collected boundary
    * literals.
    */
  private[relational] def bucketColOf(bounds: Seq[Double])
      : org.apache.spark.sql.Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("v") >= lit(b), 1).otherwise(0)
    }.cast("bigint")

  def rangePartitionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = rangeFrame(spark, dir)
    val bounds = rangeBoundsOf(e)
    val bucketCol = bucketColOf(bounds)
    val g = e.groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    val t = g.agg(sum("n_rows").cast("bigint").as("n_total"))
    val bdf = bounds.zipWithIndex
      .map { case (b, i) => ((i + 1).toLong, b) }.toDF("bi", "bval")
    g.crossJoin(broadcast(t))
      .join(broadcast(bdf.select(col("bi"), col("bval").as("lo"))),
        col("bucket") === col("bi"), "left").drop("bi")
      .join(broadcast(bdf.select(col("bi").as("bi2"), col("bval").as("hi"))),
        col("bucket") + 1 === col("bi2"), "left").drop("bi2")
      .withColumn("share_ppm", expr("(n_rows * 1000000) div n_total"))
      .withColumn("skew",
        col("n_rows").cast("double") * RppB / col("n_total"))
      .select("bucket", "n_rows", "share_ppm", "skew", "lo", "hi",
        "n_total")
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------
  // K56/K57 — the READ-path layout diagnostics closing the
  // operations story: K54 plans how a write lands, these measure
  // what the landed layout buys a reader (zone-map pruning) and
  // what a compactor should do about the small partitions K54
  // flags. Both run entirely on the O(partitions)-row layout frame
  // — one metadata row per day partition, 10³-10⁵ rows at 100 TB —
  // so every window/join below is metadata-sized by construction;
  // events enter exactly once, through the min/max/count groupBy.
  // ---------------------------------------------------------------

  /** K56 — zone-map effectiveness report: what parquet footer
    * min/max stats buy a reader on THIS layout. Per day partition:
    * the zone map (min/max of `value`), `chain_start` marking the
    * interval-graph component structure under the (min_v, max_v,
    * day) total order (a value-clustered layout has ~n_parts
    * chains — every range disjoint — while a random layout
    * collapses to 1 chain: nothing prunes), and `can_skip` for the
    * deterministic probe predicate `value >= probe` where `probe` =
    * max over partitions of min_v (the tightest point predicate the
    * layout itself guarantees at least one partition must serve).
    * Summary columns (n_chains, n_skippable) ride along broadcast.
    * The running-max chain window is unpartitioned BUT over the
    * metadata frame — the module-header bound; the two 1-row
    * crosses are the ivf_list_stats shape. min/max doubles are data
    * values selected, never computed — cross-engine bit-exact.
    */
  def zoneMapReport(spark: SparkSession, dir: String): DataFrame =
    zoneMapOf(
      Tables.events(spark, dir)
        .filter(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows"), min("value").as("min_v"),
          max("value").as("max_v")))

  /** Core of [[zoneMapReport]] over a prepared zone frame
    * (day, n_rows, min_v, max_v) — split out so the spec can pin the
    * chain/skip algebra on a synthetic clustered layout.
    */
  private[graft] def zoneMapOf(z: DataFrame): DataFrame = {
    val w = Window.orderBy("min_v", "max_v", "day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chained = z
      .withColumn("prev_hi", max("max_v").over(w))
      .withColumn("chain_start", expr(
        "cast(case when prev_hi is null or min_v > prev_hi then 1 else 0 end as bigint)"))
      .drop("prev_hi")
    val t1 = z.agg(max("min_v").as("probe"),
      count(lit(1)).as("n_parts"))
    val j = chained.crossJoin(broadcast(t1))
      .withColumn("can_skip", expr(
        "cast(case when max_v < probe then 1 else 0 end as bigint)"))
    val t2 = j.agg(sum("chain_start").cast("bigint").as("n_chains"),
      sum("can_skip").cast("bigint").as("n_skippable"))
    j.crossJoin(broadcast(t2))
      .select("day", "n_rows", "min_v", "max_v", "chain_start",
        "can_skip", "probe", "n_parts", "n_chains", "n_skippable")
      .orderBy("day")
  }

  /** Compaction batch budget for [[compactionPlan]] — rows per
    * OPTIMIZE batch (8 target files' worth; bytes-derived config at
    * a deployment, the gate pins the arithmetic).
    */
  val CompactTargetRows = 8 * WriteTargetRows

  /** K57 — compaction (OPTIMIZE) plan: the actionable follow-up to
    * K54's small-partition flags. Day partitions are packed in day
    * order into rewrite batches cut every [[CompactTargetRows]] rows
    * of running total (the L3 corpus_pack cut discipline on the
    * PARTITION axis — deterministic, no sequential greedy state:
    * `grp` = floor(rows-before-this-partition / budget), so a batch
    * overshoots by at most one partition and day ranges stay
    * contiguous, preserving partition-pruning locality after the
    * rewrite). Emits each partition's batch assignment plus the
    * batch's totals and fill vs budget — what a nightly compactor
    * executes directly. The cumsum window is unpartitioned BUT over
    * the metadata frame (module-header bound); the batch-totals join
    * is a tiny hash equi-join on grp. All-integer arithmetic.
    */
  /** The K57 cut discipline over a prepared (day, n_rows) frame —
    * the metadata-sized cumsum assigning each partition its rewrite
    * batch; shared by the plan query and the EXECUTOR
    * ([[graft.relational.Compactor.execute]]), so what the compactor
    * rewrites is exactly what the plan query reports.
    */
  private[relational] def batchCuts(g: DataFrame): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_before",
        coalesce(sum("n_rows").over(w), lit(0L)))
      .withColumn("grp", expr(s"cum_before div $CompactTargetRows"))
      .drop("cum_before")
  }

  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val cum = batchCuts(
      Tables.events(spark, dir).filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows")))
    val gg = cum.groupBy("grp")
      .agg(sum("n_rows").cast("bigint").as("grp_rows"),
        count(lit(1)).as("grp_parts"))
    cum.join(broadcast(gg), "grp")
      .withColumn("grp_fill_ppm",
        expr(s"(grp_rows * 1000000) div $CompactTargetRows"))
      .select("day", "n_rows", "grp", "grp_rows", "grp_parts",
        "grp_fill_ppm")
      .orderBy("day")
  }

  /** Join-cardinality estimation between two TABLES' key columns —
    * the CBO primitive behind join ordering: one global KMV sketch
    * per side (customer.c_custkey build, orders.o_custkey probe),
    * then the K40 theta algebra between them. est_inter estimates
    * the DISTINCT matching keys; containment = n∩/n_probe-retained
    * estimates the probe-side key hit rate (the join selectivity a
    * planner feeds its cardinality model). Each side is ONE bounded
    * aggregate — at 100 TB this replaces a distinct-join just to
    * price a join.
    */
  def sketchJoinCard(spark: SparkSession, dir: String): DataFrame = {
    def side(df: DataFrame, key: String): DataFrame =
      df.filter(col(key).isNotNull)
        .select(expr(h48("jc", key)).as("hv"))
        .agg(AggExpressions.bottomKLongsDistinct(col("hv"), KmvK).as("bot"))
        .select(col("bot"),
          when(size(col("bot")) === KmvK, element_at(col("bot"), KmvK))
            .otherwise(lit(TwoPow48L)).as("th"))
    val a = side(Tables.customer(spark, dir), "c_custkey")
      .select(col("bot").as("bot_a"), col("th").as("th_a"))
    val b = side(Tables.orders(spark, dir), "o_custkey")
      .select(col("bot").as("bot_b"), col("th").as("th_b"))
    a.crossJoin(broadcast(b)) // 1 row × 1 row
      .withColumn("theta", least(col("th_a"), col("th_b")))
      .withColumn("n_inter",
        size(expr("filter(array_intersect(bot_a, bot_b), x -> x < theta)")))
      .withColumn("n_b_ret",
        size(expr("filter(bot_b, x -> x < theta)")))
      // per-side distinct estimates use the K35 estimator: exact
      // below K, (K-1)·2^48/θ at K
      .withColumn("est_build",
        when(size(col("bot_a")) < KmvK, size(col("bot_a")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * TwoPow48) / col("th_a")))
      .withColumn("est_probe",
        when(size(col("bot_b")) < KmvK, size(col("bot_b")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * TwoPow48) / col("th_b")))
      .withColumn("est_inter",
        col("n_inter").cast("double") * TwoPow48 / col("theta"))
      .withColumn("containment",
        col("n_inter").cast("double") / col("n_b_ret"))
      .select("theta", "n_inter", "n_b_ret",
        "est_build", "est_probe", "est_inter", "containment")
  }

  val BloomK = 3
  private val bloomMExpr =
    "shiftleft(cast(1 as bigint), length(bin(greatest(16 * n_build, 2) - 1)))"

  /** The build side's Bloom state — (n_build, m) plus the distinct
    * set-bit-position table — shared by the fresh join pricing (here)
    * and the persisted-artifact serve ([[SketchStore]]).
    */
  private[relational] def bloomState(build: DataFrame)
      : (DataFrame, DataFrame) = {
    val msel = build.agg(count(lit(1)).as("n_build"))
      .withColumn("m", expr(bloomMExpr))
    val bits = build.crossJoin(broadcast(msel.select("m")))
      .select(explode(sequence(lit(0), lit(BloomK - 1))).as("i"),
        col("c_custkey"), col("m"))
      .select((expr(h48Salted("blm", "i", "c_custkey")) % col("m")).as("p"))
      .distinct()
    (msel, bits)
  }

  /** The probe-side census against a given Bloom state — the tail of
    * [[sketchBloomJoin]], reusable over a LOADED state.
    */
  private[relational] def bloomCensus(spark: SparkSession, dir: String,
      build: DataFrame, msel: DataFrame, bits: DataFrame): DataFrame = {
    val probe = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        explode(sequence(lit(0), lit(BloomK - 1))).as("i"))
      .crossJoin(broadcast(msel.select("m")))
      .withColumn("p", expr(h48Salted("blm", "i", "o_custkey")) % col("m"))
    // each probe position matches ≤1 bit row (bits are distinct), so
    // matched-row count == number of set positions; pass ⇔ all k set
    val flags = probe
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("p"), "left")
      .groupBy("o_orderkey")
      .agg(max("o_custkey").as("o_custkey"),
        sum(coalesce(col("hit"), lit(0))).as("nm"))
      .withColumn("pass", col("nm") === BloomK)
      .join(broadcast(build.withColumn("tru", lit(true))
        .withColumnRenamed("c_custkey", "o_custkey")), Seq("o_custkey"), "left")
      .withColumn("tru", coalesce(col("tru"), lit(false)))
    val nBits = bits.agg(count(lit(1)).cast("int").as("n_bits"))
    flags.agg(
      count(lit(1)).as("n_probe"),
      sum(when(col("pass"), 1).otherwise(0)).as("n_pass"),
      sum(when(col("tru"), 1).otherwise(0)).as("n_true"),
      sum(when(col("pass") && !col("tru"), 1).otherwise(0)).as("n_fp"))
      .crossJoin(broadcast(msel))
      .crossJoin(broadcast(nBits))
      .select("n_build", "m", "n_bits", "n_probe", "n_pass", "n_true", "n_fp")
  }

  // ---------------------------------------------------------------
  // Data profile (the ANALYZE TABLE / CBO-stats pass): one scan of
  // events exploded by stack() into (column, canonical-string,
  // numeric) rows, then ONE combinable aggregate per column — row
  // count, null count, numeric min/max, and NDV from the same KMV
  // bottom-K state as K35 (exact below K, estimated above — at 100 TB
  // this is the honest ndv; an exact multi-column count-distinct
  // would Expand the scan per column). Canonicalization is the
  // cross-engine trap: BIGINTs stringify identically, timestamps
  // hash their exact integer micros (unix_micros/epoch_us), doubles
  // round-trip through DECIMAL(18,6) text so both engines hash the
  // same characters.
  // ---------------------------------------------------------------

  /** (column, Spark string canon, DuckDB string canon, Spark numeric,
    * DuckDB numeric) per profiled events column.
    */
  private val ProfCols = Seq(
    ("event_id", "cast(event_id as string)", "CAST(event_id AS VARCHAR)",
      "cast(event_id as double)", "CAST(event_id AS DOUBLE)"),
    ("event_type", "event_type", "event_type",
      "cast(null as double)", "CAST(NULL AS DOUBLE)"),
    ("props", "props", "props",
      "cast(null as double)", "CAST(NULL AS DOUBLE)"),
    ("ts", "cast(unix_micros(ts) as string)", "CAST(epoch_us(ts) AS VARCHAR)",
      "cast(null as double)", "CAST(NULL AS DOUBLE)"),
    ("user_id", "cast(user_id as string)", "CAST(user_id AS VARCHAR)",
      "cast(user_id as double)", "CAST(user_id AS DOUBLE)"),
    ("value", "cast(cast(value as decimal(18,6)) as string)",
      "CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR)",
      "value", "value"))

  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val stackArgs = ProfCols.map { case (n, s, _, d, _) =>
      s"'$n', $s, $d" }.mkString(", ")
    val long = Tables.events(spark, dir).select(
      expr(s"stack(${ProfCols.size}, $stackArgs) as (col_name, sval, nval)"))
    val hv = "cast(conv(substring(md5(concat('prof|', sval)), 1, 12), 16, 10) as bigint)"
    long.groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("sval").isNull, 1).otherwise(0)).cast("bigint")
          .as("n_null"),
        min("nval").as("min_num"), max("nval").as("max_num"),
        AggExpressions.bottomKLongsDistinct(expr(hv), KmvK).as("bot"))
      .withColumn("n_kept", size(col("bot")))
      .withColumn("kth",
        when(col("n_kept") === KmvK, element_at(col("bot"), KmvK)))
      .withColumn("ndv_est",
        when(col("n_kept") < KmvK, col("n_kept").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * TwoPow48) / col("kth")))
      .select("col_name", "n_rows", "n_null", "min_num", "max_num",
        "n_kept", "kth", "ndv_est")
      .orderBy("col_name")
  }

  private[relational] def dataProfileSql: String = {
    val longSql = ProfCols.map { case (n, _, s, _, d) =>
      s"SELECT '$n' AS col_name, $s AS sval, $d AS nval FROM events"
    }.mkString("\n  UNION ALL ")
    s"""WITH long AS (
      |  $longSql),
      |base AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN sval IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_null,
      |    min(nval) AS min_num, max(nval) AS max_num
      |  FROM long GROUP BY 1),
      |h AS (SELECT DISTINCT col_name,
      |    CAST('0x' || substr(md5('prof|' || sval), 1, 12) AS BIGINT) AS hv
      |  FROM long WHERE sval IS NOT NULL),
      |r AS (SELECT col_name, hv,
      |    row_number() OVER (PARTITION BY col_name ORDER BY hv ASC) AS rn
      |  FROM h),
      |k AS (SELECT col_name,
      |    CAST(CASE WHEN count(*) >= $KmvK THEN $KmvK
      |              ELSE count(*) END AS INT) AS n_kept,
      |    max(CASE WHEN rn = $KmvK THEN hv END) AS kth,
      |    CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE)
      |         ELSE ${(KmvK - 1).toDouble * TwoPow48}
      |              / max(CASE WHEN rn = $KmvK THEN hv END)
      |    END AS ndv_est
      |  FROM r GROUP BY col_name)
      |SELECT base.col_name, n_rows, n_null, min_num, max_num,
      |  COALESCE(n_kept, CAST(0 AS INT)) AS n_kept, kth,
      |  COALESCE(ndv_est, CAST(0.0 AS DOUBLE)) AS ndv_est
      |FROM base LEFT JOIN k ON base.col_name = k.col_name
      |ORDER BY base.col_name""".stripMargin
  }

  /** The build side used by the gated bloom queries. */
  private[relational] def bloomBuild(spark: SparkSession, dir: String)
      : DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")

  def sketchBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val build = bloomBuild(spark, dir)
    val (msel, bits) = bloomState(build)
    bloomCensus(spark, dir, build, msel, bits)
  }

  override def queries: Map[String, Q] = Map(
    "sketch_kmv" -> (sketchKmv _),
    "sketch_hll" -> (sketchHll _),
    "sketch_cms_topk" -> (sketchCmsTopk _),
    "sketch_bloom_join" -> (sketchBloomJoin _),
    "sketch_quantiles" -> (sketchQuantiles _),
    "sketch_theta_ops" -> (sketchThetaOps _),
    "sketch_equidepth_hist" -> (sketchEquidepth _),
    "sketch_join_card" -> (sketchJoinCard _),
    "key_skew_report" -> (keySkew _),
    "partition_layout_plan" -> (partitionLayoutPlan _),
    "range_partition_plan" -> (rangePartitionPlan _),
    "zone_map_report" -> (zoneMapReport _),
    "compaction_plan" -> (compactionPlan _),
    "data_profile" -> (dataProfile _))

  override def oracles: Map[String, String] = Map(
    "key_skew_report" ->
      """WITH g AS (SELECT user_id AS key_val,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS ndv FROM g)
        |SELECT key_val, cnt,
        |  CAST((cnt * 1000000) // n_rows AS BIGINT) AS share_ppm,
        |  CAST(cnt AS DOUBLE) * ndv / n_rows AS skew,
        |  n_rows, ndv
        |FROM g, t
        |ORDER BY cnt DESC, key_val ASC LIMIT 10""".stripMargin,
    "partition_layout_plan" ->
      s"""WITH g AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_days FROM g)
        |SELECT day, n_rows,
        |  CAST((n_rows + ${WriteTargetRows - 1}) // $WriteTargetRows
        |       AS BIGINT) AS n_files,
        |  CAST(((n_rows - ((n_rows + ${WriteTargetRows - 1})
        |          // $WriteTargetRows - 1) * $WriteTargetRows)
        |        * 1000000) // $WriteTargetRows AS BIGINT)
        |    AS last_fill_ppm,
        |  CAST((n_rows * 1000000) // n_total AS BIGINT) AS share_ppm,
        |  CAST(n_rows AS DOUBLE) * n_days / n_total AS skew,
        |  CAST(CASE WHEN n_rows * 2 < $WriteTargetRows THEN 1 ELSE 0
        |       END AS BIGINT) AS is_small,
        |  n_total, n_days
        |FROM g CROSS JOIN t
        |ORDER BY day""".stripMargin,
    "range_partition_plan" ->
      s"""WITH e AS (SELECT o_totalprice AS v,
        |    ${sqlH48("rpp", "o_orderkey")} AS hv
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |r AS (SELECT v, row_number() OVER (ORDER BY hv, v) AS rn
        |  FROM e),
        |sv AS (SELECT v, row_number() OVER (ORDER BY v) AS vr,
        |    count(*) OVER () AS ns
        |  FROM r WHERE rn <= $RppS),
        |b AS (SELECT CAST(i AS BIGINT) AS bi,
        |    max(CASE WHEN vr = (i * ns + ${RppB - 1}) // $RppB
        |        THEN v END) AS bval
        |  FROM sv CROSS JOIN range(1, $RppB) t(i) GROUP BY 1),
        |a AS (SELECT CAST((SELECT count(*) FROM b WHERE b.bval <= e.v)
        |    AS BIGINT) AS bucket FROM e),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM a GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM g)
        |SELECT g.bucket, g.n_rows,
        |  CAST((g.n_rows * 1000000) // t.n_total AS BIGINT)
        |    AS share_ppm,
        |  CAST(g.n_rows AS DOUBLE) * $RppB / t.n_total AS skew,
        |  lob.bval AS lo, hib.bval AS hi, t.n_total
        |FROM g CROSS JOIN t
        |LEFT JOIN b lob ON lob.bi = g.bucket
        |LEFT JOIN b hib ON hib.bi = g.bucket + 1
        |ORDER BY g.bucket""".stripMargin,
    "zone_map_report" ->
      """WITH z AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    min(value) AS min_v, max(value) AS max_v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT *, max(max_v) OVER (ORDER BY min_v, max_v, day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_hi FROM z),
        |c2 AS (SELECT day, n_rows, min_v, max_v,
        |    CAST(CASE WHEN prev_hi IS NULL OR min_v > prev_hi
        |         THEN 1 ELSE 0 END AS BIGINT) AS chain_start FROM c),
        |t1 AS (SELECT max(min_v) AS probe,
        |    CAST(count(*) AS BIGINT) AS n_parts FROM z),
        |j AS (SELECT c2.*, t1.probe, t1.n_parts,
        |    CAST(CASE WHEN max_v < probe THEN 1 ELSE 0 END AS BIGINT)
        |      AS can_skip
        |  FROM c2 CROSS JOIN t1),
        |t2 AS (SELECT CAST(sum(chain_start) AS BIGINT) AS n_chains,
        |    CAST(sum(can_skip) AS BIGINT) AS n_skippable FROM j)
        |SELECT day, n_rows, min_v, max_v, chain_start, can_skip,
        |  probe, n_parts, n_chains, n_skippable
        |FROM j CROSS JOIN t2
        |ORDER BY day""".stripMargin,
    "compaction_plan" ->
      s"""WITH g AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |c AS (SELECT day, n_rows,
        |    CAST(COALESCE(sum(n_rows) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // $CompactTargetRows AS BIGINT) AS grp
        |  FROM g),
        |gg AS (SELECT grp, CAST(sum(n_rows) AS BIGINT) AS grp_rows,
        |    CAST(count(*) AS BIGINT) AS grp_parts
        |  FROM c GROUP BY 1)
        |SELECT c.day, c.n_rows, c.grp, gg.grp_rows, gg.grp_parts,
        |  CAST((gg.grp_rows * 1000000) // $CompactTargetRows AS BIGINT)
        |    AS grp_fill_ppm
        |FROM c JOIN gg USING (grp)
        |ORDER BY c.day""".stripMargin,
    "data_profile" -> dataProfileSql,
    "sketch_join_card" ->
      s"""WITH ha AS (SELECT DISTINCT ${sqlH48("jc", "c_custkey")} AS hv
        |  FROM customer WHERE c_custkey IS NOT NULL),
        |hb AS (SELECT DISTINCT ${sqlH48("jc", "o_custkey")} AS hv
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |ra AS (SELECT hv, row_number() OVER (ORDER BY hv ASC) AS rn FROM ha),
        |rb AS (SELECT hv, row_number() OVER (ORDER BY hv ASC) AS rn FROM hb),
        |ba AS (SELECT hv FROM ra WHERE rn <= $KmvK),
        |bb AS (SELECT hv FROM rb WHERE rn <= $KmvK),
        |ka AS (SELECT CAST(count(*) AS INT) AS n,
        |    coalesce(max(CASE WHEN rn = $KmvK THEN hv END),
        |             ${TwoPow48.toLong}) AS th
        |  FROM ra WHERE rn <= $KmvK),
        |kb AS (SELECT CAST(count(*) AS INT) AS n,
        |    coalesce(max(CASE WHEN rn = $KmvK THEN hv END),
        |             ${TwoPow48.toLong}) AS th
        |  FROM rb WHERE rn <= $KmvK),
        |p AS (SELECT least(ka.th, kb.th) AS theta, ka.th AS th_a,
        |    kb.th AS th_b, ka.n AS n_a, kb.n AS n_b FROM ka, kb),
        |i AS (SELECT CAST(count(*) AS INT) AS n_inter
        |  FROM ba JOIN bb ON ba.hv = bb.hv, p WHERE ba.hv < p.theta),
        |nb AS (SELECT CAST(count(*) AS INT) AS n_b_ret
        |  FROM bb, p WHERE bb.hv < p.theta)
        |SELECT p.theta, i.n_inter, nb.n_b_ret,
        |  CASE WHEN p.n_a < $KmvK THEN CAST(p.n_a AS DOUBLE)
        |       ELSE ${(KmvK - 1).toDouble * TwoPow48} / p.th_a
        |  END AS est_build,
        |  CASE WHEN p.n_b < $KmvK THEN CAST(p.n_b AS DOUBLE)
        |       ELSE ${(KmvK - 1).toDouble * TwoPow48} / p.th_b
        |  END AS est_probe,
        |  CAST(i.n_inter AS DOUBLE) * $TwoPow48 / p.theta AS est_inter,
        |  CAST(i.n_inter AS DOUBLE) / nb.n_b_ret AS containment
        |FROM p, i, nb""".stripMargin,
    "sketch_equidepth_hist" ->
      s"""WITH e AS (SELECT event_type, value,
        |    ${sqlH48("qtl", "event_id")} AS hv
        |  FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
        |  FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY hv, value) AS rn
        |  FROM e),
        |v AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value) AS vr,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS INT) AS ns
        |  FROM r WHERE rn <= $QtlK),
        |idx AS (SELECT CAST(i AS INT) AS bucket
        |  FROM UNNEST(range(1, $HistBuckets)) u(i))
        |SELECT v.event_type, n.n_total, max(ns) AS n_sample, bucket,
        |  max(CASE WHEN vr = (bucket * ns + ${HistBuckets - 1})
        |                     // $HistBuckets
        |      THEN value END) AS boundary
        |FROM v JOIN n ON v.event_type = n.event_type CROSS JOIN idx
        |GROUP BY v.event_type, n.n_total, bucket
        |ORDER BY v.event_type, bucket""".stripMargin,
    "sketch_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
        |    ${sqlH48("kmv", "user_id")} AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
        |  FROM h)
        |SELECT event_type,
        |  CAST(CASE WHEN count(*) >= $KmvK THEN $KmvK
        |            ELSE count(*) END AS INT) AS n_kept,
        |  max(CASE WHEN rn = $KmvK THEN hv END) AS kth,
        |  CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE)
        |       ELSE ${(KmvK - 1).toDouble * TwoPow48}
        |            / max(CASE WHEN rn = $KmvK THEN hv END)
        |  END AS est_distinct
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sketch_hll" ->
      s"""WITH h AS (SELECT event_type,
        |    ${sqlH48("hll", "user_id")} AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT event_type, hv % $HllM AS j, hv // $HllM AS w FROM h),
        |rho AS (SELECT event_type, j,
        |    max(CASE WHEN w = 0 THEN $HllMaxRho
        |             ELSE $HllMaxRho - length(bin(w)) END) AS mj
        |  FROM b GROUP BY 1, 2),
        |grid AS (SELECT event_type, CAST(j AS BIGINT) AS j
        |  FROM (SELECT DISTINCT event_type FROM events
        |        WHERE user_id IS NOT NULL), UNNEST(range(0, $HllM)) u(j)),
        |regs AS (SELECT g.event_type, g.j, coalesce(r.mj, 0) AS mj
        |  FROM grid g LEFT JOIN rho r
        |    ON r.event_type = g.event_type AND r.j = g.j),
        |agg AS (SELECT event_type,
        |    CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS INT) AS v_zero,
        |    CAST(sum(CAST(1 AS BIGINT) << ($HllMaxRho - mj)) AS BIGINT)
        |      AS s_scaled
        |  FROM regs GROUP BY event_type)
        |SELECT event_type, v_zero, s_scaled,
        |  $HllC / CAST(s_scaled AS DOUBLE) AS est_raw,
        |  CASE WHEN v_zero > 0
        |        AND $HllC / CAST(s_scaled AS DOUBLE) <= ${2.5 * HllM}
        |       THEN CAST($HllM AS DOUBLE) * CAST(CAST(
        |            ln(CAST($HllM AS DOUBLE) / v_zero)
        |            AS DECIMAL(18,9)) AS DOUBLE)
        |       ELSE $HllC / CAST(s_scaled AS DOUBLE)
        |  END AS est_distinct
        |FROM agg ORDER BY event_type""".stripMargin,
    "sketch_cms_topk" ->
      s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |pos AS (SELECT user_id, r,
        |    ${sqlH48Salted("cms", "r", "user_id")} % $CmsW AS b
        |  FROM e, UNNEST(range(0, $CmsD)) u(r)),
        |cnt AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
        |  FROM pos GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT user_id, r, b FROM pos),
        |est AS (SELECT user_id, CAST(min(c) AS BIGINT) AS est_cnt
        |  FROM cand JOIN cnt USING (r, b) GROUP BY user_id),
        |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM e GROUP BY user_id)
        |SELECT user_id, est_cnt, exact_cnt
        |FROM est JOIN ex USING (user_id)
        |ORDER BY est_cnt DESC, user_id ASC LIMIT 10""".stripMargin,
    "sketch_bloom_join" ->
      s"""WITH build AS (SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |msel AS (SELECT CAST(count(*) AS BIGINT) AS n_build,
        |    CAST(1 AS BIGINT)
        |      << length(bin(greatest(16 * count(*), 2) - 1)) AS m
        |  FROM build),
        |bits AS (SELECT DISTINCT
        |    ${sqlH48Salted("blm", "i", "c_custkey")}
        |      % (SELECT m FROM msel) AS p
        |  FROM build, UNNEST(range(0, $BloomK)) u(i)),
        |probe AS (SELECT o_orderkey, o_custkey,
        |    ${sqlH48Salted("blm", "i", "o_custkey")}
        |      % (SELECT m FROM msel) AS p
        |  FROM orders, UNNEST(range(0, $BloomK)) u(i)),
        |flags AS (SELECT o_orderkey, max(o_custkey) AS o_custkey,
        |    sum(CASE WHEN bits.p IS NOT NULL THEN 1 ELSE 0 END) AS nm
        |  FROM probe LEFT JOIN bits ON probe.p = bits.p
        |  GROUP BY o_orderkey),
        |f2 AS (SELECT o_orderkey, (nm = $BloomK) AS pass,
        |    (o_custkey IN (SELECT c_custkey FROM build)) AS tru
        |  FROM flags)
        |SELECT (SELECT n_build FROM msel) AS n_build,
        |  (SELECT m FROM msel) AS m,
        |  (SELECT CAST(count(*) AS INT) FROM bits) AS n_bits,
        |  CAST(count(*) AS BIGINT) AS n_probe,
        |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(sum(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |  CAST(sum(CASE WHEN pass AND NOT tru THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fp
        |FROM f2""".stripMargin,
    "sketch_quantiles" ->
      s"""WITH e AS (SELECT event_type, value,
        |    ${sqlH48("qtl", "event_id")} AS hv
        |  FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
        |  FROM e GROUP BY 1),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY hv, value) AS rn
        |  FROM e),
        |v AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value) AS vr,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS INT) AS ns
        |  FROM r WHERE rn <= $QtlK)
        |SELECT v.event_type, n.n_total, max(ns) AS n_sample,
        |${QtlQs.map { case (nm, num, den) =>
             s"  max(CASE WHEN vr = ($num * ns + ${den - 1}) // $den" +
             s" THEN value END) AS $nm" }.mkString(",\n")}
        |FROM v JOIN n ON v.event_type = n.event_type
        |GROUP BY v.event_type, n.n_total
        |ORDER BY v.event_type""".stripMargin,
    "sketch_theta_ops" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
        |    ${sqlH48("kmv", "user_id")} AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY hv ASC) AS rn
        |  FROM h),
        |bot AS (SELECT event_type, hv FROM r WHERE rn <= $KmvK),
        |k AS (SELECT event_type,
        |    coalesce(max(CASE WHEN rn = $KmvK THEN hv END),
        |             ${TwoPow48.toLong}) AS th
        |  FROM r WHERE rn <= $KmvK GROUP BY event_type),
        |p AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
        |    least(a.th, b.th) AS theta
        |  FROM k a JOIN k b ON a.event_type < b.event_type),
        |i AS (SELECT p.et_a, p.et_b, CAST(count(*) AS INT) AS n_inter
        |  FROM p JOIN bot x ON x.event_type = p.et_a AND x.hv < p.theta
        |         JOIN bot y ON y.event_type = p.et_b AND y.hv = x.hv
        |  GROUP BY 1, 2),
        |u AS (SELECT p.et_a, p.et_b,
        |    CAST(count(DISTINCT z.hv) AS INT) AS n_union
        |  FROM p JOIN bot z ON z.event_type IN (p.et_a, p.et_b)
        |                   AND z.hv < p.theta
        |  GROUP BY 1, 2)
        |SELECT p.et_a, p.et_b, p.theta,
        |  coalesce(i.n_inter, 0) AS n_inter, u.n_union,
        |  CAST(coalesce(i.n_inter, 0) AS DOUBLE) * $TwoPow48 / p.theta
        |    AS est_inter,
        |  CAST(u.n_union AS DOUBLE) * $TwoPow48 / p.theta AS est_union,
        |  CAST(coalesce(i.n_inter, 0) AS DOUBLE) / u.n_union AS jaccard
        |FROM p LEFT JOIN i ON i.et_a = p.et_a AND i.et_b = p.et_b
        |       JOIN u ON u.et_a = p.et_a AND u.et_b = p.et_b
        |ORDER BY p.et_a, p.et_b""".stripMargin)
}
