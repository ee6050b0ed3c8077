package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Fp, QueryModule}
import graft.sources.Tables

/** K64 — the SALTED JOIN a planner runs once K53's skew report says a
  * plain hash join would knee (one hot key = one straggler task
  * holding the whole stage; at 100 TB a single 5% key serializes 5 TB
  * through one executor). K53 diagnoses; this ACTS — the last
  * diagnose-without-act face of the operations story.
  *
  * ONE-JOIN plan (the standard skew-salting transform, here as a
  * reusable operator instead of a hand-rolled query): every fact row
  * gets a salt column — hot keys a deterministic spread (the shared
  * 48-bit md5 of their PRIMARY key, mod [[SaltFactor]]), cold keys a
  * constant 0 — and every dim row replicates across all
  * [[SaltFactor]] salts when hot, or carries the single 0 salt when
  * cold; the join runs ONCE on (key, salt), so one hot key's probe
  * work spreads over S tasks instead of one. (Round 16 rewrite: the
  * original two-path hot/cold plan scanned the fact side twice more
  * than necessary — hot-filter scan + cold-filter scan + union — and
  * StressJoin measured it LOSING to the plain join even at an
  * 80%-hot fixture; folding both paths into one salt projection
  * removes a full fact scan and the union, leaving the hot-head
  * count as the only overhead vs plain.)
  *
  * Spark's own AQE skew split (`spark.sql.adaptive.skewJoin`) is the
  * runtime answer for splittable sort-merge/shuffled-hash skew; this
  * static operator is the deterministic insurance for shapes AQE
  * cannot split, and the K70 advisor only routes here when the hot
  * key's absolute volume exceeds the task budget.
  *
  * The hot set is the top-[[HotK]] keys by exact count ((cnt desc,
  * key asc) tie-break) — a BOUNDED driver list (the probe-set /
  * boundary-literals collect pattern); at a deployment the threshold
  * comes from the K53 report (skew × per-key bytes vs task budget),
  * and the head-of-distribution choice keeps the fixture exercising
  * both paths on ANY key distribution, skewed or not.
  *
  * Salting is an EXECUTION transform only: the result is
  * row-identical to the plain join, which is exactly what the gate
  * proves — the oracle is the PLAIN SQL join, so a hash match means
  * the two-path plan reconstructed it bit-for-bit (the spec pins the
  * same against the plain Spark join, plus the plan shape: two joins
  * and a union, hot dim rows replicated ×S).
  */
object SkewJoin extends QueryModule {

  val HotK = 16
  val SaltFactor = 8

  /** Top-[[HotK]] keys (cnt desc, key asc) from a (key, cnt) frame —
    * the bounded driver list both [[salted]] and the K70 auto-router
    * derive from the same key-count aggregate.
    */
  def hotKeys(keyCounts: DataFrame, keyCol: String): Array[Long] =
    keyCounts
      .orderBy(desc("cnt"), asc(keyCol))
      .limit(HotK)
      .collect().map(_.getLong(0)).sorted

  /** Two-path salted equi-join of `facts` (carrying `factKey` and a
    * unique `saltBy` column to derive the per-row salt) against
    * `dim` on `dimKey`. Returns the joined frame, result-identical
    * to `facts.join(dim, factKey === dimKey)`.
    */
  def salted(facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, saltBy: String,
      precomputedHot: Option[Array[Long]] = None): DataFrame = {
    // hot set from the caller when it already paid the fact key-count
    // pass (the K70 advisor's stats aggregate produces exactly this
    // frame — recomputing it here doubled the fact scans of every
    // auto-routed salt join)
    val hot = precomputedHot.getOrElse(
      hotKeys(facts.groupBy(factKey).agg(count(lit(1)).as("cnt")), factKey))
    val saltExpr = expr(
      s"""cast(conv(substring(md5(concat('salt|', cast($saltBy as string))),
         |  1, 12), 16, 10) as bigint) % $SaltFactor""".stripMargin)
    // hot facts spread over S salts, cold facts pinned to salt 0; hot
    // dim rows replicate xS (cold keys never meet hot replicas — the
    // equi-join on the key separates them), so each fact row matches
    // its dim partner under exactly ONE salt
    val f = facts.withColumn("salt",
      when(col(factKey).isin(hot: _*), saltExpr).otherwise(lit(0L)))
    val d = dim.withColumn("salt", explode(
      when(col(dimKey).isin(hot: _*),
        expr(s"sequence(0L, ${SaltFactor - 1}L)"))
        .otherwise(expr("array(0L)"))))
    f.join(d, col(factKey) === col(dimKey) && f("salt") === d("salt"))
      .drop("salt")
  }

  /** K64 gate query — orders salted-joined to customer, aggregated
    * per market segment. The oracle is the PLAIN join + group-by:
    * hash equality proves the salting transform changed the
    * execution and nothing else.
    */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_custkey").isNotNull)
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment")
    salted(o, c, "o_custkey", "c_custkey", "o_orderkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Fp.dsum2(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  override def queries: Map[String, Q] = Map(
    "q_skew_join_salted" -> (saltedJoinAgg _))

  override def oracles: Map[String, String] = Map(
    "q_skew_join_salted" ->
      s"""SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  ${Fp.sqlSum2("o_totalprice")} AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_custkey IS NOT NULL
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
}
