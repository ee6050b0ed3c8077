package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** K70 — the JOIN STRATEGY ADVISOR: the decision table a cost-based
  * planner derives from the diagnostics this engine already gates,
  * closing the ANALYZE→plan arc as one queryable operator. Every
  * input is an operator that exists on its own (K53's key-skew form,
  * K52's cardinalities, the K38/K66 bloom economics, K64's salt
  * trigger); this composes them into the action a deployment actually
  * takes per join:
  *
  *  - `broadcast` when the dim side is small ([[BroadcastRows]]) —
  *    no shuffle at all;
  *  - else `bloom` when the dim is SELECTIVE against the fact keys
  *    ([[BloomSelPpm]]): a constant-size filter drops most fact rows
  *    before they shuffle (K66's executor);
  *  - else `salt` when the fact key is skewed ([[SaltSkewX100]], the
  *    K53 skew form — max key's multiple of a uniform share) AND the
  *    hot key's ABSOLUTE row volume exceeds the per-task budget
  *    (`saltHotRows`): what actually OOMs or straggles a reducer is
  *    the hot key's VOLUME through one task, not its ratio to a
  *    uniform share — a 3× skew over 7-row keys is harmless, and
  *    StressJoin's r15 artifact showed the salted plan LOSING on
  *    exactly that shape (overhead of the extra fact-side passes with
  *    no straggler to fix). Spread the hot head (K64's executor) only
  *    when both hold. Bloom outranks salt because the semi-join
  *    reduction is the cheaper transform and shrinks the stage the
  *    salt would otherwise have to widen. Note Spark's own AQE skew
  *    split (`spark.sql.adaptive.skewJoin`) mitigates sort-merge /
  *    shuffled-hash skew at runtime; the static salt arm is the
  *    deterministic insurance for shapes AQE cannot split (measured
  *    in STRESSJOIN's hot-key fixture with the runtime mitigation
  *    disabled);
  *  - else `shuffle`: the plain co-partitioned hash join is already
  *    right.
  *
  * Thresholds here are REALISTIC (1000-row broadcast cap, ≤50%
  * survivor selectivity, ≥3× uniform skew, and a hot-key task budget
  * of [[SaltHotRowsDefault]] rows ≈ 128 MB of 32-byte fact rows — the
  * default `spark.sql.files.maxPartitionBytes` worth of work). The
  * GATE queries pass [[GateSaltHotRows]] instead — the budget scaled
  * to the sf0.01 corpus the same way the bloom gate scales m to the
  * dim ndv — so all four arms keep firing on the real gate corpus and
  * the routing CASE stays fully inside the hash gate: supplier/nation
  * broadcast, the urgent-orders dim blooms, lineitem⋈orders salts
  * (13-line max orders vs ~4 uniform = 3.19×, 7 ≥ the gate budget),
  * customer/part shuffle.
  *
  * Scale shape per candidate: ONE map-side-combined count-groupBy on
  * the fact key (the K53 shape — survives the skew it measures), then
  * everything else joins/aggregates on the O(ndv) key frame and the
  * O(1) totals — never a fact×dim row join. At 100 TB the key frame
  * is the expensive-but-linear pass a nightly ANALYZE amortizes; the
  * sketch family (K35/K52) is the documented cheaper estimator when
  * exact ndv passes are too dear.
  */
object JoinPlanner extends QueryModule {

  val BroadcastRows = 1000L
  val BloomSelPpm = 500000L
  val SaltSkewX100 = 300L

  /** Deployment default for the salt arm's hot-key task budget: rows
    * of ONE key a single reducer can hold before it straggles ≈
    * 128 MB (`spark.sql.files.maxPartitionBytes`) of ~32-byte joined
    * fact rows. Deployments size this to their executors, exactly as
    * they size the bloom's m to the dim ndv.
    */
  val SaltHotRowsDefault = 4000000L

  /** The gate-scale task budget (sf0.01 has ≤7-line orders): keeps
    * every arm of the decision tree firing inside the hash gate.
    */
  val GateSaltHotRows = 4L

  /** (name, fact table, fact key, dim SQL producing one column `k`). */
  private val candidates: Seq[(String, String, String, String)] = Seq(
    ("cust_nation", "customer", "c_nationkey",
      "SELECT n_nationkey AS k FROM nation"),
    ("li_orders", "lineitem", "l_orderkey",
      "SELECT o_orderkey AS k FROM orders"),
    ("li_orders_urgent", "lineitem", "l_orderkey",
      "SELECT o_orderkey AS k FROM orders " +
        "WHERE o_orderpriority = '1-URGENT'"),
    ("li_part", "lineitem", "l_partkey",
      "SELECT p_partkey AS k FROM part"),
    ("li_supplier", "lineitem", "l_suppkey",
      "SELECT s_suppkey AS k FROM supplier"),
    ("ord_customer", "orders", "o_custkey",
      "SELECT c_custkey AS k FROM customer"))

  /** The one-row decision frame for a (facts, dim) candidate. `dim`
    * must be a unique-key frame (all candidates are key tables).
    */
  /** The fact-side key-count frame (one map-side-combined pass over
    * the facts) — the expensive-but-linear input every decision
    * derives from, factored out so callers that need it TWICE (the
    * auto-router's stats + the salt arm's hot head;
    * join_strategy_plan's two candidates over the same fact key) can
    * compute it once.
    */
  private[relational] def keyCounts(facts: DataFrame,
      factKey: String): DataFrame =
    facts.filter(col(factKey).isNotNull)
      .groupBy(col(factKey).as("k"))
      .agg(count(lit(1)).as("cnt"))

  private[relational] def strategyOf(facts: DataFrame, factKey: String,
      dim: DataFrame, name: String,
      saltHotRows: Long = SaltHotRowsDefault): DataFrame =
    strategyOfKc(keyCounts(facts, factKey), dim, name, saltHotRows)

  private[relational] def strategyOfKc(kc: DataFrame,
      dim: DataFrame, name: String, saltHotRows: Long): DataFrame = {
    // group (not a marker column) so a duplicate dim key cannot fan
    // out the stats left join — uniqueness enforcement lives INSIDE
    // the one-pass aggregate instead of a caller-side distinct()
    // shuffle; m carries the multiplicity so n_dim stays the true
    // dim ROW count (what a broadcast would actually ship)
    val dk = dim.select(col("k")).groupBy("k")
      .agg(count(lit(1)).as("m"))
    val nd = dk.agg(coalesce(sum("m"), lit(0L)).as("n_dim"))
    kc.join(dk, Seq("k"), "left_outer")
      .agg(sum("cnt").as("n_fact"),
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_key_cnt"),
        sum(when(col("m").isNotNull, col("cnt")).otherwise(0L))
          .as("n_match"))
      .crossJoin(broadcast(nd))
      // ratios in decimal(38,0): max_key_cnt * n_keys * 100 overflows
      // Long around 10^8 hot-key count × 10^9 ndv (the 100 TB shape),
      // and a wrapped negative would silently misroute the join;
      // decimal floor-div is exact, so gate values are unchanged
      .withColumn("skew_x100",
        expr("cast((cast(max_key_cnt as decimal(38,0)) * n_keys * 100)" +
          " div n_fact as bigint)"))
      .withColumn("sel_ppm",
        expr("cast((cast(n_match as decimal(38,0)) * 1000000)" +
          " div n_fact as bigint)"))
      .withColumn("strategy",
        when(col("n_dim") <= BroadcastRows, "broadcast")
          .when(col("sel_ppm") <= BloomSelPpm, "bloom")
          .when(col("skew_x100") >= SaltSkewX100 &&
            col("max_key_cnt") >= saltHotRows, "salt")
          .otherwise("shuffle"))
      .withColumn("join_name", lit(name))
      .select("join_name", "n_fact", "n_dim", "n_keys", "max_key_cnt",
        "skew_x100", "sel_ppm", "strategy")
  }

  /** The Spark-side dim frames, same shapes as the oracle's dim SQL
    * snippets (one column `k`, unique keys).
    */
  private def dimOf(spark: SparkSession, dir: String,
      name: String): DataFrame = name match {
    case "cust_nation" =>
      Tables.table(spark, dir, "nation").select(col("n_nationkey").as("k"))
    case "li_orders" =>
      Tables.orders(spark, dir).select(col("o_orderkey").as("k"))
    case "li_orders_urgent" =>
      Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"))
    case "li_part" =>
      Tables.table(spark, dir, "part").select(col("p_partkey").as("k"))
    case "li_supplier" =>
      Tables.table(spark, dir, "supplier").select(col("s_suppkey").as("k"))
    case "ord_customer" =>
      Tables.customer(spark, dir).select(col("c_custkey").as("k"))
  }

  // One lazy union action on purpose: all six candidates' aggregates
  // run inside a single job with full parallelism (the overlap §2.6
  // asks for, already free here). A checkpoint-the-kc variant that
  // shared the duplicated lineitem/l_orderkey aggregate between
  // li_orders and li_orders_urgent was MEASURED SLOWER at sf0.1
  // (0.5→0.8 s: materializing ndv-sized key frames + serializing the
  // prep jobs costs more than the one duplicated map-side-combined
  // aggregate) — and at scale an ndv-sized checkpoint is its own
  // memory bill, so the lazy form stays.
  def joinStrategyPlan(spark: SparkSession, dir: String): DataFrame =
    candidates.map { case (name, ft, fk, _) =>
      strategyOf(Tables.table(spark, dir, ft), fk,
        dimOf(spark, dir, name), name, GateSaltHotRows)
    }.reduce(_.unionByName(_)).orderBy("join_name")

  /** K73 — the advisor's EXECUTOR: measure the candidate with
    * [[strategyOf]], then DISPATCH the join through the chosen arm's
    * operator — `broadcast` hint, K66 bloom pre-filter, K64 salted
    * two-path, or the plain shuffle join. Every arm is result-
    * identical to the plain join (each operator's own gate proves its
    * transform is semantics-free), so auto-routing is safe by
    * construction; the decision row is ONE bounded driver collect
    * (the hot-keys / boundary-literals pattern — at a deployment this
    * is the planner consulting last night's ANALYZE output).
    * Returns (chosen strategy, joined frame).
    */
  def autoJoined(facts: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, saltBy: String,
      saltHotRows: Long = SaltHotRowsDefault)
      : (String, DataFrame) = {
    // duplicate dim keys cannot skew the measure: strategyOf groups
    // the dim side inside its one-pass stats aggregate (no standalone
    // distinct() shuffle on this path). The fact key-count frame is
    // checkpointed because the salt arm consumes it AGAIN for its hot
    // head — the unshared form paid a second full fact aggregate.
    val kc = keyCounts(facts, factKey).localCheckpoint(true)
    val strategy = strategyOfKc(kc,
      dim.select(col(dimKey).as("k")), "auto", saltHotRows)
      .collect()(0).getAs[String]("strategy")
    val joined = strategy match {
      case "broadcast" =>
        facts.join(broadcast(dim), col(factKey) === col(dimKey))
      case "bloom" =>
        BloomJoin.bloomFiltered(facts, factKey, dim, dimKey)
          .join(dim, col(factKey) === col(dimKey))
      case "salt" =>
        SkewJoin.salted(facts, dim, factKey, dimKey, saltBy,
          Some(SkewJoin.hotKeys(kc, "k")))
      case _ =>
        facts.join(dim, col(factKey) === col(dimKey))
    }
    (strategy, joined)
  }

  /** K73 gate — lineitem auto-joined to orders (at the gate SF the
    * measured skew is 3.19× ≥ the salt threshold, so the SALT arm
    * dispatches; at other scales another arm may win — the OUTPUT is
    * arm-independent by the identity each arm gates). The emitted
    * `strategy` column is the driver-collected decision, and the
    * oracle REPLAYS the decision CASE from the same stats — so the
    * hash checks the routing itself cross-engine, not only the join.
    */
  def autoJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("li_pk", expr("l_orderkey * 10 + l_linenumber"))
    val dim = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
    val (strategy, joined) = autoJoined(facts, "l_orderkey", dim,
      "o_orderkey", "li_pk", GateSaltHotRows)
    joined
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.Fp.dsum2(col("l_extendedprice")).as("sum_price"))
      .withColumn("strategy", lit(strategy))
      .select("o_orderpriority", "n_items", "sum_price", "strategy")
      .orderBy("o_orderpriority")
  }

  override def queries: Map[String, Q] = Map(
    "join_strategy_plan" -> (joinStrategyPlan _),
    "q_auto_join" -> (autoJoinAgg _))

  private def sqlCand(name: String, ft: String, fk: String,
      dimSql: String): String =
    s"""SELECT '$name' AS join_name,
      |  CAST(n_fact AS BIGINT) AS n_fact, CAST(n_dim AS BIGINT) AS n_dim,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST(max_key_cnt AS BIGINT) AS max_key_cnt,
      |  CAST((CAST(max_key_cnt AS HUGEINT) * n_keys * 100) // n_fact
      |    AS BIGINT) AS skew_x100,
      |  CAST((CAST(n_match AS HUGEINT) * 1000000) // n_fact AS BIGINT)
      |    AS sel_ppm,
      |  CASE WHEN n_dim <= $BroadcastRows THEN 'broadcast'
      |       WHEN (CAST(n_match AS HUGEINT) * 1000000) // n_fact
      |           <= $BloomSelPpm THEN 'bloom'
      |       WHEN (CAST(max_key_cnt AS HUGEINT) * n_keys * 100) // n_fact
      |           >= $SaltSkewX100 AND max_key_cnt >= $GateSaltHotRows
      |         THEN 'salt'
      |       ELSE 'shuffle' END AS strategy
      |FROM (SELECT sum(cnt) AS n_fact, count(*) AS n_keys,
      |    max(cnt) AS max_key_cnt,
      |    sum(CASE WHEN m THEN cnt ELSE 0 END) AS n_match
      |  FROM (SELECT kc.cnt, dk.k IS NOT NULL AS m
      |    FROM (SELECT $fk AS k, count(*) AS cnt FROM $ft
      |          WHERE $fk IS NOT NULL GROUP BY 1) kc
      |    LEFT JOIN ($dimSql) dk ON kc.k = dk.k))
      |CROSS JOIN (SELECT count(*) AS n_dim FROM ($dimSql))""".stripMargin

  override def oracles: Map[String, String] = Map(
    "join_strategy_plan" ->
      (candidates.map { case (name, ft, fk, dimSql) =>
        sqlCand(name, ft, fk, dimSql)
      }.mkString("", "\nUNION ALL\n", "\nORDER BY join_name")),
    // the decision CTE replays the K70 stats + CASE for the gate's
    // candidate; the join side is the PLAIN join (every arm is
    // identity-gated by its own operator), so a hash match proves
    // BOTH the routing and the result
    "q_auto_join" ->
      s"""WITH s AS (SELECT sum(cnt) AS n_fact, count(*) AS n_keys,
        |    max(cnt) AS max_key_cnt,
        |    sum(CASE WHEN m THEN cnt ELSE 0 END) AS n_match
        |  FROM (SELECT kc.cnt, dk.k IS NOT NULL AS m
        |    FROM (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem
        |          WHERE l_orderkey IS NOT NULL GROUP BY 1) kc
        |    LEFT JOIN (SELECT o_orderkey AS k FROM orders) dk
        |      ON kc.k = dk.k)),
        |nd AS (SELECT count(*) AS n_dim FROM orders),
        |strat AS (SELECT
        |    CASE WHEN n_dim <= $BroadcastRows THEN 'broadcast'
        |         WHEN (CAST(n_match AS HUGEINT) * 1000000) // n_fact
        |           <= $BloomSelPpm THEN 'bloom'
        |         WHEN (CAST(max_key_cnt AS HUGEINT) * n_keys * 100)
        |             // n_fact >= $SaltSkewX100
        |           AND max_key_cnt >= $GateSaltHotRows THEN 'salt'
        |         ELSE 'shuffle' END AS strategy
        |  FROM s CROSS JOIN nd)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  ${graft.Fp.sqlSum2("l_extendedprice")} AS sum_price,
        |  strat.strategy
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |CROSS JOIN strat
        |GROUP BY o_orderpriority, strat.strategy
        |ORDER BY o_orderpriority""".stripMargin)
}
