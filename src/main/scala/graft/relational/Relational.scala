package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Fp, QueryModule}
import graft.sources.Tables

/** Core relational block (SURVEY §2 K): the day-to-day query surface a
  * user of the reference's warehouse runs — scan/filter/agg, multi-way
  * joins, semi/anti joins, windows, rollups, approximate aggregates.
  *
  * Scale notes: every aggregate is a hash aggregate with map-side
  * partial combine; top-N uses orderBy+limit which Spark executes as
  * TakeOrderedAndProject (no global sort materialization); dimension
  * sides of joins are `broadcast()`-hinted so the fact table never
  * shuffles for them.
  */
object Relational extends QueryModule {

  /** K1 — TPC-H Q1-style pricing summary (flagship). One shuffle. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Fp.dsum2(col("l_quantity")).as("sum_qty"),
        Fp.dsum2(col("l_extendedprice")).as("sum_base_price"),
        Fp.dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Fp.davg(col("l_quantity")).as("avg_qty"),
        Fp.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** K2 — TPC-H Q3-style shipping priority: 3-way join, top-10 revenue.
    * customer is the small side at any SF ratio → broadcast; the
    * orders⋈lineitem join shuffles on orderkey only once.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(Fp.dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** K3a — EXISTS: customers holding at least one urgent order.
    * left_semi keeps only the probe side → no row multiplication.
    */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** K3b — NOT EXISTS: customers with no urgent orders. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** K4 — window rank: top-3 orders by value within each priority.
    * Single shuffle on the partition key; row_number (not rank) with a
    * key tiebreak keeps the result deterministic.
    */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_orderpriority", "rnk")
  }

  /** K5 — ROLLUP subtotal hierarchy over returnflag/linestatus. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(Fp.dsum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** K5b — CUBE over order status × priority (all grouping sets). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(Fp.dsum2(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))
  }

  /** K18 — explicit GROUPING SETS (the general form K5's ROLLUP/CUBE
    * are sugar for): per (flag, status), per flag, and grand total in
    * ONE scan + one Expand — not three unioned aggregates. grouping_id
    * disambiguates a NULL group key from a rolled-up one; Spark 4's
    * `Dataset.groupingSets` plans the same Expand+partial-agg shape as
    * cube/rollup, so map-side combine still applies at 100 TB.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        Fp.dsum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")
      .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))
  }

  /** K19 — set operations (INTERSECT / EXCEPT): the year-over-year
    * customer-churn question every warehouse asks. Spark plans these
    * as aggregate/anti-join shapes on the distinct key sets — the key
    * sets are the small derived frames, never the fact table itself.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def buyers(year: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val y95 = buyers(1995)
    val y96 = buyers(1996)
    y95.intersect(y96).withColumn("tag", lit("both"))
      .unionByName(y95.except(y96).withColumn("tag", lit("only_1995")))
      .unionByName(y96.except(y95).withColumn("tag", lit("only_1996")))
      .select("tag", "o_custkey")
      .orderBy("tag", "o_custkey")
  }

  /** K34 — bag-semantics set operations (EXCEPT ALL / INTERSECT ALL),
    * the multiplicity-preserving complement to K19: a customer with
    * three '95 orders and one '96 order contributes TWO rows to the
    * except-all — the semantics dedup accounting and reconciliation
    * actually need. Spark plans these as co-partitioned
    * count-difference generators on the key sets; output is
    * re-aggregated to (tag, key, multiplicity) so the gate stays
    * order-stable.
    */
  def qSetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    def keys(year: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select("o_custkey")
    val y95 = keys(1995)
    val y96 = keys(1996)
    y95.exceptAll(y96).withColumn("tag", lit("except_all_95_96"))
      .unionByName(y95.intersectAll(y96)
        .withColumn("tag", lit("intersect_all")))
      .groupBy("tag", "o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("tag", "o_custkey")
  }

  /** K25 — FULL OUTER join: reconcile two activity ledgers (viewers
    * vs purchasers per user) keeping rows unmatched on either side —
    * the reconciliation shape finance/data-quality jobs run. Both
    * inputs are user-level aggregates, so the outer join shuffles
    * O(users) rows, never the event volume; the `Seq`-key join
    * coalesces the key exactly like SQL `USING`.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("n_views"))
    val p = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    v.join(p, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        when(col("n_views").isNull, "buy_only")
          .when(col("n_purchases").isNull, "view_only")
          .otherwise("both").as("segment"))
      .orderBy("user_id")
  }

  /** K26 — LATERAL array explode with position: the leading tokens of
    * every 25th document as (doc_id, pos, token) rows — the
    * generator/flatten shape (`posexplode` = `LATERAL unnest WITH
    * ORDINALITY`). Map-only: the explode runs inside the scan stage
    * with the position filter applied before anything shuffles.
    */
  def qLateral(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(col("pos") < 3)
      .select(col("doc_id"), col("pos"), col("col").as("token"))
      .orderBy("doc_id", "pos")

  /** K32 — promo revenue share per month (TPC-H Q14 shape): the
    * conditional-aggregate ratio query, and the query that puts the
    * `part` dimension to work. One broadcast dim join + one grouped
    * aggregate; both revenue sums are exact decimals, the ratio is a
    * single double division.
    */
  def qPromoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        Fp.dsum6(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(0.0)).as("promo_rev"),
        Fp.dsum6(col("rev")).as("total_rev"))
      // nullif: a month where every rev is exactly 0.0 must yield a
      // null share, not an ANSI divide-by-zero (the divisor-zero
      // check fires before the null-numerator check)
      .withColumn("promo_share_pct",
        lit(100.0) * col("promo_rev") / nullif(col("total_rev"), lit(0.0)))
      .orderBy("month")
  }

  /** K33 — top suppliers by quarter revenue (TPC-H Q15 shape): the
    * `supplier` dimension's query. Fact-side aggregate first (one
    * shuffle on suppkey), then a broadcast dim join on the top-10 —
    * the dimension never touches the fact shuffle.
    */
  def qTopSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(Fp.dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_rev"))
      .orderBy(desc("total_rev"), asc("l_suppkey"))
      .limit(10)
    rev.join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("suppkey"), col("s_name"),
        col("total_rev"))
      .orderBy(desc("total_rev"), asc("suppkey"))
  }

  /** K6 — approximate distinct (HLL) + approximate quantiles: the
    * constant-memory path for 100 TB cardinality/percentile questions.
    * No SQL oracle (sketch internals are engine-specific); spec asserts
    * tolerance vs exact.
    */
  def approxOf(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_orderkey", 0.01).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median_price"))
      .orderBy("l_returnflag")

  def qApprox(spark: SparkSession, dir: String): DataFrame =
    approxOf(Tables.lineitem(spark, dir))

  override def queries: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_rank" -> (qWindowRank _),
    "rollup_agg" -> (rollupAgg _),
    "cube_agg" -> (cubeAgg _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_set_ops" -> (qSetOps _),
    "q_set_ops_all" -> (qSetOpsAll _),
    "q_full_outer" -> (qFullOuter _),
    "q_lateral" -> (qLateral _),
    "q_promo_share" -> (qPromoShare _),
    "q_top_suppliers" -> (qTopSuppliers _),
    "q_approx" -> (qApprox _))

  override def oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${Fp.sqlSum2("l_quantity")} AS sum_qty,
        |  ${Fp.sqlSum2("l_extendedprice")} AS sum_base_price,
        |  ${Fp.sqlSum2("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        |  ${Fp.sqlAvg("l_quantity")} AS avg_qty,
        |  ${Fp.sqlAvg("l_discount")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      s"""SELECT l_orderkey,
        |  ${Fp.sqlSum2("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, CAST(rnk AS INTEGER) AS rnk, o_orderkey, totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    round(o_totalprice, 2) AS totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "rollup_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${Fp.sqlSum2("l_quantity")} AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "cube_agg" ->
      s"""SELECT o_orderstatus, o_orderpriority,
        |  ${Fp.sqlSum2("o_totalprice")} AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  ${Fp.sqlSum2("l_quantity")} AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_set_ops_all" ->
      """WITH y95 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |y96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT * FROM (
        |  SELECT 'except_all_95_96' AS tag, o_custkey, count(*) AS n
        |  FROM (SELECT o_custkey FROM y95
        |        EXCEPT ALL SELECT o_custkey FROM y96)
        |  GROUP BY 2
        |  UNION ALL
        |  SELECT 'intersect_all', o_custkey, count(*)
        |  FROM (SELECT o_custkey FROM y95
        |        INTERSECT ALL SELECT o_custkey FROM y96)
        |  GROUP BY 2)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_promo_share" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  ${Fp.sqlSum6("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_rev,
        |  ${Fp.sqlSum6("l_extendedprice * (1.0 - l_discount)")} AS total_rev,
        |  100.0 * ${Fp.sqlSum6("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
        |    / NULLIF(${Fp.sqlSum6("l_extendedprice * (1.0 - l_discount)")}, 0.0) AS promo_share_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "q_top_suppliers" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey,
        |    ${Fp.sqlSum2("l_extendedprice * (1.0 - l_discount)")} AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1
        |  ORDER BY total_rev DESC, l_suppkey ASC LIMIT 10)
        |SELECT l_suppkey AS suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY total_rev DESC, suppkey ASC""".stripMargin,
    "q_full_outer" ->
      """WITH v AS (SELECT user_id, count(*) AS n_views FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT user_id, count(*) AS n_purchases FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id,
        |  coalesce(v.n_views, 0) AS n_views,
        |  coalesce(p.n_purchases, 0) AS n_purchases,
        |  CASE WHEN v.n_views IS NULL THEN 'buy_only'
        |       WHEN p.n_purchases IS NULL THEN 'view_only'
        |       ELSE 'both' END AS segment
        |FROM v FULL OUTER JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_lateral" ->
      """SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, token
        |FROM (SELECT doc_id, unnest(toks[1:3]) AS token,
        |        unnest(range(1, CAST(least(3, len(toks)) AS BIGINT) + 1))
        |          AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents WHERE doc_id % 25 = 0))
        |ORDER BY doc_id, pos""".stripMargin,
    "q_set_ops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT 'both' AS tag, o_custkey FROM
        |  (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
        |UNION ALL
        |SELECT 'only_1995', o_custkey FROM
        |  (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
        |UNION ALL
        |SELECT 'only_1996', o_custkey FROM
        |  (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
        |ORDER BY tag, o_custkey""".stripMargin)
}
