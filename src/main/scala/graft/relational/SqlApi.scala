package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Fp, QueryModule}
import graft.sources.Tables

/** SURVEY §2 K (continued) — the SQL-facing surface and the remaining
  * everyday analytics: spark.sql over registered views, window
  * analytics (lead/ntile/cume_dist), calendar functions, exact
  * percentiles. A reference user's ad-hoc SQL runs here unchanged.
  */
object SqlApi extends QueryModule {

  /** K7 — a multi-join aggregation issued as literal SQL through
    * spark.sql over temp views: proves the SQL entry point end to
    * end (parser → Catalyst → same physical plans as the DSL).
    */
  def qSqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v")
    spark.sql(
      s"""SELECT n_name,
         |  ${Fp.sqlSum2("o_totalprice").replace("DECIMAL", "decimal")} AS revenue,
         |  count(*) AS n_orders
         |FROM orders_v
         |JOIN customer_v ON o_custkey = c_custkey
         |JOIN nation_v ON c_nationkey = n_nationkey
         |WHERE o_orderstatus = 'F'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin)
  }

  /** K8 — window analytics battery: lead, ntile, cume_dist over a
    * deterministic ordering.
    */
  def qWindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(asc("totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .withColumn("next_price", lead("totalprice", 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("o_orderpriority", "totalprice", "o_orderkey")
  }

  /** K9 — calendar derivations (year/quarter/month/weekday, month
    * arithmetic, truncation).
    */
  def qDateOps(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 250 === 0)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd")
          .as("q_start"))
      .orderBy("o_orderkey")
  }

  /** K10 — exact interpolated median + p90 per group (the exact
    * complement to q_approx's sketches).
    */
  def qMedian(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** K14 — semi-structured ops: extract a field from the events
    * stream's JSON `props` payload and aggregate it — the everyday
    * "my event log carries a JSON blob" query. `get_json_object`
    * evaluates inside codegen (no UDF); at scale this is a map-only
    * parse feeding a partial aggregate.
    */
  def qJsonOps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** K15 — unpivot/melt: the four lineitem measures as (metric, val)
    * rows, re-aggregated per metric — wide→long reshaping without N
    * scans (Spark's `unpivot` Expand node reads the table once).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), Fp.dsum2(col("val")).as("sum_val"))
      .orderBy("metric")

  /** K20 — correlated scalar subquery: orders priced far above their
    * own customer's average — the classic "vs my group's baseline"
    * ad-hoc query. Catalyst decorrelates the subquery into ONE
    * aggregate + join (never a per-row re-scan), so the 100 TB plan is
    * two passes over orders, not N. The inner mean uses the exact
    * decimal-sum discipline ([[Fp]]) so the `>` cut is bit-identical
    * in both engines.
    */
  def qCorrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS totalprice
        |FROM orders_v o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT cast(sum(cast(o2.o_totalprice AS decimal(27,6))) AS double)
        |         / count(*)
        |  FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** K23 — value-distribution histogram: fixed-width bins over order
    * totals with per-bin count / exact-decimal mass / raw min-max
    * (min/max of raw doubles are exact input values — no summation,
    * so no rounding needed). ONE map-side-combinable aggregate; the
    * profiling pass run before choosing join strategies or salting
    * thresholds, output O(bins) at any scale.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 20000).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        Fp.dsum2(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bin")

  /** K30 — recursive CTE (Spark 4's WITH RECURSIVE): walk a synthetic
    * reports-to hierarchy (parent = key div 2, a binary tree over
    * customers) from each leaf to the root, aggregating the chain —
    * the org-chart / BOM-rollup query shape warehouses run. The
    * recursion depth is log₂(keys) regardless of table size; each
    * step is one co-partitioned self-join of the frontier, which is
    * exactly how the iterative dedup/PageRank loops are shaped when
    * the engine's own recursion planner runs them.
    */
  def qRecursive(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH RECURSIVE anc(start_key, cur, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer_v
        |  WHERE c_custkey <= 100
        |  UNION ALL
        |  SELECT start_key, cur div 2, depth + 1 FROM anc WHERE cur > 1)
        |SELECT start_key,
        |  CAST(max(depth) AS INT) AS depth_to_root,
        |  CAST(sum(cur) AS BIGINT) AS chain_sum,
        |  count(*) AS chain_len
        |FROM anc GROUP BY start_key ORDER BY start_key""".stripMargin)
  }

  /** K31 — Z-order (Morton) layout keys: bit-interleave two bucketed
    * dimensions into one sort key, so sorting by it co-locates rows
    * that are close in BOTH dimensions — the data-layout technique
    * behind multi-dimensional file skipping at 100 TB (Delta/Iceberg
    * Z-ORDER BY). Buckets derive from broadcast 1-row min/max
    * aggregates (exact integer arithmetic, no sampling); the
    * interleave is eight unrolled shift/mask terms per dimension,
    * codegen-friendly. ZorderSpec demonstrates the payoff: a 2-D
    * range predicate over the z-sorted layout touches a fraction of
    * the files a 1-D sort needs.
    */
  def qZorder(spark: SparkSession, dir: String): DataFrame =
    zorderKeys(Tables.orders(spark, dir))

  /** The z-key body over any orders-shaped frame, keeping the input
    * columns — shared by the K31 key query and the K72 layout
    * executor ([[ZOrderExport]]).
    */
  private[relational] def zorderFrame(orders: DataFrame): DataFrame = {
    val bounds = broadcast(orders.agg(
      min("o_custkey").as("ck_min"), max("o_custkey").as("ck_max"),
      min(expr("unix_date(cast(o_orderdate as date))")).as("d_min"),
      max(expr("unix_date(cast(o_orderdate as date))")).as("d_max")))
    // bucket = (v - min) * 256 div (max - min + 1): exact integers,
    // always in [0, 255]
    val interleave = (0 until 8).map { i =>
      s"(((xb div ${1L << i}) % 2) * ${1L << (2 * i)}) + " +
        s"(((yb div ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
    orders.crossJoin(bounds)
      .withColumn("d", expr("unix_date(cast(o_orderdate as date))"))
      .withColumn("xb",
        expr("(o_custkey - ck_min) * 256 div (ck_max - ck_min + 1)"))
      .withColumn("yb", expr("(d - d_min) * 256 div (d_max - d_min + 1)"))
      .withColumn("zval", expr(interleave))
      .drop("ck_min", "ck_max", "d_min", "d_max")
  }

  def zorderKeys(orders: DataFrame): DataFrame =
    zorderFrame(orders)
      .select("o_orderkey", "xb", "yb", "zval")
      .orderBy("o_orderkey")

  override def queries: Map[String, Q] = Map(
    "q_zorder" -> (qZorder _),
    "q_recursive" -> (qRecursive _),
    "q_sql_api" -> (qSqlApi _),
    "q_histogram" -> (qHistogram _),
    "q_corr_subquery" -> (qCorrSubquery _),
    "q_window_analytics" -> (qWindowAnalytics _),
    "q_date_ops" -> (qDateOps _),
    "q_median" -> (qMedian _),
    "q_json_ops" -> (qJsonOps _),
    "q_unpivot" -> (qUnpivot _))

  private val duckInterleave = (0 until 8).map { i =>
    s"(((xb // ${1L << i}) % 2) * ${1L << (2 * i)}) + " +
      s"(((yb // ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
  }.mkString(" + ")

  /** The z-key CTE chain (bounds → buckets → interleaved zval) shared
    * by the K31 oracle and the K72 exported-layout oracle.
    */
  private[relational] val zorderSqlCtes: String =
    s"""WITH b AS (SELECT min(o_custkey) AS ck_min,
      |    max(o_custkey) AS ck_max,
      |    min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d_min,
      |    max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d_max
      |  FROM orders),
      |k AS (SELECT o_orderkey,
      |    (o_custkey - ck_min) * 256 // (ck_max - ck_min + 1) AS xb,
      |    ((CAST(o_orderdate AS DATE) - DATE '1970-01-01') - d_min)
      |      * 256 // (d_max - d_min + 1) AS yb
      |  FROM orders, b),
      |z AS (SELECT o_orderkey, xb, yb,
      |    CAST($duckInterleave AS BIGINT) AS zval FROM k)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_zorder" -> (zorderSqlCtes + """
      |SELECT o_orderkey, xb, yb, zval
      |FROM z ORDER BY o_orderkey""".stripMargin),
    "q_recursive" ->
      """WITH RECURSIVE anc(start_key, cur, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  WHERE c_custkey <= 100
        |  UNION ALL
        |  SELECT start_key, cur // 2, depth + 1 FROM anc WHERE cur > 1)
        |SELECT start_key,
        |  CAST(max(depth) AS INTEGER) AS depth_to_root,
        |  CAST(sum(cur) AS BIGINT) AS chain_sum,
        |  count(*) AS chain_len
        |FROM anc GROUP BY start_key ORDER BY start_key""".stripMargin,
    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 20000) AS INT) AS bin,
        |  count(*) AS n,
        |  ${Fp.sqlSum2("o_totalprice")} AS sum_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_corr_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
        |         / count(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_unpivot" ->
      s"""SELECT metric, count(*) AS n,
        |  ${Fp.sqlSum2("val")} AS sum_val
        |FROM (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY metric ORDER BY metric""".stripMargin,
    "q_json_ops" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'k' AS INTEGER)) AS min_k,
        |  max(CAST(props->>'k' AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sql_api" ->
      s"""SELECT n_name,
        |  ${Fp.sqlSum2("o_totalprice")} AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_window_analytics" ->
      """SELECT o_orderpriority, o_orderkey, totalprice,
        |  lead(totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  cume_dist() OVER w AS cume
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        round(o_totalprice, 2) AS totalprice
        |      FROM orders WHERE o_orderkey % 100 = 0)
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, totalprice, o_orderkey""".stripMargin,
    "q_date_ops" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q_start
        |FROM orders WHERE o_orderkey % 250 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_median" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
