package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** SURVEY §2 A — the ETL/ingest operator block as driver queries. */
object EtlQueries extends QueryModule {

  /** A1 — flat-index unravel as pure integer arithmetic (codegen'd).
    * Mirrors etl/main.py:97-102 for a fixed dims shape [5, 20, 50].
    */
  def etlUnravel(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select("event_id")
      .withColumn("dim0", expr("(event_id div 1000) % 5"))
      .withColumn("dim1", expr("(event_id div 50) % 20"))
      .withColumn("dim2", expr("event_id % 50"))
      .orderBy("event_id")
  }

  /** A2 — JSON-stat document → tidy observations (etl/main.py:75-126). */
  def etlJsonstat(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.range(1).select(lit(JsonStat.sampleDoc).as("doc"))
    JsonStat.flatten(docs, "doc")
      .select(
        expr("code_map['nrg_bal']").as("indicator"),
        expr("code_map['geo']").as("geo"),
        expr("label_map['geo']").as("country_name"),
        expr("code_map['time']").as("time"),
        col("value"))
      .orderBy("indicator", "geo", "time")
  }

  /** A3 — exact duplicate removal (etl/main.py:132-135). */
  def etlDedup(spark: SparkSession, dir: String): DataFrame = {
    Clean.dedup(
      Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey"))
      .orderBy("l_partkey", "l_suppkey")
  }

  /** A4 — drop rows with null critical values (etl/main.py:140-143);
    * nulls are synthesized via nullif since the testdata is dense.
    */
  def etlDropna(spark: SparkSession, dir: String): DataFrame = {
    val withNulls = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), nullif(col("l_discount"), lit(0.0)).as("disc"))
    Clean.dropNaCritical(withNulls, Seq("disc"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** A5 — '%Y' year-string parse to a date (etl/main.py:146). */
  def etlTimeParse(spark: SparkSession, dir: String): DataFrame = {
    val parsed = Clean.parseYear(
      Tables.orders(spark, dir)
        .select(year(col("o_orderdate")).cast("string").as("year_str"))
        .distinct(),
      "year_str", "parsed")
    parsed
      .select(col("year_str"), date_format(col("parsed"), "yyyy-MM-dd").as("parsed"))
      .orderBy("year_str")
  }

  /** A6 — load modes: overwrite then append to a scratch sink, read
    * back; the doubled aggregate proves both modes took effect.
    */
  def etlLoadModes(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_load").toString + "/t"
    val c = Tables.customer(spark, dir).select("c_custkey", "c_acctbal")
    Clean.load(c, tmp, "full-refresh")
    Clean.load(c, tmp, "append")
    spark.read.parquet(tmp)
      .agg(count(lit(1)).as("n_rows"), graft.Fp.dsum2(col("c_acctbal")).as("sum_bal"))
  }

  /** A12 — the JDBC faces inside the HASH GATE (round 16; the Derby
    * specs proved them since round 6, but the gate's A6 row exercised
    * only the parquet sink): the customer frame drives all three
    * load modes against embedded Derby — full-refresh, append (rows
    * double), truncate (back to one copy), append (double again) —
    * and the PARTITIONED [[graft.sources.Tables.fromJdbc]] scan reads
    * the result back across 8 key strides. The oracle aggregates the
    * doubled frame directly, so a hash match proves the mode
    * semantics (exactly two copies survived the mode sequence) AND
    * the stride read's completeness — a lost or duplicated stride
    * breaks the count. Double columns round-trip Derby bit-exactly
    * (IEEE DOUBLE both sides); the [[graft.Fp]] decimal sums are
    * order-free, so the partition-parallel read cannot reorder a
    * result.
    */
  /** One shared in-memory Derby database per JVM: bootstrapping a
    * fresh db per invocation was measured at ~0.45 s of the gate
    * query's 1.73 s (the r17 sole regression) — the isolation that
    * matters is per-TABLE, not per-database, so each invocation gets
    * a collision-free UUID table in the shared db and drops it in its
    * finally. The db itself is never dropped and holds no tables
    * between calls, so per-JVM memory stays bounded.
    */
  private val GateDbUrl = "jdbc:derby:memory:graftgate;create=true"

  def jdbcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    // collision-free TABLE name per (dir, invocation): a UUID — not
    // dir.hashCode, whose 32-bit collisions (and negative
    // abs(Int.MinValue)) could alias two gate corpora onto one shared
    // mutable table. Dropped in the finally.
    val table =
      s"obs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val url = GateDbUrl
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    try {
      Clean.loadJdbc(c, url, table, "full-refresh", props)
      Clean.loadJdbc(c, url, table, "append", props)
      Clean.loadJdbc(c, url, table, "truncate", props)
      Clean.loadJdbc(c, url, table, "append", props)
      // stride bounds: ONE bounded 2-value collect (the key range a
      // deployment reads from the warehouse catalog)
      val bounds = c.agg(min("c_custkey"), max("c_custkey")).collect()(0)
      val (lo, hi) =
        if (bounds.isNullAt(0)) (0L, 1L)
        else (bounds.getLong(0), bounds.getLong(1) + 1)
      // eager checkpoint: the jdbc scan must run while the backing
      // table still exists — the caller's actions then read blocks
      Tables.fromJdbc(spark, url, table, "c_custkey", lo, hi, 8, props)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          graft.Fp.dsum2(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
        .localCheckpoint(true)
    } finally {
      try {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          st.executeUpdate(s"DROP TABLE $table")
          st.close()
        } finally conn.close()
      } catch { case _: java.sql.SQLException => () }
    }
  }

  /** A9 — SCD type-2 effective date for the staged update batch. */
  val Scd2EffectiveDate = "1996-06-01"

  /** A9 — slowly-changing-dimension type-2 merge: the incremental
    * counterpart to A6's load modes — the reference full-refreshes its
    * small Postgres dimension (etl/main.py:166-207), but a 100 TB
    * warehouse versions changes instead of rewriting. A staged update
    * batch (deterministic md5 coin picks ~10% of customers, their
    * segment changes) merges into the versioned dim: changed keys get
    * their open row closed (valid_to = effective date) plus a new open
    * row; unchanged keys pass through untouched. ONE co-partitioned
    * left join against the dim + a union of the (small) update batch —
    * the plan MERGE INTO compiles to; with a partitioned sink only
    * touched partitions rewrite (A6's dynamic overwrite).
    */
  def etlScd2(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val updates = dim.filter(expr(
        """cast(conv(substring(md5(concat('scd|', cast(c_custkey as string))),
          |  1, 8), 16, 10) as bigint) % 10 = 0""".stripMargin))
      .select(col("c_custkey"),
        concat(lit("SEG-"), (col("c_custkey") % 5).cast("string"))
          .as("new_segment"))
    val joined = dim.join(updates, Seq("c_custkey"), "left")
    val oldRows = joined.select(
      col("c_custkey"), col("segment"),
      lit("1995-01-01").as("valid_from"),
      when(col("new_segment").isNotNull, lit(Scd2EffectiveDate))
        .otherwise(lit(null).cast("string")).as("valid_to"),
      col("new_segment").isNull.as("is_current"))
    val newRows = updates.select(
      col("c_custkey"), col("new_segment").as("segment"),
      lit(Scd2EffectiveDate).as("valid_from"),
      lit(null).cast("string").as("valid_to"),
      lit(true).as("is_current"))
    oldRows.unionByName(newRows)
      .orderBy("c_custkey", "valid_from")
  }

  /** A11 — incremental aggregate maintenance (materialized-view
    * refresh): the standing summary table absorbs a new batch by
    * merging PARTIAL aggregates — sum/count re-aggregate, derived
    * columns (avg) recompute from the merged state — instead of
    * rescanning history. The md5-coin splits orders into standing
    * (80%) vs arriving (20%); the oracle is the full one-pass
    * aggregate, so the gate verifies the merge algebra reproduces the
    * full recompute BIT-EXACTLY (decimal partials are
    * order-independent, which is precisely what makes them mergeable
    * across refresh boundaries at 100 TB).
    */
  def etlIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("is_new", expr(
        """cast(conv(substring(md5(concat('inc|', cast(o_orderkey as string))),
          |  1, 8), 16, 10) as bigint) % 5 = 0""".stripMargin))
    def partials(df: DataFrame) = df.groupBy("o_orderpriority", "yr")
      .agg(sum(col("o_totalprice").cast("decimal(27,6)")).as("s"),
        count(lit(1)).as("n"))
    partials(o.filter(!col("is_new")))
      .unionByName(partials(o.filter(col("is_new"))))
      .groupBy("o_orderpriority", "yr")
      .agg(sum("s").as("s"), sum("n").as("n_orders"))
      .select(col("o_orderpriority"), col("yr"),
        col("s").cast("decimal(38,2)").cast("double").as("sum_price"),
        col("n_orders"),
        (col("s").cast("double") / col("n_orders")).as("avg_price"))
      .orderBy("o_orderpriority", "yr")
  }

  /** A10 — data-quality constraint audit (the dbt-test /
    * expectations shape a 100 TB warehouse runs on every load):
    * null / range / uniqueness checks fold into ONE aggregate per
    * table scan, the FK check is one co-partitioned left join — the
    * whole audit is two scans + one join regardless of constraint
    * count, then a constant-size `stack` reshapes counters into one
    * row per constraint. qty_1_40 is deliberately tighter than the
    * data so the violation path is exercised, not just the zeros.
    */
  def etlValidate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n_o"),
      sum(when(col("o_totalprice") < 0, 1).otherwise(0)).as("v_price"),
      sum(when(col("o_orderdate").isNull, 1).otherwise(0)).as("v_date"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"))
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .join(
        Tables.orders(spark, dir).select("o_orderkey").distinct()
          .withColumn("ex", lit(1)),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_l"),
        sum(when(col("ex").isNull, 1).otherwise(0)).as("v_fk"),
        sum(when(!col("l_quantity").between(1, 40), 1).otherwise(0))
          .as("v_qty"))
    o.crossJoin(l)
      .selectExpr(
        """stack(5,
          |  'orders.price_nonneg',       n_o, v_price,
          |  'orders.orderdate_not_null', n_o, v_date,
          |  'orders.pk_unique',          n_o, v_pk,
          |  'lineitem.fk_orders',        n_l, v_fk,
          |  'lineitem.qty_1_40',         n_l, v_qty)
          |AS (check_name, n_checked, n_violations)""".stripMargin)
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("check_name")
  }

  /** A7 — the composed pipeline: warehouse → tidy observations panel. */
  def etlObservations(spark: SparkSession, dir: String): DataFrame =
    Observations.build(spark, dir)
      .select("dataset_code", "region", "geo", "indicator", "indicator_label",
        "year", "value", "n_obs")
      .orderBy("geo", "indicator", "year")

  override def queries: Map[String, Q] = Map(
    "etl_unravel" -> (etlUnravel _),
    "etl_jsonstat" -> (etlJsonstat _),
    "etl_dedup" -> (etlDedup _),
    "etl_dropna" -> (etlDropna _),
    "etl_time_parse" -> (etlTimeParse _),
    "etl_load_modes" -> (etlLoadModes _),
    "jdbc_round_trip" -> (jdbcRoundTrip _),
    "etl_scd2" -> (etlScd2 _),
    "etl_validate" -> (etlValidate _),
    "etl_incremental_agg" -> (etlIncrementalAgg _),
    "etl_observations" -> (etlObservations _))

  override def oracles: Map[String, String] = Map(
    "etl_incremental_agg" ->
      s"""SELECT o_orderpriority,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  ${graft.Fp.sqlSum2("o_totalprice")} AS sum_price,
        |  count(*) AS n_orders,
        |  ${graft.Fp.sqlSum6("o_totalprice")} / count(*) AS avg_price
        |FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "etl_validate" ->
      """WITH o AS (SELECT count(*) AS n_o,
        |    CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_date,
        |    count(*) - count(DISTINCT o_orderkey) AS v_pk
        |  FROM orders),
        |l AS (SELECT count(*) AS n_l,
        |    CAST(sum(CASE WHEN ord.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_fk,
        |    CAST(sum(CASE WHEN li.l_quantity NOT BETWEEN 1 AND 40
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_qty
        |  FROM lineitem li
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ord
        |    ON li.l_orderkey = ord.o_orderkey),
        |s AS (
        |  SELECT 'orders.price_nonneg' AS check_name, n_o AS n_checked,
        |    v_price AS n_violations FROM o
        |  UNION ALL SELECT 'orders.orderdate_not_null', n_o, v_date FROM o
        |  UNION ALL SELECT 'orders.pk_unique', n_o, v_pk FROM o
        |  UNION ALL SELECT 'lineitem.fk_orders', n_l, v_fk FROM l
        |  UNION ALL SELECT 'lineitem.qty_1_40', n_l, v_qty FROM l)
        |SELECT check_name, n_checked, n_violations,
        |  n_violations = 0 AS pass
        |FROM s ORDER BY check_name""".stripMargin,
    "etl_scd2" ->
      s"""WITH dim AS (SELECT c_custkey, c_mktsegment AS segment
        |             FROM customer),
        |u AS (SELECT c_custkey,
        |        'SEG-' || CAST(c_custkey % 5 AS VARCHAR) AS new_segment
        |      FROM dim
        |      WHERE CAST('0x' || substr(md5('scd|' ||
        |        CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0)
        |SELECT d.c_custkey, d.segment, '1995-01-01' AS valid_from,
        |  CASE WHEN u.c_custkey IS NOT NULL
        |       THEN '$Scd2EffectiveDate' END AS valid_to,
        |  u.c_custkey IS NULL AS is_current
        |FROM dim d LEFT JOIN u USING (c_custkey)
        |UNION ALL
        |SELECT c_custkey, new_segment, '$Scd2EffectiveDate', NULL, TRUE
        |FROM u
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "etl_unravel" ->
      """SELECT event_id,
        |  (event_id // 1000) % 5 AS dim0,
        |  (event_id // 50) % 20 AS dim1,
        |  event_id % 50 AS dim2
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_jsonstat" ->
      """SELECT indicator, geo, country_name, time, CAST(value AS DOUBLE) AS value
        |FROM (VALUES
        |  ('GEP',  'DE', 'Germany', '2020', 100.0),
        |  ('GEP',  'DE', 'Germany', '2021', 101.0),
        |  ('GEP',  'FR', 'France',  '2020', 102.0),
        |  ('GEP',  'FR', 'France',  '2021', 103.0),
        |  ('GEP',  'IT', 'Italy',   '2020', 104.0),
        |  ('FC_E', 'DE', 'Germany', '2020', 106.0),
        |  ('FC_E', 'FR', 'France',  '2020', 108.0),
        |  ('FC_E', 'FR', 'France',  '2021', 109.0),
        |  ('FC_E', 'IT', 'Italy',   '2020', 110.0),
        |  ('FC_E', 'IT', 'Italy',   '2021', 111.0))
        |  AS t(indicator, geo, country_name, time, value)
        |ORDER BY indicator, geo, time""".stripMargin,
    "etl_dedup" ->
      """SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "etl_dropna" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE nullif(l_discount, 0.0) IS NOT NULL
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "etl_time_parse" ->
      """SELECT year_str, strftime(strptime(year_str, '%Y'), '%Y-%m-%d') AS parsed
        |FROM (SELECT DISTINCT CAST(year(o_orderdate) AS VARCHAR) AS year_str FROM orders)
        |ORDER BY year_str""".stripMargin,
    "etl_load_modes" ->
      s"""SELECT count(*) * 2 AS n_rows,
        |  ${graft.Fp.sqlSum2("c_acctbal * 2")} AS sum_bal
        |FROM customer""".stripMargin,
    // the doubled frame IS the expected table state after
    // full-refresh -> append -> truncate -> append
    "jdbc_round_trip" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
        |  ${graft.Fp.sqlSum2("c_acctbal")} AS sum_bal
        |FROM (SELECT * FROM customer UNION ALL SELECT * FROM customer)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "etl_observations" -> (Observations.sqlCte +
      """SELECT dataset_code, region, geo, indicator, indicator_label,
        |  year, value, n_obs
        |FROM observations ORDER BY geo, indicator, year""".stripMargin))
}
