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
    "etl_observations" -> (etlObservations _))

  override def oracles: Map[String, String] = Map(
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
    "etl_observations" -> (Observations.sqlCte +
      """SELECT dataset_code, region, geo, indicator, indicator_label,
        |  year, value, n_obs
        |FROM observations ORDER BY geo, indicator, year""".stripMargin))
}
