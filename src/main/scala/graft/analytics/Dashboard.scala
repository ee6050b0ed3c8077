package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.etl.Observations

/** SURVEY §2 B — the reference's dashboard query surface
  * (app/streamlit_app.py, viz/viz_utils.py) over the observations
  * panel.
  *
  * Scale: "latest year" is a 1-row aggregate broadcast back into the
  * filter (no window over the whole table, no collect); every top-N is
  * orderBy+limit → TakeOrderedAndProject; the pivot uses an explicit
  * year list so Spark skips the extra values-discovery scan.
  */
object Dashboard extends QueryModule {

  private val years = (1995 to 2001).toSeq

  private def obs(spark: SparkSession, dir: String): DataFrame =
    Observations.panel(spark, dir)

  /** B1 — top 10 geos by mean value in the latest year
    * (streamlit_app.py:94-107).
    */
  def topNLatest(spark: SparkSession, dir: String): DataFrame = {
    val o = obs(spark, dir)
    val latest = o.agg(max("year").as("latest_year"))
    o.join(broadcast(latest), col("year") === col("latest_year"))
      .groupBy("geo")
      .agg(graft.Fp.davg(col("value")).as("avg_value"))
      .orderBy(desc("avg_value"), asc("geo"))
      .limit(10)
  }

  /** B2 — year-over-year trend for one geo + indicator
    * (streamlit_app.py:115-124): filter, distinct, sort.
    */
  def countryTrend(spark: SparkSession, dir: String): DataFrame = {
    obs(spark, dir)
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .select("year", "value")
      .dropDuplicates()
      .orderBy("year")
  }

  /** B3 — explorer filter: geo × indicator × year range
    * (streamlit_app.py:157-167). Conjunctive pushed predicates.
    */
  def explorerFilter(spark: SparkSession, dir: String): DataFrame = {
    // direct build, not the memoized panel: this is the pushdown
    // showcase — geo/indicator/year predicates belong in the scan
    Observations.build(spark, dir)
      .filter(col("geo") === "NATION_1" && col("indicator") === "5-LOW"
        && col("year").between(1996, 2000))
      .select("geo", "indicator", "year", "value", "n_obs")
      .orderBy("year")
  }

  /** B4 — top-10 geo comparison by mean over a year range for one
    * indicator (streamlit_app.py:170-183).
    */
  def topCountriesMean(spark: SparkSession, dir: String): DataFrame = {
    obs(spark, dir)
      .filter(col("indicator") === "1-URGENT" && col("year").between(1996, 2000))
      .groupBy("geo")
      .agg(graft.Fp.davg(col("value")).as("avg_value"))
      .orderBy(desc("avg_value"), asc("geo"))
      .limit(10)
  }

  /** B5 — top-10 geos by summed value at the latest year
    * (viz_utils.py:51-66: nlargest on a sum).
    */
  def topCountriesSum(spark: SparkSession, dir: String): DataFrame = {
    val o = obs(spark, dir)
    val latest = o.agg(max("year").as("latest_year"))
    o.join(broadcast(latest), col("year") === col("latest_year"))
      .groupBy("geo")
      .agg(graft.Fp.dsum2(col("value")).as("sum_value"))
      .orderBy(desc("sum_value"), asc("geo"))
      .limit(10)
  }

  /** B6 — heatmap pivot geo × year of summed value
    * (viz_utils.py:69-81). Explicit value list: no discovery scan.
    */
  def pivotHeatmap(spark: SparkSession, dir: String): DataFrame = {
    obs(spark, dir)
      .filter(col("indicator") === "1-URGENT")
      .groupBy("geo")
      .pivot("year", years.map(_.asInstanceOf[AnyRef]))
      .agg(graft.Fp.dsum2(col("value")))
      .orderBy("geo")
  }

  override def queries: Map[String, Q] = Map(
    "top_n_latest" -> (topNLatest _),
    "country_trend" -> (countryTrend _),
    "explorer_filter" -> (explorerFilter _),
    "top_countries_mean" -> (topCountriesMean _),
    "top_countries_sum" -> (topCountriesSum _),
    "pivot_heatmap" -> (pivotHeatmap _))

  private val cte = Observations.sqlCte

  override def oracles: Map[String, String] = Map(
    "top_n_latest" -> (cte +
      s"""SELECT geo, ${graft.Fp.sqlAvg("value")} AS avg_value FROM observations
        |WHERE year = (SELECT max(year) FROM observations)
        |GROUP BY geo ORDER BY avg_value DESC, geo ASC LIMIT 10""".stripMargin),
    "country_trend" -> (cte +
      """SELECT DISTINCT year, value FROM observations
        |WHERE geo = 'NATION_0' AND indicator = '1-URGENT'
        |ORDER BY year""".stripMargin),
    "explorer_filter" -> (cte +
      """SELECT geo, indicator, year, value, n_obs FROM observations
        |WHERE geo = 'NATION_1' AND indicator = '5-LOW'
        |  AND year BETWEEN 1996 AND 2000
        |ORDER BY year""".stripMargin),
    "top_countries_mean" -> (cte +
      s"""SELECT geo, ${graft.Fp.sqlAvg("value")} AS avg_value FROM observations
        |WHERE indicator = '1-URGENT' AND year BETWEEN 1996 AND 2000
        |GROUP BY geo ORDER BY avg_value DESC, geo ASC LIMIT 10""".stripMargin),
    "top_countries_sum" -> (cte +
      s"""SELECT geo, ${graft.Fp.sqlSum2("value")} AS sum_value FROM observations
        |WHERE year = (SELECT max(year) FROM observations)
        |GROUP BY geo ORDER BY sum_value DESC, geo ASC LIMIT 10""".stripMargin),
    "pivot_heatmap" -> (cte +
      ("""SELECT geo, """ +
        (1995 to 2001).map(y =>
          (graft.Fp.sqlSum2(s"CASE WHEN year = $y THEN value END") + s" AS \"$y\""))
          .mkString(", ") +
        """ FROM observations WHERE indicator = '1-URGENT'
          | GROUP BY geo ORDER BY geo""".stripMargin)))
}
