package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.etl.Observations

/** SURVEY §2 C — the reference's insights/knowledge-base builder
  * (llm_app/build_knowledge_base.py) and chatbot intent
  * (llm_app/chatbot.py), Spark-first.
  *
  * The reference iterates groupby groups in Python
  * (build_knowledge_base.py:126-177). Here the whole per-(geo,
  * indicator) trend profile — first/last year and value, slope,
  * growth%, label, NL text — is ONE hash aggregate using
  * min_by/max_by, so a 100 TB panel reduces map-side with a single
  * shuffle and no sort, no window, no driver loop.
  */
object Insights extends QueryModule {

  private val slopeThreshold = 0.01

  /** Trend label (build_knowledge_base.py:59-68). */
  def trendLabel(slope: Column): Column =
    when(slope > slopeThreshold, "rising")
      .when(slope < -slopeThreshold, "declining")
      .otherwise("stable")

  /** C1 core: one row per (geo, indicator) with trend stats. */
  def trendStats(spark: SparkSession, dir: String): DataFrame = {
    Observations.panel(spark, dir)
      .groupBy("geo", "indicator")
      .agg(
        min("year").as("start_year"),
        max("year").as("end_year"),
        min_by(col("value"), col("year")).as("start_value"),
        max_by(col("value"), col("year")).as("end_value"),
        count(lit(1)).as("n_points"))
      .withColumn("n_years",
        greatest(col("end_year") - col("start_year"), lit(1)))
      // No re-rounding here: start/end values are already rounded in
      // the view, so the division is bit-identical across engines,
      // while round() itself differs at .xx5 boundaries (HALF_UP on
      // decimal string vs on binary value).
      .withColumn("slope_per_year",
        (col("end_value") - col("start_value")) / col("n_years"))
      .withColumn("growth_pct",
        when(col("start_value") =!= 0.0,
          (col("end_value") - col("start_value")) / col("start_value")))
      .withColumn("trend_label", trendLabel(col("slope_per_year")))
  }

  /** C1 — insights panel query. */
  def insightsTrend(spark: SparkSession, dir: String): DataFrame =
    trendStats(spark, dir)
      .select("geo", "indicator", "start_year", "end_year", "start_value",
        "end_value", "n_years", "slope_per_year", "growth_pct", "trend_label")
      .orderBy("geo", "indicator")

  /** C2 — NL insight string (build_knowledge_base.py:148-160),
    * including the change phrase: `(+12.3% over 5 years)` when
    * growth_pct is defined, `(±u.uu units over N years)` when the
    * start value is 0.
    *
    * The percent is rounded to tenths with EXPLICIT integer
    * arithmetic (floor(|g|·1000 + 0.5)) rather than printf: both
    * engines run identical double ops and an identical floor, whereas
    * Java's %.1f HALF_UPs the shortest decimal repr and C's rounds
    * the exact binary — they disagree on boundary values. The units
    * fallback formats 2-decimal-exact values, which is safe.
    */
  def insightText(spark: SparkSession, dir: String): DataFrame = {
    val changePhrase = expr(
      """CASE WHEN growth_pct IS NOT NULL THEN concat(
        |  IF(growth_pct >= 0, '+', '-'),
        |  cast(cast(floor(abs(growth_pct) * 1000 + 0.5d) as bigint) div 10 as string),
        |  '.',
        |  cast(cast(floor(abs(growth_pct) * 1000 + 0.5d) as bigint) % 10 as string),
        |  '% over ', cast(n_years as string), ' years')
        |ELSE format_string('%+.2f units over %d years',
        |                   end_value - start_value, n_years) END""".stripMargin)
    trendStats(spark, dir)
      .select(col("geo"), col("indicator"),
        format_string(
          "For %s, the indicator '%s' changed from %.2f in %d to %.2f in %d (%s). Overall trend: %s.",
          col("geo"), col("indicator"), col("start_value"), col("start_year"),
          col("end_value"), col("end_year"), changePhrase, col("trend_label"))
          .as("insight_text"))
      .orderBy("geo", "indicator")
  }

  /** C3 — fastest-rising intent (chatbot.py:9-46): argmax slope. */
  def fastestRising(spark: SparkSession, dir: String): DataFrame =
    trendStats(spark, dir)
      .filter(col("indicator") === "1-URGENT")
      .orderBy(desc("slope_per_year"), asc("geo"))
      .limit(1)
      .select("geo", "indicator", "start_year", "end_year",
        "start_value", "end_value", "slope_per_year")

  /** C4 — trend-label distribution (classification op in bulk). */
  def trendClassify(spark: SparkSession, dir: String): DataFrame =
    trendStats(spark, dir)
      .groupBy("trend_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("trend_label")

  override def queries: Map[String, Q] = Map(
    "insights_trend" -> (insightsTrend _),
    "insight_text" -> (insightText _),
    "fastest_rising" -> (fastestRising _),
    "trend_classify" -> (trendClassify _))

  /** Shared CTE chain ending in `labeled` (trend stats + label). */
  val labeledCte: String = Observations.sqlCte +
    """, trend AS (
      |  SELECT geo, indicator,
      |    min(year) AS start_year, max(year) AS end_year,
      |    arg_min(value, year) AS start_value,
      |    arg_max(value, year) AS end_value,
      |    count(*) AS n_points,
      |    CAST(greatest(max(year) - min(year), 1) AS INTEGER) AS n_years,
      |    (arg_max(value, year) - arg_min(value, year))
      |          / greatest(max(year) - min(year), 1) AS slope_per_year,
      |    CASE WHEN arg_min(value, year) <> 0.0
      |         THEN (arg_max(value, year) - arg_min(value, year))
      |                    / arg_min(value, year) END AS growth_pct
      |  FROM observations GROUP BY geo, indicator),
      |labeled AS (
      |  SELECT *, CASE WHEN slope_per_year > 0.01 THEN 'rising'
      |                 WHEN slope_per_year < -0.01 THEN 'declining'
      |                 ELSE 'stable' END AS trend_label
      |  FROM trend)
      |""".stripMargin

  /** DuckDB mirror of the full insight string (text + change phrase),
    * shared with the semantic_search oracle's corpus CTE. Careful:
    * this fragment is interpolated into margin strings that call
    * .stripMargin AFTER interpolation — no line may start with `|`,
    * so every `||` concatenation trails its line.
    */
  val insightTextSql: String =
    """printf('For %s, the indicator ''%s'' changed from %.2f in %d to %.2f in %d (%s). Overall trend: %s.',
      |         geo, indicator, start_value, start_year, end_value, end_year,
      |         CASE WHEN growth_pct IS NOT NULL THEN
      |           (CASE WHEN growth_pct >= 0 THEN '+' ELSE '-' END) ||
      |           CAST(CAST(floor(abs(growth_pct) * 1000 + 0.5) AS BIGINT) // 10 AS VARCHAR) ||
      |           '.' ||
      |           CAST(CAST(floor(abs(growth_pct) * 1000 + 0.5) AS BIGINT) % 10 AS VARCHAR) ||
      |           '% over ' || CAST(n_years AS VARCHAR) || ' years'
      |         ELSE printf('%+.2f units over %d years',
      |                     end_value - start_value, n_years) END,
      |         trend_label)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "insights_trend" -> (labeledCte +
      """SELECT geo, indicator, start_year, end_year, start_value, end_value,
        |  n_years, slope_per_year, growth_pct, trend_label
        |FROM labeled ORDER BY geo, indicator""".stripMargin),
    "insight_text" -> (labeledCte +
      s"""SELECT geo, indicator,
        |  $insightTextSql AS insight_text
        |FROM labeled ORDER BY geo, indicator""".stripMargin),
    "fastest_rising" -> (labeledCte +
      """SELECT geo, indicator, start_year, end_year, start_value, end_value,
        |  slope_per_year
        |FROM labeled WHERE indicator = '1-URGENT'
        |ORDER BY slope_per_year DESC, geo ASC LIMIT 1""".stripMargin),
    "trend_classify" -> (labeledCte +
      """SELECT trend_label, count(*) AS n FROM labeled
        |GROUP BY trend_label ORDER BY trend_label""".stripMargin))
}
