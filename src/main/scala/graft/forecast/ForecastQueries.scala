package graft.forecast

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.etl.Observations

/** SURVEY §2 E — forecasting block as driver queries, over the
  * observations panel. holt_forecast / gbt_forecast / model_select
  * are not ANSI-SQL-expressible (stateful recursions, tree model) —
  * they carry rows-only driver checks plus ScalaTest oracles.
  */
object ForecastQueries extends QueryModule {

  private def obs(s: SparkSession, d: String): DataFrame =
    Observations.build(s, d)

  def lagFeatures(s: SparkSession, d: String): DataFrame =
    Forecast.lagFeatures(obs(s, d)).orderBy("geo", "indicator", "year")

  def trainTestSplit(s: SparkSession, d: String): DataFrame =
    Forecast.trainTestSplit(obs(s, d)).orderBy("geo", "indicator", "year")

  def rmseEval(s: SparkSession, d: String): DataFrame =
    Forecast.rmseNaive(obs(s, d))
      .select("geo", "indicator", "n_terms", "rmse_naive")
      .orderBy("geo", "indicator")

  def holtForecast(s: SparkSession, d: String): DataFrame =
    Forecast.holtForecast(obs(s, d)).orderBy("geo", "indicator", "year")

  def gbtForecast(s: SparkSession, d: String): DataFrame =
    Gbt.forecast(obs(s, d)).orderBy("geo", "indicator", "year")

  def modelSelect(s: SparkSession, d: String): DataFrame =
    Forecast.modelSelect(obs(s, d)).orderBy("geo", "indicator")

  def forecastSeries(s: SparkSession, d: String): DataFrame =
    Forecast.forecastSeries(obs(s, d))
      .orderBy("geo", "indicator", "year", "type")

  override def queries: Map[String, Q] = Map(
    "lag_features" -> (lagFeatures _),
    "train_test_split" -> (trainTestSplit _),
    "rmse_eval" -> (rmseEval _),
    "holt_forecast" -> (holtForecast _),
    "gbt_forecast" -> (gbtForecast _),
    "model_select" -> (modelSelect _),
    "forecast_series" -> (forecastSeries _))

  private val cte = Observations.sqlCte

  override def oracles: Map[String, String] = Map(
    "lag_features" -> (cte +
      """SELECT geo, indicator, year, value,
        |  lag(value, 1) OVER w AS lag1,
        |  lag(value, 2) OVER w AS lag2,
        |  lag(value, 3) OVER w AS lag3,
        |  CASE WHEN count(*) OVER f = 3 THEN
        |    CAST(sum(CAST(value AS DECIMAL(27,6))) OVER f AS DOUBLE) / 3
        |  END AS roll_mean_3,
        |  CASE WHEN count(*) OVER f = 3 THEN
        |    sqrt((CAST(sum(cents * cents) OVER f AS DOUBLE)
        |          - CAST(sum(cents) OVER f AS DOUBLE)
        |            * CAST(sum(cents) OVER f AS DOUBLE) / 3) / 2) / 100
        |  END AS roll_std_3
        |FROM (SELECT *,
        |        CAST(CAST(value AS DECIMAL(27,2)) * 100 AS DECIMAL(18,0)) AS cents
        |      FROM observations)
        |WINDOW w AS (PARTITION BY geo, indicator ORDER BY year),
        |       f AS (PARTITION BY geo, indicator ORDER BY year
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY geo, indicator, year""".stripMargin),
    "train_test_split" -> (cte +
      """SELECT geo, indicator, year, value,
        |  CASE WHEN rn > n - least(5, greatest(2, CAST(n // 3 AS INT)))
        |       THEN 'test' ELSE 'train' END AS split
        |FROM (
        |  SELECT geo, indicator, year, value,
        |    row_number() OVER (PARTITION BY geo, indicator ORDER BY year) AS rn,
        |    count(*) OVER (PARTITION BY geo, indicator) AS n
        |  FROM observations)
        |ORDER BY geo, indicator, year""".stripMargin),
    "rmse_eval" -> (cte +
      """SELECT geo, indicator, count(*) AS n_terms,
        |  sqrt(CAST(sum(dc * dc) AS DOUBLE) / count(*)) / 100 AS rmse_naive
        |FROM (
        |  SELECT geo, indicator,
        |    CAST((CAST(value AS DECIMAL(27,2)) - CAST(lag1 AS DECIMAL(27,2)))
        |         * 100 AS DECIMAL(18,0)) AS dc
        |  FROM (
        |    SELECT geo, indicator, value,
        |      lag(value, 1) OVER (PARTITION BY geo, indicator ORDER BY year) AS lag1
        |    FROM observations)
        |  WHERE lag1 IS NOT NULL)
        |GROUP BY geo, indicator
        |ORDER BY geo, indicator""".stripMargin))
}
