package graft.forecast

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecasting primitives (SURVEY §2 E; reference:
  * ml/forecast_utils.py).
  *
  * The reference loops per-series in Python. Here:
  * - lag/rolling features are window functions over the series key —
  *   one shuffle, any number of series in parallel (E1, E3, E4);
  * - Holt linear smoothing is a fold over the collected series array
  *   (E2/E6/E7) — one hash aggregate then a scalar projection per
  *   series; series are short (years), so the array per group is tiny
  *   while parallelism comes from the number of series, exactly how a
  *   100 TB panel wants to be partitioned.
  *
  * Rolling mean/std are derived from decimal-exact Σx and Σx² so the
  * DuckDB oracle reproduces them bit-for-bit (see graft.Fp).
  */
object Forecast {

  val Alpha = 0.8 // level smoothing
  val Beta = 0.2 // trend smoothing
  val Horizon = 5

  private val series = Seq("geo", "indicator")

  /** E1 — lag-1..3 + 3-row rolling mean/std (sample), nulls until the
    * window is full, mirroring pandas shift/rolling semantics
    * (forecast_utils.py:30-51).
    */
  def lagFeatures(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy("year")
    val frame = w.rowsBetween(-2, 0)
    val sx = sum(col("value").cast("decimal(27,6)")).over(frame).cast("double")
    // Σx² in exact integer cents: squaring the double first would put
    // the value near 1e13 where the double's ulp exceeds the decimal
    // quantum, and Spark (shortest-repr) vs DuckDB (exact-binary)
    // quantize such doubles differently. Cents are exact end-to-end.
    val cents = expr("cast(cast(value as decimal(27,2)) * 100 as decimal(18,0))")
    val sxxc = sum(cents * cents).over(frame).cast("double")
    val sxc = sum(cents).over(frame).cast("double")
    val cnt = count(lit(1)).over(frame)
    obs.select(col("geo"), col("indicator"), col("year"), col("value"))
      .withColumn("lag1", lag("value", 1).over(w))
      .withColumn("lag2", lag("value", 2).over(w))
      .withColumn("lag3", lag("value", 3).over(w))
      .withColumn("roll_mean_3", when(cnt === 3, sx / 3))
      .withColumn("roll_std_3",
        when(cnt === 3, sqrt((sxxc - sxc * sxc / 3) / 2) / 100))
  }

  /** E3 — last-k holdout per series with the reference's
    * test_size = min(5, max(2, n/3)) (forecast_utils.py:185).
    */
  def trainTestSplit(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy("year")
    val ws = Window.partitionBy(series.map(col): _*)
    obs.select(col("geo"), col("indicator"), col("year"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(ws))
      // integer division: double→int casts truncate in Spark but
      // round in DuckDB, so never cast a fractional intermediate
      .withColumn("test_size",
        least(lit(5), greatest(lit(2), expr("cast(n div 3 as int)"))))
      .withColumn("split",
        when(col("rn") > col("n") - col("test_size"), "test").otherwise("train"))
      .select("geo", "indicator", "year", "value", "split")
  }

  /** E4 — RMSE of the naive lag-1 predictor per series
    * (sqrt(mean_squared_error), forecast_utils.py:80).
    */
  def rmseNaive(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy("year")
    obs.select(col("geo"), col("indicator"), col("year"), col("value"))
      .withColumn("lag1", lag("value", 1).over(w))
      .filter(col("lag1").isNotNull)
      // squared error in exact integer cents (see lagFeatures note)
      .withColumn("dc", expr(
        """cast((cast(value as decimal(27,2)) - cast(lag1 as decimal(27,2)))
          |     * 100 as decimal(18,0))""".stripMargin))
      .groupBy("geo", "indicator")
      .agg(count(lit(1)).as("n_terms"),
        (sqrt(sum(col("dc") * col("dc")).cast("double") / count(lit(1))) / 100)
          .as("rmse_naive"))
  }

  /** Sorted value array per series (years are unique per series). */
  private def seriesArrays(obs: DataFrame): DataFrame =
    obs.groupBy("geo", "indicator")
      .agg(expr(
        "transform(array_sort(collect_list(struct(year, value))), s -> s.value)")
        .as("vs"),
        max("year").as("last_year"))
      .filter(size(col("vs")) >= 2)

  /** Holt state fold: l₀=x₁, b₀=x₂−x₁; per step
    * l' = αx + (1−α)(l+b), b' = β(l'−l) + (1−β)b, accumulating
    * one-step-ahead squared error (forecast_utils.py:117-148 semantics
    * with fixed smoothing instead of statsmodels' fitted params).
    */
  private val holtState =
    s"""aggregate(slice(vs, 2, size(vs) - 1),
       |  named_struct('l', element_at(vs, 1),
       |               'b', element_at(vs, 2) - element_at(vs, 1),
       |               'sse', cast(0 as double), 'n', cast(0 as int)),
       |  (st, x) -> named_struct(
       |    'l', $Alpha * x + ${1 - Alpha} * (st.l + st.b),
       |    'b', $Beta * (($Alpha * x + ${1 - Alpha} * (st.l + st.b)) - st.l)
       |         + ${1 - Beta} * st.b,
       |    'sse', st.sse + (x - (st.l + st.b)) * (x - (st.l + st.b)),
       |    'n', st.n + 1))""".stripMargin

  /** E2 + E6 — recursive multi-step Holt forecast, one row per
    * (series, horizon step).
    */
  def holtForecast(obs: DataFrame): DataFrame =
    seriesArrays(obs)
      .withColumn("st", expr(holtState))
      .select(col("geo"), col("indicator"), col("last_year"),
        col("st"),
        explode(expr(s"sequence(1, $Horizon)")).as("step"))
      .select(col("geo"), col("indicator"),
        (col("last_year") + col("step")).as("year"),
        (col("st.l") + col("step") * col("st.b")).as("forecast"))

  /** The reference's run_forecast output shape
    * (forecast_utils.py:206-215): historical rows union forecast rows
    * with a `type` discriminator, sorted by year.
    */
  def forecastSeries(obs: DataFrame): DataFrame = {
    val hist = obs.select(col("geo"), col("indicator"), col("year"),
      col("value"), lit("historical").as("type"))
    val fut = holtForecast(obs).select(col("geo"), col("indicator"),
      col("year"), col("forecast").as("value"), lit("forecast").as("type"))
    hist.unionByName(fut)
  }

  /** E7 — per-series model selection by in-sample one-step RMSE:
    * Holt vs the naive lag-1 baseline (forecast_utils.py:192-204).
    */
  def modelSelect(obs: DataFrame): DataFrame = {
    val holt = seriesArrays(obs)
      .withColumn("st", expr(holtState))
      .select(col("geo"), col("indicator"),
        sqrt(col("st.sse") / col("st.n")).as("rmse_holt"))
    rmseNaive(obs)
      .join(holt, Seq("geo", "indicator"))
      .withColumn("model_used",
        when(col("rmse_holt") <= col("rmse_naive"), "holt").otherwise("naive"))
      .select("geo", "indicator", "rmse_naive", "rmse_holt", "model_used")
  }
}
