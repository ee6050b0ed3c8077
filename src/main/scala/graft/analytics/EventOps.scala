package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** SURVEY §2 K (events analytics, continued) — attribution, robust
  * outliers, and seasonal decomposition over the event stream. These
  * are the remaining product/ops-analytics shapes next to the funnel /
  * cohort / transition queries in [[graft.streaming.StreamQueries]].
  *
  * Scale notes: every operator aggregates the event volume down to a
  * bounded frame (channels, flagged anomalies, the hourly series)
  * before any second pass; the only event-volume shuffles are one
  * per-user window (attribution) and one per-type aggregate (MAD /
  * decompose). Nothing joins event-volume against event-volume.
  */
object EventOps extends QueryModule {

  /** K27 — last-touch attribution: for every purchase, the most recent
    * preceding non-purchase event of the same user is the credited
    * channel; conversions are then counted per channel. ONE per-user
    * window pass (`last(..., ignoreNulls)` over an unbounded-preceding
    * frame) — the classic marketing-attribution shape. At 100 TB the
    * window is the only event-volume shuffle and the output is
    * O(channels).
    */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionOf(Tables.events(s, d))

  /** The attribution body over any (user_id, event_id, ts,
    * event_type) frame.
    */
  def attributionOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("(direct)")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct("user_id").as("n_users"))
      .orderBy("touch_type")
  }

  /** K28 — robust outliers via MAD (median absolute deviation): the
    * heavy-tail-safe complement to K21's z-score — one extreme event
    * shifts a mean/σ threshold but not a median/MAD one. Two exact
    * grouped percentiles (the [[graft.relational.SqlApi.qMedian]]
    * machinery) with the per-type stats broadcast back onto the
    * stream; med/MAD are decimal-quantized on both engines so the
    * threshold cut is bit-identical. Exact percentile gathers a
    * per-group array — the documented exact path; the constant-memory
    * 100 TB variant swaps in `approx_percentile` (K6).
    */
  def anomalyMad(s: SparkSession, d: String): DataFrame =
    anomalyMadOf(Tables.events(s, d))

  /** The MAD body over any (event_id, event_type, value) frame. */
  def anomalyMadOf(events: DataFrame): DataFrame = {
    val e = events.select("event_id", "event_type", "value")
    def q6(c: org.apache.spark.sql.Column) =
      c.cast("decimal(18,6)").cast("double")
    val med = e.groupBy("event_type")
      .agg(q6(expr("percentile(value, 0.5)")).as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(max("med").as("med"),
        q6(expr("percentile(abs(value - med), 0.5)")).as("mad"))
    e.join(broadcast(mad), "event_type")
      .withColumn("rz", when(col("mad") > 0, q6((col("value") - col("med"))
        / (lit(1.4826) * col("mad")))))
      .filter(abs(col("rz")) > lit(3.5))
      .select("event_id", "event_type", "value", "med", "mad", "rz")
      .orderBy("event_id")
  }

  /** E9 — additive seasonal decomposition of the hourly event series:
    * value = trend (centered 24-point moving average) + seasonal
    * (hour-of-day mean of the detrended series) + residual — the
    * classic STL-lite every ops dashboard runs. The decomposition
    * works on the AGGREGATED series (O(types × hours) rows), never the
    * raw stream; window sums use exact decimal arithmetic because
    * sliding-frame double sums associate differently across engines
    * (DuckDB's segment tree vs Spark's running fold).
    */
  def tsDecompose(s: SparkSession, d: String): DataFrame =
    tsDecomposeOf(Tables.events(s, d))

  /** The decomposition body over any (event_type, ts, value) frame. */
  def tsDecomposeOf(events: DataFrame): DataFrame = {
    // All arithmetic in exact integer micro-units (value × 10⁶): the
    // moving average and seasonal mean divide 6-dp-exact decimals by
    // small integers, which lands on exact .xxxxxx5 half-boundaries
    // where Spark's HALF_UP and DuckDB's double rounding disagree —
    // so both engines round via the SAME integer formula:
    // half-up(x/d) = ((x + OFF·d)·2 + d) div (2d) − OFF, with the OFF
    // offset keeping numerators positive (floor and truncating integer
    // division agree on positives). OFF = 10¹⁶ leaves headroom for
    // hourly micro-sums up to 10¹⁵ without overflowing int64.
    val OFF = "10000000000000000"
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast("decimal(27,6)")) * 1000000)
        .cast("long").as("vm"))
      // enforce the headroom budget loudly: past it, the decimal→long
      // cast nulls (non-ANSI) and the 24·OFF offset overflows — either
      // silently drops hours. The IF also trips on a NULL vm (an
      // already-overflowed cast), since a NULL condition is not true.
      .withColumn("vm", expr(
        """IF(abs(vm) < 1000000000000000, vm,
          |   cast(raise_error(concat('tsDecompose: hourly micro-sum ',
          |     'exceeds the 1e15 int64 headroom budget: ',
          |     coalesce(cast(vm as string), 'overflow'))) as long))"""
          .stripMargin))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-12, 11)
    val trended = hourly
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("t24", sum("vm").over(w))
      .filter(col("n_win") === 24)
      .withColumn("trend_m",
        expr(s"((t24 + 24 * $OFF) * 2 + 24) div 48 - $OFF"))
      .withColumn("detr_m", col("vm") - col("trend_m"))
      // multi-branch boundary (the repo-wide eager-checkpoint rule):
      // both the seasonal aggregate and the final join read trended,
      // and without materialization each branch re-runs the hourly
      // aggregate over the full event stream — the only event-volume
      // work in the operator, so the lazy form doubles it
      .localCheckpoint(true)
    val seasonal = trended
      .groupBy(col("event_type").as("s_type"), hour(col("h")).as("hod"))
      .agg(sum("detr_m").as("sm"), count(lit(1)).as("n"))
      .withColumn("seasonal_m",
        expr(s"((sm + n * $OFF) * 2 + n) div (2 * n) - $OFF"))
    def u(c: String) = (col(c).cast("double") / 1e6).as(c.stripSuffix("_m"))
    trended
      .join(broadcast(seasonal),
        col("event_type") === col("s_type") &&
          hour(col("h")) === col("hod"))
      .withColumn("resid_m", col("detr_m") - col("seasonal_m"))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour_start"),
        (col("vm").cast("double") / 1e6).as("v"),
        u("trend_m"), u("seasonal_m"), u("resid_m"))
      .orderBy("event_type", "hour_start")
  }

  override def queries: Map[String, Q] = Map(
    "attribution" -> (attribution _),
    "anomaly_mad" -> (anomalyMad _),
    "ts_decompose" -> (tsDecompose _))

  override def oracles: Map[String, String] = Map(
    "attribution" ->
      """WITH t AS (SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(direct)') AS touch_type,
        |  count(*) AS n_conversions,
        |  count(DISTINCT user_id) AS n_users
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "anomaly_mad" ->
      """WITH med AS (SELECT event_type,
        |    CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6))
        |         AS DOUBLE) AS med
        |  FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type, max(m.med) AS med,
        |    CAST(CAST(quantile_cont(abs(e.value - m.med), 0.5)
        |              AS DECIMAL(18,6)) AS DOUBLE) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value, m.med, m.mad,
        |  CAST(CAST((e.value - m.med) / (1.4826 * m.mad)
        |       AS DECIMAL(18,6)) AS DOUBLE) AS rz
        |FROM events e JOIN mad m USING (event_type)
        |WHERE m.mad > 0
        |  AND abs(CAST(CAST((e.value - m.med) / (1.4826 * m.mad)
        |               AS DECIMAL(18,6)) AS DOUBLE)) > 3.5
        |ORDER BY e.event_id""".stripMargin,
    "ts_decompose" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(sum(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT)
        |      AS vm
        |  FROM events GROUP BY 1, 2),
        |trended AS (SELECT event_type, h, vm,
        |    count(*) OVER win AS n_win,
        |    sum(vm) OVER win AS t24
        |  FROM hourly
        |  WINDOW win AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
        |detr AS (SELECT event_type, h, vm,
        |    ((t24 + 24 * 10000000000000000) * 2 + 24) // 48
        |      - 10000000000000000 AS trend_m
        |  FROM trended WHERE n_win = 24),
        |detr2 AS (SELECT *, vm - trend_m AS detr_m FROM detr),
        |seasonal AS (SELECT event_type AS s_type,
        |    CAST(date_part('hour', h) AS INTEGER) AS hod,
        |    ((sum(detr_m) + count(*) * 10000000000000000) * 2 + count(*))
        |      // (2 * count(*)) - 10000000000000000 AS seasonal_m
        |  FROM detr2 GROUP BY 1, 2)
        |SELECT d.event_type,
        |  strftime(d.h, '%Y-%m-%d %H:%M') AS hour_start,
        |  CAST(d.vm AS DOUBLE) / 1e6 AS v,
        |  CAST(d.trend_m AS DOUBLE) / 1e6 AS trend,
        |  CAST(s.seasonal_m AS DOUBLE) / 1e6 AS seasonal,
        |  CAST(d.detr_m - s.seasonal_m AS DOUBLE) / 1e6 AS resid
        |FROM detr2 d JOIN seasonal s
        |  ON d.event_type = s.s_type
        |  AND CAST(date_part('hour', d.h) AS INTEGER) = s.hod
        |ORDER BY d.event_type, hour_start""".stripMargin)
}
