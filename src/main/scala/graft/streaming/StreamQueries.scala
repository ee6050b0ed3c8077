package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.multimodal.Blob
import graft.sources.Tables

/** SURVEY §2 J (batch-verifiable faces) + I — driver queries. The
  * streaming variants of the same transforms are spec-tested with
  * MemoryStream (watermarks/state have no DuckDB analogue).
  */
object StreamQueries extends QueryModule {

  /** J1 — tumbling-hour aggregate per event type. */
  def eventsWindowed(s: SparkSession, d: String): DataFrame =
    Streaming.windowedCounts(Tables.events(s, d))
      .orderBy("hour_start", "event_type")

  /** J2 — gap sessionization (exact ns arithmetic). */
  def sessionizeQ(s: SparkSession, d: String): DataFrame =
    Streaming.sessionize(Tables.events(s, d))
      .select("user_id", "session_id", "n_events", "start_us", "end_us",
        "duration_us")
      .orderBy("user_id", "session_id")

  /** I — blob wrap + metadata/feature projection (codec-free part;
    * the typed decode path is spec-tested).
    */
  def blobPipeline(s: SparkSession, d: String): DataFrame =
    Blob.fromDocuments(Tables.documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"), col("mime"),
        length(col("payload")).as("n_bytes"),
        expr("cast(width div 2 as int)").as("thumb_w"),
        expr("cast(conv(substring(md5(payload), 1, 8), 16, 10) as bigint)")
          .as("content_hash"))
      .orderBy("doc_id")

  /** I (frame face) — the frame-sampling fan-out as a gated driver
    * query: one row per sampled timestamp per blob, derived fully in
    * executors (flatMap, no driver loop). The stub "decode" is exact
    * integer arithmetic on (payload length, duration), so the whole
    * fan-out — indices, timestamps, byte spans — sits inside the
    * DuckDB hash gate; a real deployment swaps the byte-slice stub
    * for the codec call and keeps this exact plumbing.
    */
  def blobFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blobs = Blob
      .fromDocuments(Tables.documents(s, d), "doc_id", "text")
      .as[Blob.BlobRow]
    Blob.frameSample(blobs, 2000L).toDF().orderBy("id", "frame_idx")
  }

  /** I (resize face) — the 1:1 resize transform as a gated driver
    * query: aspect-preserving fit to maxDim=64 with the stub codec's
    * area-proportional payload shrink. Scale arithmetic is one double
    * division + truncating casts — exact in both engines — so the
    * resized metadata and payload sizes hash-gate like blob_frames.
    */
  def blobResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blobs = Blob
      .fromDocuments(Tables.documents(s, d), "doc_id", "text")
      .as[Blob.BlobRow]
    Blob.resize(blobs, 64).toDF()
      .select(col("id"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"))
      .orderBy("id")
  }

  /** K16 — ordered funnel over the event stream (view → click →
    * purchase, each step strictly after the previous): the
    * sequence-matching shape product analytics runs daily. Expressed
    * as three chained min-after-min aggregates, every one keyed on
    * user_id — co-partitioned joins, no window over the raw stream, no
    * per-user driver work; at 100 TB each stage shuffles one row per
    * qualifying user, not the event volume.
    */
  def qFunnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d))

  /** The funnel body over any (user_id, event_type, ts) frame. */
  def funnel(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("view_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") > col("view_us"))
      .groupBy("user_id").agg(min("ts_us").as("click_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") > col("click_us"))
      .groupBy("user_id").agg(min("ts_us").as("purchase_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        lit(1) + col("click_us").isNotNull.cast("int")
          + col("purchase_us").isNotNull.cast("int"))
      .select("user_id", "view_us", "click_us", "purchase_us", "stage")
      .orderBy("user_id")
  }

  /** K17 — weekly retention cohorts: users grouped by the ISO week of
    * their first event; each later active week contributes to
    * (cohort_week, week_offset, distinct users) — the other
    * product-analytics staple next to [[qFunnel]]. Shape: one
    * first-event aggregate, a co-partitioned join on user_id, one
    * distinct-count aggregate — the cohort matrix is
    * O(weeks²) rows regardless of event volume.
    */
  def retentionCohorts(s: SparkSession, d: String): DataFrame =
    cohorts(Tables.events(s, d))

  /** The cohort body over any (user_id, ts) frame. */
  def cohorts(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      date_trunc("week", col("ts")).as("w"))
    val first = e.groupBy("user_id").agg(min("w").as("cw"))
    e.join(first, "user_id")
      .groupBy(
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        ((expr("unix_micros(w)") - expr("unix_micros(cw)"))
          / lit(7L * 86400L * 1000000L)).cast("int").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** K21 — z-score anomaly detection over the event stream: per
    * event_type mean/std from ONE map-side-combinable aggregate
    * (exact decimal sums of value and value², so both engines derive
    * bit-identical moments), broadcast back onto the stream, flag
    * |z| > 3. The monitoring primitive every ingestion pipeline runs;
    * at 100 TB the stats side is one tiny broadcast row per group and
    * the scan stays map-only.
    */
  def tsOutliers(s: SparkSession, d: String): DataFrame =
    outliers(Tables.events(s, d))

  /** Per-type exact decimal moments — the "training" aggregate shared
    * by the batch face and [[Streaming.outlierStream]]'s static side.
    */
  def outlierStats(events: DataFrame): DataFrame =
    events.select("event_type", "value").groupBy("event_type").agg(
      count(lit(1)).as("n"),
      graft.Fp.dsum6(col("value")).as("s"),
      sum((col("value") * col("value")).cast("decimal(27,6)"))
        .cast("double").as("sq"))

  /** The z-score body over any (event_id, event_type, value) frame.
    * (sd > 0 guard: a constant series gives z = 0/0 = NaN, and BOTH
    * engines order NaN above every number — without the guard every
    * row of a degenerate series would "outlie".)
    */
  def outliers(events: DataFrame): DataFrame =
    Streaming.outlierStream(
        events.select("event_id", "event_type", "value"),
        outlierStats(events))
      .select(col("event_id"), col("event_type"), col("value"),
        col("z").cast("decimal(18,6)").cast("double").as("z"))
      .orderBy("event_id")

  /** K22 — time-RANGE window frame: per event, the trailing-30 s
    * count and exact-decimal value sum within its event_type — the
    * moving-aggregate shape ROWS frames can't express (physical time,
    * not row counts). One shuffle on event_type, one ordered window
    * pass; output thinned to every 20th event so the gate result
    * stays bounded while every row still exercises the frame.
    */
  def qRangeFrame(s: SparkSession, d: String): DataFrame =
    rangeFrame(Tables.events(s, d))

  /** The trailing-window body over any (event_id, event_type, ts,
    * value) frame.
    */
  def rangeFrame(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("ts_us"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("ts_us")
      .rangeBetween(-30L * 1000000L, 0L)
    e.withColumn("n_30s", count(lit(1)).over(w))
      .withColumn("sum_30s",
        sum(col("value").cast("decimal(27,6)")).over(w)
          .cast("double"))
      .filter(col("event_id") % 20 === 0)
      .select("event_id", "event_type", "ts_us", "n_30s", "sum_30s")
      .orderBy("event_id")
  }

  /** K24 — next-event transition matrix (first-order Markov over the
    * event stream): per-user lag-1 window pairs consecutive events,
    * then ONE map-side-combinable aggregate counts (from, to) cells
    * and a window over the O(types²) matrix derives transition
    * probabilities. The user-journey summary next to [[qFunnel]];
    * the only event-volume shuffle is the per-user window, and the
    * probability pass runs on the tiny matrix, never the stream.
    */
  def eventTransitions(s: SparkSession, d: String): DataFrame =
    transitions(Tables.events(s, d))

  /** The transition-matrix body over any (event_id, user_id, ts,
    * event_type) frame. (event_id tie-breaks equal timestamps so the
    * pairing is a total order both engines agree on.)
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val t = events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    t.withColumn("p",
        col("n").cast("double") / sum("n").over(wTot).cast("double"))
      .orderBy("from_type", "to_type")
  }

  override def queries: Map[String, Q] = Map(
    "events_windowed" -> (eventsWindowed _),
    "sessionize" -> (sessionizeQ _),
    "blob_pipeline" -> (blobPipeline _),
    "blob_frames" -> (blobFrames _),
    "blob_resize" -> (blobResize _),
    "q_funnel" -> (qFunnel _),
    "retention_cohorts" -> (retentionCohorts _),
    "ts_outliers" -> (tsOutliers _),
    "q_range_frame" -> (qRangeFrame _),
    "event_transitions" -> (eventTransitions _))

  override def oracles: Map[String, String] = Map(
    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_us(ts), event_id)
        |      AS to_type
        |  FROM events),
        |t AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |      FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin,
    "ts_outliers" ->
      """WITH s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(value*value AS DECIMAL(27,6))) AS DOUBLE) AS sq
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  CAST(CAST((e.value - s.s/s.n)
        |         / sqrt(s.sq/s.n - (s.s/s.n)*(s.s/s.n))
        |       AS DECIMAL(18,6)) AS DOUBLE) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE sqrt(s.sq/s.n - (s.s/s.n)*(s.s/s.n)) > 0
        |  AND abs((e.value - s.s/s.n)
        |          / sqrt(s.sq/s.n - (s.s/s.n)*(s.s/s.n))) > 3
        |ORDER BY e.event_id""".stripMargin,
    "q_range_frame" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |             value FROM events),
        |w AS (SELECT event_id, event_type, ts_us,
        |        count(*) OVER win AS n_30s,
        |        CAST(sum(CAST(value AS DECIMAL(27,6))) OVER win
        |             AS DOUBLE) AS sum_30s
        |      FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts_us
        |        RANGE BETWEEN 30000000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, ts_us, n_30s, sum_30s
        |FROM w WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    "retention_cohorts" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
        |f AS (SELECT user_id, min(w) AS cw FROM e GROUP BY 1)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST((epoch_us(e.w) - epoch_us(f.cw))
        |       // CAST(604800000000 AS BIGINT) AS INTEGER) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |v AS (SELECT user_id, min(ts_us) AS view_us FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS click_us
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.view_us
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS purchase_us
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.click_us
        |      GROUP BY 1)
        |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
        |  CAST(1 + CAST(c.click_us IS NOT NULL AS INT)
        |         + CAST(p.purchase_us IS NOT NULL AS INT) AS INTEGER) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "events_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts_us,
        |          lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_ts
        |        FROM e)),
        |numbered AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM numbered
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "blob_resize" ->
      """WITH b AS (SELECT doc_id AS id,
        |    CAST(length(text) AS BIGINT) AS w,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS plen
        |  FROM documents),
        |s AS (SELECT id, w, plen,
        |    LEAST(CAST(1.0 AS DOUBLE),
        |          CAST(64.0 AS DOUBLE) / GREATEST(w, 1)) AS sc
        |  FROM b)
        |SELECT id,
        |  CAST(GREATEST(CAST(floor(w * sc) AS BIGINT), 1) AS INTEGER)
        |    AS width,
        |  CAST(1 AS INTEGER) AS height,
        |  CAST(LEAST(GREATEST(CAST(floor((plen * sc) * sc) AS BIGINT), 1),
        |             plen) AS INTEGER) AS n_bytes
        |FROM s ORDER BY id""".stripMargin,
    "blob_frames" ->
      """WITH b AS (SELECT doc_id AS id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS plen,
        |    CAST(length(text) AS BIGINT) * 10 AS dur
        |  FROM documents),
        |f AS (SELECT id, CAST(i AS INT) AS frame_idx,
        |    CAST(i * 2000 AS BIGINT) AS ts_ms, plen, dur
        |  FROM b, UNNEST(range(0, GREATEST(dur // 2000, 0) + 1)) u(i))
        |SELECT id, frame_idx, ts_ms,
        |  CAST(GREATEST(LEAST(plen - ((plen * ts_ms) // GREATEST(dur, 1)),
        |                      16), 0) AS INTEGER) AS n_bytes
        |FROM f ORDER BY id, frame_idx""".stripMargin,
    "blob_pipeline" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(length(text) // 2 AS INTEGER) AS thumb_w,
        |  CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin)
}
