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

  override def queries: Map[String, Q] = Map(
    "events_windowed" -> (eventsWindowed _),
    "sessionize" -> (sessionizeQ _),
    "blob_pipeline" -> (blobPipeline _))

  override def oracles: Map[String, String] = Map(
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
    "blob_pipeline" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(length(text) // 2 AS INTEGER) AS thumb_w,
        |  CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin)
}
