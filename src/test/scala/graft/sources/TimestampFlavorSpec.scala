package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `Tables.events` must normalize every parquet timestamp flavor a
  * real writer produces to the same (ts: TIMESTAMP-UTC, ts_ns: long)
  * face. Round 8 proved why: the driver regenerated events.parquet
  * with pandas/pyarrow defaults — TIMESTAMP(MICROS,
  * isAdjustedToUTC=false), i.e. TIMESTAMP_NTZ to Spark — and the
  * then-current reader threw `unix_micros` analysis errors on it,
  * silently dropping 15 operators from the correctness gate. This
  * spec writes the SAME events in all three flavors and asserts
  * identical normalized rows, so writer drift is a caught regression.
  */
class TimestampFlavorSpec extends SparkSpec {

  // epoch micros chosen off the second boundary so a ms/s truncation
  // bug would show; spans a day boundary
  private val rows = Seq(
    (1L, 1700000000123456L, 10L, "view", 1.0),
    (2L, 1700000001999999L, 11L, "click", 2.0),
    (3L, 1700086400000001L, 10L, "view", 3.0))

  private def writeFlavor(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def normalized(dir: String): List[(Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList

  test("NANOS-long, MICROS-UTC, and MICROS-NTZ flavors normalize identically") {
    val base = "/tmp/graft_ts_flavor"
    // flavor 1: what `nanosAsLong` reading of TIMESTAMP(NANOS) yields —
    // an epoch-nanos LongType column
    writeFlavor(s"$base/nanos", (col("us") * 1000L).cast(LongType))
    // flavor 2: TIMESTAMP(MICROS, isAdjustedToUTC=true)
    writeFlavor(s"$base/utc", timestamp_micros(col("us")))
    // flavor 3: TIMESTAMP(MICROS, isAdjustedToUTC=false) — the
    // pandas/pyarrow default, read back as TIMESTAMP_NTZ
    writeFlavor(s"$base/ntz", timestamp_micros(col("us")).cast(TimestampNTZType))

    val flavors = Seq("nanos", "utc", "ntz").map(f => f -> normalized(s"$base/$f"))
    // stored flavor really differs before normalization
    assert(Tables.table(spark, s"$base/nanos", "events")
      .schema("ts").dataType == LongType)
    assert(Tables.table(spark, s"$base/ntz", "events")
      .schema("ts").dataType == TimestampNTZType)
    assert(Tables.table(spark, s"$base/utc", "events")
      .schema("ts").dataType == TimestampType)
    // after Tables.events: ts is a plain TIMESTAMP everywhere …
    Seq("nanos", "utc", "ntz").foreach { f =>
      assert(Tables.events(spark, s"$base/$f").schema("ts")
        .dataType == TimestampType, s"flavor $f ts dtype")
    }
    // … and every flavor yields the same (event_id, epoch-µs, ts_ns)
    val expected = rows.map { case (id, us, _, _, _) => (id, us, us * 1000L) }
      .sortBy(_._1).toList
    flavors.foreach { case (f, got) =>
      assert(got == expected, s"flavor $f normalized rows")
    }
  }
}
