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

  /** The SAME flavor tolerance one column over: `/root/testdata`
    * currently ships `o_orderdate` (and `l_shipdate`) as MICROS-NTZ
    * and the K/B queries are NTZ-tolerant — literal comparisons and
    * `year()`/`date_format` coerce identically under the repo's UTC
    * sessions — but until round 10 nothing PINNED that. This writes
    * orders/lineitem in both flavors, with rows straddling q3_join's
    * 1998-01-01 cutoff at the µs boundary, and asserts the date-
    * filtering join yields identical rows from both — the r8 failure
    * class closed for the remaining timestamp columns.
    */
  test("orders/lineitem NTZ and UTC date flavors answer q3_join identically") {
    import spark.implicits._
    val base = "/tmp/graft_orders_flavor"
    val cutoffUs = java.time.Instant.parse("1998-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    // orders at 1µs before the cutoff (kept), exactly at it
    // (dropped), and mid-1997 (kept)
    val orderRows = Seq(
      (1L, 10L, cutoffUs - 1L),
      (2L, 10L, cutoffUs),
      (3L, 11L, cutoffUs - 86400L * 200 * 1000000L))
    // lineitems straddle the `l_shipdate > cutoff` side
    val lineRows = Seq(
      (1L, 1000.0, 0.1, cutoffUs + 1L),
      (1L, 500.0, 0.0, cutoffUs),
      (2L, 700.0, 0.2, cutoffUs + 1L),
      (3L, 900.0, 0.05, cutoffUs + 86400L * 1000000L))
    def writeDir(dir: String, toTs: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      Seq((10L, "BUILDING"), (11L, "BUILDING"), (12L, "MACHINERY"))
        .toDF("c_custkey", "c_mktsegment")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
      orderRows.toDF("o_orderkey", "o_custkey", "us")
        .select(col("o_orderkey"), col("o_custkey"),
          toTs(col("us")).as("o_orderdate"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
      lineRows.toDF("l_orderkey", "l_extendedprice", "l_discount", "us")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          toTs(col("us")).as("l_shipdate"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    writeDir(s"$base/utc", us => timestamp_micros(us))
    writeDir(s"$base/ntz", us => timestamp_micros(us).cast(TimestampNTZType))
    // the stored flavors really differ
    assert(Tables.orders(spark, s"$base/utc")
      .schema("o_orderdate").dataType == TimestampType)
    assert(Tables.orders(spark, s"$base/ntz")
      .schema("o_orderdate").dataType == TimestampNTZType)
    def run(dir: String): List[(Long, Double, String)] =
      graft.relational.Relational.q3Join(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .toList
    val utc = run(s"$base/utc")
    val ntz = run(s"$base/ntz")
    assert(utc.nonEmpty, "fixture must survive the date filters")
    assert(utc == ntz, s"NTZ vs UTC q3_join rows: $ntz vs $utc")
    // the cutoff boundary actually cut: order 2 (at the cutoff) is out
    assert(!utc.exists(_._1 == 2L), "order at the cutoff must be filtered")
  }
}
