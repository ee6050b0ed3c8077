package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("as-of join picks the latest prior purchase per user") {
    val rows = AsOf.qAsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Long]("last_purchase_us") <= r.getAs[Long]("ts_us"))
      assert(r.getAs[Long]("since_purchase_us") >= 0)
    }
    // spot-check one user against a local replay
    val uid = rows.head.getAs[Long]("user_id")
    val evts = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("event_id", "event_type", "ts_us")
      .collect()
      .sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
    var lastPurchase: Option[Long] = None
    val expected = scala.collection.mutable.Map.empty[Long, Option[Long]]
    evts.foreach { e =>
      if (e.getAs[String]("event_type") == "purchase")
        lastPurchase = Some(e.getAs[Long]("ts_us"))
      if (e.getAs[String]("event_type") == "click")
        expected(e.getAs[Long]("event_id")) = lastPurchase
    }
    rows.filter(_.getAs[Long]("user_id") == uid).foreach { r =>
      val exp = expected(r.getAs[Long]("event_id"))
      val got = if (r.isNullAt(3)) None else Some(r.getAs[Long]("last_purchase_us"))
      assert(got == exp)
    }
  }

  test("salted join equals the plain join") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
    val o = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = AsOf.saltedJoin(li, o, "l_orderkey", 8)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = li.join(o, "l_orderkey")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("banded range join equals the naive theta join, with no cartesian") {
    import org.apache.spark.sql.functions._
    val banded = AsOf.qRangeJoin(spark, sf)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val e = graft.sources.Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val p = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us").as("t0"))
    val c = e.select(col("user_id").as("cu"), col("ts_us").as("t1"),
      col("event_type").as("ct"))
    val naive = p.join(c, col("cu") === col("user_id") &&
        col("t1") > col("t0") &&
        col("t1") <= col("t0") + AsOf.FollowWindowUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_follow"), countDistinct("ct").as("n_types"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = banded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
  }
}
