package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §5's co-located-join claim, demonstrated: writing both
  * fact tables bucketed by the join key lets the join plan with NO
  * shuffle exchange on either side — at 100 TB that is the
  * difference between re-shuffling the fact table per join and
  * reading pre-placed buckets.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed co-located join plans without a shuffle, same result") {
    val dir = "/tmp/graft_bucketed"
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.mode("overwrite").option("path", s"$dir/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").option("path", s"$dir/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing is what saves the
      // shuffle (at these SFs the dimension side would broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scans not bucketed")
      val bucketed = j.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
