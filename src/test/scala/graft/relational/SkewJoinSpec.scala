package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins what the q_skew_join_salted hash gate proves only in
  * aggregate: row-level identity with the plain join, the two-path
  * plan shape, hot-side replication, and the empty edge.
  */
class SkewJoinSpec extends SparkSpec {

  private def o = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice")
    .filter(col("o_custkey").isNotNull)
  private def c = Tables.customer(spark, sf)
    .select("c_custkey", "c_mktsegment")

  test("salted join is row-identical to the plain join") {
    val saltedJ = SkewJoin.salted(o, c, "o_custkey", "c_custkey",
      "o_orderkey")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
    assert(saltedJ.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    val s2 = saltedJ.select(plain.columns.map(col): _*)
    assert(s2.count() == plain.count())
    assert(s2.exceptAll(plain).isEmpty, "salted emitted rows plain lacks")
    assert(plain.exceptAll(s2).isEmpty, "salted lost rows of the plain join")
  }

  test("both paths carry rows and the hot dim side replicates xS") {
    val hot = o.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_custkey"))
      .limit(SkewJoin.HotK)
      .collect().map(_.getLong(0)).toSet
    assert(hot.size == SkewJoin.HotK)
    val nHotFacts = o.filter(col("o_custkey").isin(hot.toSeq: _*)).count()
    val nColdFacts = o.count() - nHotFacts
    assert(nHotFacts > 0 && nColdFacts > 0,
      "fixture must exercise both paths")
    // the salted output's hot rows equal the hot facts exactly (each
    // fact matches its dim row under exactly ONE salt — its own)
    val saltedJ = SkewJoin.salted(o, c, "o_custkey", "c_custkey",
      "o_orderkey")
    assert(saltedJ.filter(col("o_custkey").isin(hot.toSeq: _*)).count()
      == nHotFacts)
  }

  test("the physical plan is ONE join on (key, salt) — no second " +
      "fact scan, no union") {
    val plan = SkewJoin.salted(o, c, "o_custkey", "c_custkey",
      "o_orderkey").queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      "the one-join rewrite must not re-introduce the two-path union")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected exactly 1 join, saw $joins")
    // the salt participates in the join keys, so a hot key's rows
    // hash to SaltFactor distinct partitions
    assert(plan.contains("salt"), "salt column missing from the plan")
  }

  test("empty facts side yields an empty join, not an isin crash") {
    val saltedJ = SkewJoin.salted(o.limit(0), c, "o_custkey",
      "c_custkey", "o_orderkey")
    assert(saltedJ.count() == 0L)
  }
}
