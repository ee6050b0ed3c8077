package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Join-strategy hints — the escape hatch when a 100 TB plan needs a
  * strategy the optimizer's size estimates won't pick on their own.
  * Each hint must actually flip the physical operator AND leave the
  * result bit-identical.
  */
class HintSpec extends SparkSpec {

  private def joined(hint: String) = {
    val o = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment")
    o.join(c.hint(hint), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(graft.Fp.dsum2(col("o_totalprice")).as("rev"))
      .orderBy("c_mktsegment")
  }

  test("join hints flip the physical strategy without changing output") {
    val plans = Map(
      "broadcast" -> "BroadcastHashJoin",
      "shuffle_hash" -> "ShuffledHashJoin",
      "merge" -> "SortMergeJoin")
    val results = plans.keys.map { h =>
      val df = joined(h)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains(plans(h)),
        s"hint $h did not produce ${plans(h)}")
      h -> df.collect().map(_.toString).toSeq
    }.toMap
    assert(results("broadcast") == results("shuffle_hash"))
    assert(results("broadcast") == results("merge"))
    assert(results("broadcast").nonEmpty)
  }
}
