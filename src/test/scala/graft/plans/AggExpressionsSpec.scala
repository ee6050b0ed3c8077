package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggExpressionsSpec extends SparkSpec {

  test("topKPerKey equals the window rank formulation, without a Window") {
    // all-pairs cosine scores over the embeddings — a realistic
    // re-rank input with plenty of per-key candidates
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.sim.Vectors.normSq("embedding").as("nsq"))
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"),
      col("embedding").as("eq"), col("nsq").as("nq"))
    val c = e.filter(col("vec_id") >= 8).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ec"),
      col("nsq").as("nc"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", graft.sim.Vectors.cosineFrom(
        graft.sim.Vectors.dot("eq", "ec"), col("nq"), col("nc")))

    val viaAgg = AggExpressions
      .topKPerKey(scored, "query_id", "cosine", "neighbor_id", Nil, 5)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "aggregate path must not plan a Window")
    assert(plan.contains("Aggregate"), s"expected an aggregate plan:\n$plan")

    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = viaAgg
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == viaWindow,
      s"agg vs window diff: ${got.diff(viaWindow)} / ${viaWindow.diff(got)}")
  }
}
