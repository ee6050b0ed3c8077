package graft

import org.apache.spark.sql.DataFrame

/** The load-bearing claim behind the oracle gate: results are
  * bit-identical regardless of physical partitioning (decimal-exact
  * aggregation is order-independent). Shuffle-partition count and
  * input partitioning must not change a single byte.
  */
class DeterminismSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q1_agg identical under different input partitioning") {
    val base = canon(graft.relational.Relational.q1Agg(spark, sf))
    val li = graft.sources.Tables.lineitem(spark, sf).repartition(7)
    li.createOrReplaceTempView("li_repart")
    // rebuild the same aggregate over the repartitioned input
    import org.apache.spark.sql.functions._
    val re = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Fp.dsum2(col("l_quantity")).as("sum_qty"),
        Fp.dsum2(col("l_extendedprice")).as("sum_base_price"),
        Fp.dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Fp.davg(col("l_quantity")).as("avg_qty"),
        Fp.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(canon(re) == base)
  }

  test("insights_trend identical across repeated runs") {
    val a = canon(graft.analytics.Insights.insightsTrend(spark, sf))
    val b = canon(graft.analytics.Insights.insightsTrend(spark, sf))
    assert(a == b)
  }

  test("q3_join identical with AQE disabled") {
    // AQE rewrites join strategies and coalesces partitions at
    // runtime — none of which may change a byte of output
    val withAqe = canon(graft.relational.Relational.q3Join(spark, sf))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(canon(graft.relational.Relational.q3Join(spark, sf)) == withAqe)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("round-5 ops identical under repartitioned inputs") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val a1 = canon(graft.dedup.Dedup.substringDup(docs, "doc_id", "text"))
    val a2 = canon(graft.dedup.Dedup.substringDup(
      docs.repartition(7), "doc_id", "text"))
    assert(a1 == a2)
    val ev = graft.sources.Tables.events(spark, sf)
    assert(canon(graft.streaming.StreamQueries.funnel(ev)) ==
      canon(graft.streaming.StreamQueries.funnel(ev.repartition(5))))
    assert(canon(graft.streaming.StreamQueries.cohorts(
        ev.select("user_id", "ts"))) ==
      canon(graft.streaming.StreamQueries.cohorts(
        ev.select("user_id", "ts").repartition(5))))
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    assert(canon(graft.sim.SimQueries.embeddingQuantizeFrame(emb)) ==
      canon(graft.sim.SimQueries.embeddingQuantizeFrame(emb.repartition(3))))
  }

  test("session-3 ops identical under repartitioned inputs") {
    import graft.analytics.EventOps
    val ev = graft.sources.Tables.events(spark, sf)
    val ev7 = ev.repartition(7)
    assert(canon(EventOps.attributionOf(ev)) ==
      canon(EventOps.attributionOf(ev7)))
    assert(canon(EventOps.anomalyMadOf(ev)) ==
      canon(EventOps.anomalyMadOf(ev7)))
    // the integer micro-unit decomposition is the op where the
    // order-independence claim is doing real work (window sums +
    // two rational divisions per row)
    assert(canon(EventOps.tsDecomposeOf(ev)) ==
      canon(EventOps.tsDecomposeOf(ev7)))
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.6),
      (10L, 11L, 0.7)).toDF("doc_a", "doc_b", "jaccard")
    assert(canon(graft.dedup.Graph.pagerankOf(pairs)) ==
      canon(graft.dedup.Graph.pagerankOf(pairs.repartition(5))))
  }

  test("round-6 given-centroids ops identical under repartitioned inputs") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val emb7 = emb.repartition(7)
    // the argmax-cosine assignment (max_by over decimal-quantized
    // dots) and the probe/pair chains must not move a byte under a
    // different physical layout
    assert(canon(graft.sim.Ivf.semdedupGivenCentroids(emb)) ==
      canon(graft.sim.Ivf.semdedupGivenCentroids(emb7)))
    assert(canon(graft.sim.Ivf.knnGivenCentroids(emb, col("vec_id") < 5, 3)) ==
      canon(graft.sim.Ivf.knnGivenCentroids(emb7, col("vec_id") < 5, 3)))
    // IVFPQ stacks residual codes + ADC tables on the same assignment;
    // every reduction is decimal-quantized, so repartitioning must not
    // move a byte of codes, distances, or ranks
    assert(canon(graft.sim.Pq.knnIvfPq(emb)) ==
      canon(graft.sim.Pq.knnIvfPq(emb7)))
    assert(canon(graft.sim.Pq.recall(emb)) ==
      canon(graft.sim.Pq.recall(emb7)))
  }
}
