package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqTrainedSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("geometry: codeword count and probe cap follow the scale rules") {
    assert(PqTrained.codewords(500) == 16)
    assert(PqTrained.codewords(64 * 256) == 256)
    assert(PqTrained.codewords(2000000) == 256)
    assert(PqTrained.probeCount(16) == 4)
    assert(PqTrained.probeCount(128) == 32)
    // the cap is the sublinearity: fraction shrinks as lists grow
    assert(PqTrained.probeCount(1400) == 32)
  }

  test("trained knn returns k rows per query from <= nProbe lists") {
    val rows = PqTrained.knn(emb).collect()
    assert(rows.length == Pq.QueryIds * Pq.K)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until Pq.QueryIds.toLong).toSet)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to Pq.K))
      // results come from the probed lists only
      assert(rs.map(_.getAs[Long]("list_id")).distinct.length <=
        PqTrained.probeCount(1000))
      // adist ascending with rank
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("adist"))
      assert(sorted.sameElements(sorted.sorted))
    }
  }

  test("recall floor: the trained index finds true neighbors " +
      "(deterministic — seeded fits over an md5 sample)") {
    val atDefault = PqTrained.meanRecall(emb)
    val atAll = PqTrained.meanRecall(emb, Some(10000))
    info(s"meanRecall default=$atDefault allLists=$atAll")
    // Floors pinned from the measured deterministic values with slack.
    // Context: the test corpus is RANDOM 64-dim floats — the
    // adversarial case for PQ (no subspace structure to quantize), so
    // absolute recall is low by nature; a broken encode/probe would
    // sit at ~K/n ≈ 0.006, an order of magnitude below the floor.
    assert(atDefault >= 0.1,
      s"recall@${Pq.K} at default probes = $atDefault")
    assert(atAll >= atDefault,
      s"probe-sweep regression: allLists=$atAll < default=$atDefault " +
        "(empirical pin on this corpus — superset candidates are not " +
        "a recall guarantee in general)")
    // training the codebook must beat the pinned given-quantizer twin
    // on the same corpus (its measured mean is 1/15 here)
    val givenMean = Pq.ivfPqRecall(emb)
      .agg(avg("recall")).collect()(0).getDouble(0)
    info(s"given-twin meanRecall=$givenMean")
    assert(atDefault >= givenMean,
      s"trained recall $atDefault fell below the given twin $givenMean")
  }

  test("served knn from the saved artifact is bit-equal to in-session") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained").toString
    PqTrained.save(emb, dir)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val served = PqTrained
      .servedKnn(spark, dir, queries, col("vec_id") >= Pq.QueryIds)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val fresh = PqTrained.knn(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(served.sorted.sameElements(fresh.sorted))
  }

  test("the served trained scan is partition-pruned to the probed lists") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_prune").toString
    PqTrained.save(emb, dir)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val plan = PqTrained
      .servedKnn(spark, dir, queries, col("vec_id") >= Pq.QueryIds)
      .queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*list_id[^\\]]*IN".r
      .findFirstIn(plan)
    assert(pruned.isDefined, s"no partition IN-filter on list_id in:\n$plan")
  }

  test("empty corpus serves an empty result, not an MLlib failure") {
    val empty = emb.filter(lit(false))
    val out = PqTrained.knn(empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "adist", "list_id"))
  }
}
