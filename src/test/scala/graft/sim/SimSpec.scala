package graft.sim

import graft.SparkSpec

class SimSpec extends SparkSpec {

  test("knn_brute returns 3 descending-cosine neighbors per query") {
    val rows = SimQueries.knnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { grp =>
      assert(grp.length == 3)
      val cos = grp.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(grp.forall(_.getAs[Long]("neighbor_id") >= 5))
    }
  }

  test("knn_brute agrees with a local exact computation") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expectedTop1 = (0L until 5L).map { q =>
      q -> emb.keys.filter(_ >= 5)
        .map(c => c -> cos(emb(q), emb(c)))
        .minBy { case (id, s) => (-s, id) }._1
    }.toMap
    val got = SimQueries.knnBrute(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got == expectedTop1)
  }

  test("knn_lsh neighbors share the query's hyperplane bucket") {
    val rows = SimQueries.knnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getAs[Int]("rank") <= 3) }
  }

  test("vector_ops: 64 dims, positive norms, max >= min") {
    SimQueries.vectorOps(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("dims") == 64)
      assert(r.getAs[Double]("l2_norm") > 0)
      assert(r.getAs[Double]("max_c") >= r.getAs[Double]("min_c"))
    }
  }
}
