package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("codebook vectors encode to their own codeword in every subspace") {
    val own = Pq.encode(emb).filter(col("vec_id") < Pq.CodebookIds).collect()
    assert(own.length == Pq.CodebookIds)
    own.foreach { r =>
      val id = r.getAs[Long]("vec_id").toInt
      (0 until Pq.NumSub).foreach { m =>
        assert(r.getAs[Long](s"code_$m") == id, s"vec $id subspace $m")
      }
    }
    // and every code addresses a real codeword
    Pq.encode(emb).collect().foreach { r =>
      (0 until Pq.NumSub).foreach { m =>
        val c = r.getAs[Long](s"code_$m")
        assert(c >= 0 && c < Pq.CodebookIds)
      }
    }
  }

  test("ADC distance is EXACT squared L2 for codeword candidates") {
    // candidates in [QueryIds, CodebookIds) reconstruct losslessly
    // (their codes are their own subvectors), so the ADC sum must
    // equal the true quantized squared L2 — an exactness anchor the
    // approximation collapses onto. Corpus restricted to the codebook
    // rows so EVERY candidate is a codeword.
    val adc = Pq.knn(emb.filter(col("vec_id") < Pq.CodebookIds)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("adist")).toMap
    val l2sq =
      """cast(aggregate(
        |  zip_with(ea, eb, (xv, yv) ->
        |    cast((cast(xv as double) - cast(yv as double))
        |      * (cast(xv as double) - cast(yv as double)) as decimal(24,12))),
        |  cast(0 as decimal(24,12)),
        |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)""".stripMargin
    val a = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("qid"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id") >= Pq.QueryIds &&
        col("vec_id") < Pq.CodebookIds)
      .select(col("vec_id").as("nid"), col("embedding").as("eb"))
    val exact = a.crossJoin(b).withColumn("d", expr(l2sq)).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
        -> r.getAs[Double]("d")).toMap
    assert(adc.size == Pq.QueryIds * Pq.K)
    adc.foreach { case (k, d) => assert(d == exact(k), s"pair $k") }
  }

  test("knn_pq shape: k rows per query, distance non-decreasing in rank") {
    val rows = Pq.knn(emb).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Pq.QueryIds)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == Pq.K)
      val ordered = rs.sortBy(_.getAs[Int]("rank"))
      assert(ordered.map(_.getAs[Int]("rank")).toSeq == (1 to Pq.K))
      val ds = ordered.map(_.getAs[Double]("adist"))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
    }
  }

  test("empty corpus degrades to empty frames") {
    import spark.implicits._
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Pq.encode(none).isEmpty)
    assert(Pq.knn(none).isEmpty)
  }
}
