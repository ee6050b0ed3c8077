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
    assert(Pq.knnIvfPq(none).isEmpty)
    assert(Pq.recall(none).isEmpty)
  }

  // --- IVFPQ (G12): an independent Scala replay of the full chain ---

  /** Mirror of the engine quantization: double term → DECIMAL(24,12)
    * half-up (Spark's double→decimal cast goes through the shortest
    * decimal string, which is what BigDecimal.decimal does too).
    */
  private def q12(x: Double): BigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  private def decSum(terms: Seq[Double]): Double =
    terms.map(q12).foldLeft(BigDecimal(0))(_ + _).toDouble

  /** The full IVFPQ algebra replayed in plain Scala from collected
    * arrays: assignment, probe sets, residual codes, LUTs, ADC, top-k.
    */
  private def expectedIvfPq(vecs: Map[Long, Array[Float]])
      : Seq[(Long, Int, Long, Double, Long)] = {
    val ids = vecs.keys.toSeq.sorted
    val cents = ids.filter(_ < Pq.CodebookIds)
    def dot(a: Array[Float], b: Array[Float]): Double =
      decSum(a.indices.map(d => a(d).toDouble * b(d).toDouble))
    val nsq = vecs.map { case (id, v) => id -> dot(v, v) }
    def cosRank(id: Long): Seq[Long] = cents
      .map(c => (dot(vecs(id), vecs(c)) /
        (math.sqrt(nsq(id)) * math.sqrt(nsq(c))), c))
      .sortBy { case (cos, c) => (-cos, c) }.map(_._2)
    val assign = ids.map(id => id -> cosRank(id).head).toMap
    val probes = ids.filter(_ < Pq.QueryIds)
      .map(q => q -> cosRank(q).take(Ivf.GivenProbe)).toMap
    def resid(id: Long, list: Long): Array[Double] =
      vecs(id).indices.map(d =>
        vecs(id)(d).toDouble - vecs(list)(d).toDouble).toArray
    def subD(r: Array[Double], cw: Array[Float], m: Int): Double =
      decSum((m * Pq.SubDim until (m + 1) * Pq.SubDim)
        .map(d => (r(d) - cw(d).toDouble) * (r(d) - cw(d).toDouble)))
    def codesOf(r: Array[Double]): Seq[Long] =
      (0 until Pq.NumSub).map(m =>
        cents.map(k => (subD(r, vecs(k), m), k)).minBy(identity)._2)
    val cands = ids.filter(_ >= Pq.QueryIds)
    val rows = for {
      q <- ids.filter(_ < Pq.QueryIds)
      y <- cands if probes(q).contains(assign(y))
    } yield {
      val list = assign(y)
      val qr = resid(q, list)
      val codes = codesOf(resid(y, list))
      val adist = decSum((0 until Pq.NumSub)
        .map(m => subD(qr, vecs(codes(m)), m)))
      (q, y, adist, list)
    }
    rows.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      rs.sortBy { case (_, y, d, _) => (d, y) }.take(Pq.K).zipWithIndex
        .map { case ((_, y, d, l), i) => (q, i + 1, y, d, l) }
    }.sortBy(r => (r._1, r._2))
  }

  test("knn_ivfpq matches an independent Scala replay of the full chain") {
    val out = Pq.knnIvfPq(emb).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adist"),
        r.getAs[Long]("list_id"))).toSeq
    val vecs = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    assert(out == expectedIvfPq(vecs))
  }

  test("knn_ivfpq candidates come only from the query's probed lists") {
    val vecs = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    val expected = expectedIvfPq(vecs)
    val probed = expected.map(_._5).toSet
    Pq.knnIvfPq(emb).collect().foreach { r =>
      assert(probed.contains(r.getAs[Long]("list_id")))
    }
  }

  test("pq_recall: hits recomputed from the two top-k frames; perfect " +
      "recall on a codeword-only corpus") {
    val rows = Pq.recall(emb).collect()
    assert(rows.length == Pq.QueryIds)
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= Pq.K)
      assert(r.getAs[Double]("recall") == hits.toDouble / Pq.K)
    }
    // ADC is EXACT squared L2 when every candidate is a codeword
    // (the PqSpec exactness anchor), so recall must be 1.0 there
    val small = emb.filter(col("vec_id") < Pq.CodebookIds)
    Pq.recall(small).collect().foreach { r =>
      assert(r.getAs[Double]("recall") == 1.0,
        s"query ${r.getAs[Long]("query_id")}")
    }
  }

  test("knn_pq_rerank: shortlist-bounded, exact-ordered, recall >= ADC") {
    val rerank = Pq.knnRerank(emb).collect()
    assert(rerank.length == Pq.QueryIds * Pq.K)
    // exact dist non-decreasing in rank per query
    rerank.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("dist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // every emitted neighbor came from the ADC top-R shortlist (stage
    // 2 reorders WITHIN stage 1's proposals, never beyond them)
    val shortSet = graft.plans.AggExpressions
      .topKPerKey(Pq.adcScores(emb), "query_id", "sim", "neighbor_id",
        Nil, Pq.RerankR)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rerank.forall(r => shortSet(
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))))
    val adcAll = Pq.knn(emb)
    // recall vs exact ground truth: rerank can only improve on ADC
    val q = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val c = emb.filter(col("vec_id") >= Pq.QueryIds)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"))
    val exact = graft.plans.AggExpressions.topKPerKey(
      c.crossJoin(broadcast(q))
        .withColumn("dsq", expr(
          """cast(aggregate(zip_with(eq, ec, (xv, yv) ->
            |  cast((cast(xv as double) - cast(yv as double))
            |    * (cast(xv as double) - cast(yv as double))
            |    as decimal(24,12))),
            |  cast(0 as decimal(24,12)),
            |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)"""
            .stripMargin))
        .withColumn("sim", -col("dsq")),
      "query_id", "sim", "neighbor_id", Nil, Pq.K)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcHits = adcAll.select("query_id", "neighbor_id").collect()
      .count(r => exact((r.getLong(0), r.getLong(1))))
    val rerankHits = rerank
      .count(r => exact((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))))
    assert(rerankHits >= adcHits,
      s"rerank recall ($rerankHits) fell below ADC ($adcHits)")
  }

  test("knn_ivfpq_rerank: shortlist-bounded and exact-ordered") {
    val rerank = Pq.knnIvfPqRerank(emb).collect()
    assert(rerank.nonEmpty && rerank.length <= Pq.QueryIds * Pq.K)
    rerank.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("dist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    val shortSet = graft.plans.AggExpressions
      .topKPerKey(Pq.ivfPqScores(emb), "query_id", "sim", "neighbor_id",
        Nil, Pq.RerankR)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rerank.forall(r => shortSet(
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))),
      "stage 2 emitted a neighbor outside the residual-ADC shortlist")
  }
}
