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

  test("hybrid knn scoring: exact ties at the k-boundary break by neighbor id") {
    import spark.implicits._
    // 15 bit-identical candidates (exact cosine ties straddling the
    // k=3 boundary) + 5 weaker ones: the fast-threshold pass must
    // keep ALL tied candidates so the exact re-rank's neighbor-id
    // tie-break picks the same rows a full decimal ranking would
    val dim = 16
    def v(c: Double): Array[Float] = {
      val s = math.sqrt(1 - c * c)
      Array.tabulate(dim)(j =>
        if (j == 0) c.toFloat else if (j == 1) s.toFloat else 0f)
    }
    val emb = ((0L, Array.tabulate(dim)(j => if (j == 0) 1f else 0f)) +:
      ((0 until 15).map(i => (100L + i, v(0.9))) ++
       (0 until 5).map(i => (200L + i, v(0.3))))).toDF("vec_id", "embedding")
    val out = Knn.bruteForce(emb,
      org.apache.spark.sql.functions.col("vec_id") < 1, 3).collect()
    assert(out.map(r => (r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"))).toSeq ==
      Seq((1, 100L), (2, 101L), (3, 102L)))
    assert(out.forall(r => math.abs(r.getAs[Double]("cosine") -
      out.head.getAs[Double]("cosine")) == 0.0))
  }

  test("knn_join salts an over-cap bucket: capped pair work, full ranks") {
    import spark.implicits._
    // 700 near-identical vectors (a corpus-bias cluster: one bucket
    // at ANY plane count, 700 > BucketCap=256 → ns = 3 salt cells)
    // plus 20 orthogonal one-hots that stay unsalted
    val dim = 64
    val hot = (0 until 700).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        if (j == 0) 1f else if (j == (i % 8) + 1) 1e-4f else 0f))
    }
    val cold = (0 until 20).map(i =>
      (1000L + i, Array.tabulate(dim)(j => if (j == i + 20) 1f else 0f)))
    val emb = (hot ++ cold).toDF("vec_id", "embedding")
    assert(graft.sim.Knn.BucketCap == 256)
    val out = Knn.lshJoin(emb, 3).collect()
    // every hot vector still retrieves a full top-3 from its salt cell
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    hot.foreach { case (id, _) =>
      val grp = byQ(id)
      assert(grp.length == 3)
      assert(grp.forall(_.getAs[Double]("cosine") > 0.99))
      // neighbors come from the hot cluster, never the orthogonal set
      assert(grp.forall(_.getAs[Long]("neighbor_id") < 700L))
    }
    // deterministic under input repartitioning (salt is md5/count-
    // derived, never partition-derived)
    val again = Knn.lshJoin(emb.repartition(7), 3).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))
    assert(out.map(key).toSet == again.map(key).toSet)
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

  test("embedding_quantize: error bounded by scale/2, high cosine, max lane saturates") {
    val rows = SimQueries.embeddingQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(scale > 0)
      // round-half-up quantization error is at most half a step
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-12)
      // the max-|x| lane hits exactly +/-127
      assert(r.getAs[Int]("n_sat") >= 1)
      assert(r.getAs[Double]("cos_q") > 0.99)
    }
  }

  test("embedding_quantize round-trips a hand vector and nulls the zero vector") {
    import spark.implicits._
    // plant: one simple vector and one all-zero vector through the same op
    val planted = Seq(
      (100000L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (100001L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = SimQueries.embeddingQuantizeFrame(planted).collect()
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val v = byId(100000L)
    // amax=1.0, scale=1/127; q = (127, -64, 32, 0) -> errors: 0, 0.5/127 ...
    assert(math.abs(v.getAs[Double]("scale") - 1.0 / 127) < 1e-15)
    assert(v.getAs[Int]("n_sat") == 1)
    assert(v.getAs[Double]("max_abs_err") <= v.getAs[Double]("scale") / 2 + 1e-12)
    val z = byId(100001L)
    assert(z.getAs[Double]("scale") == 0.0)
    assert(z.isNullAt(z.fieldIndex("cos_q")))
    assert(z.getAs[Int]("n_sat") == 0)
    assert(z.getAs[Double]("max_abs_err") == 0.0)
  }

  test("knn_qint8 ranks like the exact float path within quantization noise") {
    val q8 = SimQueries.knnQint8(spark, sf).collect()
    assert(q8.nonEmpty)
    q8.groupBy(_.getAs[Long]("query_id")).values.foreach { grp =>
      val byRank = grp.sortBy(_.getAs[Int]("rank"))
      assert(byRank.length <= 3)
      val cos = byRank.map(_.getAs[Double]("cos_q8"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      cos.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
    // int8 quantization perturbs cosines by ~1e-3 — top-1 should agree
    // with the exact float path on most queries
    val brute1 = SimQueries.knnBrute(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val q81 = q8.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val agree = brute1.count { case (q, n) => q81.get(q).contains(n) }
    assert(agree * 2 > brute1.size, s"top-1 agreement too low: $agree/${brute1.size}")
  }

  test("ann_recall equals the per-query brute∩lsh overlap over k") {
    val truth = SimQueries.knnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val lsh = SimQueries.knnLsh(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val rows = SimQueries.annRecall(spark, sf).collect()
    // one row per brute query, even if LSH found nothing for it
    assert(rows.map(_.getAs[Long]("query_id")).toSet == truth.keySet)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val hit = (truth(q) intersect lsh.getOrElse(q, Set.empty)).size
      assert(r.getAs[Long]("n_hit") == hit.toLong)
      assert(r.getAs[Double]("recall_at_k") == hit / 3.0)
      assert(r.getAs[Double]("recall_at_k") >= 0.0 &&
        r.getAs[Double]("recall_at_k") <= 1.0)
    }
  }

  test("embedding_centroids: 64 dims per label, local mean check") {
    val rows = SimQueries.embeddingCentroids(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.values.foreach { rs =>
      assert(rs.length == 64)
      assert(rs.map(_.getAs[Long]("n_vecs")).toSet.size == 1)
      assert(rs.map(_.getAs[Double]("inertia")).toSet.size == 1)
      assert(rs.head.getAs[Double]("inertia") > 0)
    }
    // spot-check one centroid component against a local computation
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
    val l0 = byLabel.keys.head
    val vs = emb.filter(_.getInt(0) == l0)
      .map(_.getSeq[Float](1).head.toDouble)
    val exp = vs.map(v => BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
    val got = byLabel(l0).find(_.getAs[Int]("dim") == 1).get
      .getAs[Double]("c")
    assert(got == exp, s"label $l0 dim 1: $got vs $exp")
  }

  test("knn_classify takes the majority label of the top-3 neighbors") {
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val knn = SimQueries.knnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val got = SimQueries.knnClassify(spark, sf).collect()
    assert(got.map(_.getAs[Long]("query_id")).toSet == knn.keySet)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val votes = knn(q).map(n => labels(n.getAs[Long]("neighbor_id")))
        .groupBy(identity).view.mapValues(_.length)
      val best = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(r.getAs[Int]("pred_label") == best._1)
      assert(r.getAs[Long]("votes") == best._2.toLong)
    }
  }
}
