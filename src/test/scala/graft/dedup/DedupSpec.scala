package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("dedup_exact collapses the doubled corpus to one keeper per text") {
    val rows = DedupQueries.dedupExact(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n)
    assert(rows.forall(_.getAs[Long]("n_copies") == 2))
    assert(rows.forall(_.getAs[Long]("keeper_id") < 10000))
  }

  test("minhash LSH finds the planted near-duplicates, all above tau") {
    val pairs = DedupQueries.dedupMinhash(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    // high-similarity pairs (J >= 0.9) are recalled with near-certainty
    val sh = Dedup.shingleRows(
      graft.sources.Tables.documents(spark, sf), "doc_id", "text")
    val all = sh.select(col("doc_id").as("doc_a"), col("g"))
      .join(sh.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val strong = all
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strong.subsetOf(found), s"missed: ${strong -- found}")
  }

  test("simhash pairs are all within the hamming bound") {
    val pairs = DedupQueries.dedupSimhash(spark, sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 6))
  }

  test("simhash band geometry ladder pins occupancy and matches the oracle thresholds") {
    // integer ladder, no float log — these boundaries are replayed
    // verbatim by the dedup_simhash oracle's geom CASE
    assert(Dedup.simhashBandBits(100) == 8)
    assert(Dedup.simhashBandBits(64 * 256) == 8)       // boundary stays
    assert(Dedup.simhashBandBits(64 * 256 + 1) == 9)   // first widening
    assert(Dedup.simhashBandBits(64 * 2048) == 11)
    assert(Dedup.simhashBandBits(64 * 2048 + 1) == 12)
    assert(Dedup.simhashBandBits(64L * 32768) == 15)
    assert(Dedup.simhashBandBits(10_000_000L) == 16)   // capped
    assert(Dedup.simhashNumBands(8) == 4)
    assert(Dedup.simhashNumBands(11) == 2)
    assert(Dedup.simhashNumBands(16) == 2)
    // per-band occupancy n/2^W stays ≤ 64 up to the cap
    for (n <- Seq(1000L, 20000L, 300000L, 2000000L)) {
      val w = Dedup.simhashBandBits(n)
      assert(n.toDouble / (1L << w) <= 64.0, s"occupancy at n=$n w=$w")
    }
  }

  test("ngram jaccard pairs are symmetric-free and above tau") {
    val pairs = DedupQueries.dedupNgramJaccard(spark, sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("embedding near-dup cosines are in valid range") {
    val pairs = DedupQueries.embeddingNeardup(spark, sf).collect()
    pairs.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.45 && c <= 1.0 + 1e-9)
    }
  }

  test("ngram jaccard all-hot fallback recovers template near-dups") {
    import spark.implicits._
    // 140 identical template docs: every trigram has df = 140 >
    // MaxGramDf, so the rare-gram path sees NOTHING — only the
    // trigram-set MinHash fallback can pair them. Two rare-gram docs
    // ride along to exercise both paths in one plan.
    val template = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 140).map(i => (i.toLong, template)) ++ Seq(
      (1000L, "one singular sentence mentioning flightless penguins"),
      (1001L, "one singular sentence mentioning flightless penguins")))
      .toDF("doc_id", "text")
    assert(Dedup.MaxGramDf < 140)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).collect()
    val pset = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pset.contains((1000L, 1001L))) // rare path still live
    val tpairs = pairs.filter(r => r.getAs[Long]("doc_b") < 140)
    assert(tpairs.length == 140 * 139 / 2,
      s"all-hot fallback found ${tpairs.length} of ${140 * 139 / 2}")
    tpairs.foreach(r => assert(r.getAs[Double]("jaccard") == 1.0))
  }

  test("embedding near-dup plan is a grid equi-join, not a nested loop") {
    val plan = DedupQueries.embeddingNeardup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop in plan")
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
  }

  test("embedding near-dup grid join equals brute force exactly") {
    import org.apache.spark.sql.functions.{broadcast => bc}
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.sim.Vectors.normSq("embedding").as("nsq"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nsq").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nsq").as("nb"))
    val brute = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", graft.sim.Vectors.cosineFrom(
        graft.sim.Vectors.dot("ea", "eb"), col("na"), col("nb")))
      .filter(col("cosine") >= 0.45)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = DedupQueries.embeddingNeardup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(grid == brute, s"grid vs brute diff: ${grid.diff(brute)} / ${brute.diff(grid)}")
  }

  test("neardup dispatch: exact grid under the guard, LSH-approx above it") {
    import spark.implicits._
    val dim = 40
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val emb = ((0 until 40).map(i => (i.toLong, oneHot(i))) ++
      (0 until 5).map(i => (100L + i, oneHot(i * 7))))
      .toDF("vec_id", "embedding")
    val exact = DedupQueries.neardupPairs(emb, 0.45).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(exact == (0 until 5).map(i => (i * 7L, 100L + i)).toSet)
    spark.conf.set("spark.graft.neardup.maxExact", "10")
    try {
      val auto = DedupQueries.neardupAuto(emb, 0.45)
      // above the (lowered) guard: the LSH bucket join, not the grid
      assert(auto.queryExecution.analyzed.toString.contains("bucket"),
        "guard did not dispatch to the approximate path")
      val approx = auto.collect()
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      // identical vectors always share a bucket, so the approx path
      // recovers every duplicate pair here (subset guarantee in general)
      assert(approx == exact)
    } finally spark.conf.unset("spark.graft.neardup.maxExact")
    // back under the guard: the grid path again (no bucket key anywhere)
    assert(!DedupQueries.neardupAuto(emb, 0.45)
      .queryExecution.analyzed.toString.contains("bucket"))
  }

  test("substring_dedup flags planted cross-doc windows and only those") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different opening $shared closing words"),
      (3L, "a unique document with no overlapping character windows at all here"),
      (4L, "tiny")) // shorter than the window: excluded entirely
      .toDF("doc_id", "text")
    val rows = Dedup.substringDup(docs, "doc_id", "text").collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId.contains(4L))
    assert(byId(3L).getAs[Long]("n_dup") == 0L)
    assert(byId(3L).getAs[Double]("dup_ratio") == 0.0)
    // both planted docs carry duplicated windows: every in-doc window
    // fully inside the shared span is cross-doc
    Seq(1L, 2L).foreach { id =>
      val r = byId(id)
      // the common span includes the space on each side of $shared
      // (both docs delimit it with spaces), so it is len+2 chars wide
      val expected = (shared.length + 2) - Dedup.SubstrWin + 1
      assert(r.getAs[Long]("n_dup") == expected,
        s"doc $id n_dup=${r.getAs[Long]("n_dup")} expected=$expected")
      assert(r.getAs[Long]("n_win") > r.getAs[Long]("n_dup"))
      assert(r.getAs[Double]("dup_ratio") > 0 && r.getAs[Double]("dup_ratio") < 1)
    }
    // a window repeated only WITHIN one doc is not cross-doc duplicated
    val selfRep = Seq((10L, "zq " * 40 + "end"), (11L, "totally unrelated text that is long enough to window"))
      .toDF("doc_id", "text")
    val r10 = Dedup.substringDup(selfRep, "doc_id", "text").collect()
      .find(_.getAs[Long]("doc_id") == 10L).get
    assert(r10.getAs[Long]("n_dup") == 0L)
  }

  test("minhash_est: exact duplicates estimate 1.0; error bounded on real pairs") {
    import spark.implicits._
    val base = "a quirky corpus sentence about distributed shingle hashing for lsh"
    val docs = Seq(
      (1L, base), (2L, base),                      // identical: est must be exactly 1
      (3L, base + " with one trailing change"),    // near-dup of 1/2
      (4L, "entirely different content that shares nothing with the others"))
      .toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, "doc_id", "text")
    val sigs = Dedup.minhashSigs(sets)
    val cand = Dedup.bucketPairs(Dedup.bandBuckets(sigs)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cand.contains((1L, 2L)))
    val rows = DedupQueries.minhashEst(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("jaccard")
      assert(est >= 0 && est <= 1 && ex >= 0 && ex <= 1)
      assert(r.getAs[Double]("abs_err") == math.abs(est - ex))
      // 32 hashes: binomial std <= 0.09; 4 sigma plus band-selection
      // bias margin — a loose sanity bound, not a tight CI
      assert(r.getAs[Double]("abs_err") <= 0.5)
    }
    // identical docs: signature agreement is exactly 32/32
    val estPlanted = {
      val s2 = Dedup.shingleSets(docs, "doc_id", "text")
      val g2 = Dedup.minhashSigs(s2)
      g2.as("a").join(g2.as("b"), $"a.doc_id" === 1L && $"b.doc_id" === 2L)
        .selectExpr("size(filter(zip_with(a.mh, b.mh, (x, y) -> x = y), v -> v)) as agree")
        .collect().head.getAs[Int]("agree")
    }
    assert(estPlanted == Dedup.NumHashes)
  }

  test("dedup_incremental pairs new docs against the index, never index-internal") {
    import spark.implicits._
    val tpl = "a long enough document body that shingles nicely into many five grams"
    val docs = Seq(
      (1L, tpl), (2L, tpl),            // both indexed: their dup must NOT appear
      (3L, tpl + " fresh suffix"),     // new: near-dup of 1 and 2
      (4L, "another body entirely unrelated to the template wording here"),
      (5L, "another body entirely unrelated to the template wording here nearly"))
      .toDF("doc_id", "text")          // 4 indexed, 5 new: 5 pairs 4
    val flags = Seq((1L, false), (2L, false), (3L, true), (4L, false), (5L, true))
      .toDF("doc_id", "is_new")
    val rows = DedupQueries.incrementalPairs(docs, flags).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"))).toSet
    assert(rows.contains((3L, 1L)) && rows.contains((3L, 2L)))
    assert(rows.contains((5L, 4L)))
    // the standing (1, 2) duplicate pair is index-internal: not re-reported
    assert(!rows.exists { case (a, b) => Set(a, b) == Set(1L, 2L) })
    // every reported pair has a NEW probe side
    assert(rows.forall { case (n, _) => Set(3L, 5L)(n) })
  }

  test("decontaminate_neardup is exactly the cross-split slice of the self-join") {
    // the cross-corpus (train ⋈ eval) LSH join must report precisely
    // those F2 near-dup pairs that straddle the split: candidate
    // generation is symmetric (same (band, bucket) equality), so no
    // pair can appear on one side and not the other
    val rows = DedupQueries.decontaminateNeardup(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must contain cross-split near-dups")
    def splitB(id: Long): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"smp|$id")
          .substring(0, 8), 16) % 1000
    val full = DedupQueries.dedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val expected = full.flatMap { case (a, b, j) =>
      Seq((a, b, j), (b, a, j)) }
      .filter { case (t, e, _) => splitB(t) < 800 && splitB(e) >= 900 }
      .groupBy(_._1).map { case (t, ps) =>
        val mx = ps.map(_._3).max
        (t, ps.length.toLong, mx, ps.filter(_._3 == mx).map(_._2).min)
      }.toSet
    val got = rows.map(r => (r.getAs[Long]("train_id"),
      r.getAs[Long]("n_eval_matches"), r.getAs[Double]("max_jaccard"),
      r.getAs[Long]("matched_eval_id"))).toSet
    assert(got == expected, s"diff: ${(got -- expected) ++ (expected -- got)}")
    assert(rows.forall(r => r.getAs[Double]("max_jaccard") >= 0.5))
    // split membership: train ids in the train coin range, matches in eval
    assert(rows.forall(r => splitB(r.getAs[Long]("train_id")) < 800))
    assert(rows.forall(r => splitB(r.getAs[Long]("matched_eval_id")) >= 900))
  }
}
