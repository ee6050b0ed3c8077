package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins the sketch-algebra invariants the DuckDB gate can't express:
  * estimator accuracy against the exact cardinality, the structural
  * guarantees (CMS never underestimates, Bloom never false-negatives)
  * and merge-order determinism (a sketch must not care how partitions
  * combined).
  */
class SketchesSpec extends SparkSpec {

  private def exactDistinct: Map[String, Long] =
    Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("kmv: estimate lands within the sketch's error band") {
    val exact = exactDistinct
    val rows = Sketches.sketchKmv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val est = r.getAs[Double]("est_distinct")
      val n = exact(et).toDouble
      if (r.getAs[Int]("n_kept") < Sketches.KmvK)
        assert(est == n, s"$et: below-K must be exact")
      else
        // KMV relative error ~ 1/sqrt(K-2); allow 4 sigma
        assert(math.abs(est - n) / n < 4.0 / math.sqrt(Sketches.KmvK - 2.0),
          s"$et: est $est vs exact $n")
    }
  }

  test("kmv: exact when the group has fewer than K distinct keys") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L))
      .toDF("event_type", "user_id")
    val hv = tiny.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        expr("cast(conv(substring(md5(concat('kmv|', cast(user_id as string))), 1, 12), 16, 10) as bigint)").as("hv"))
      .distinct()
    val got = hv.groupBy("event_type")
      .agg(graft.plans.AggExpressions
        .collectTopK(col("hv"), Sketches.KmvK, largestFirst = false).as("b"))
      .select(col("event_type"), size(col("b")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 2, "b" -> 1))
  }

  test("hll: registers are insertion-order and duplication invariant") {
    val ev = Tables.events(spark, sf)
    val base = Sketches.sketchHll(spark, sf).collect()
    // same estimate from a shuffled, duplicated stream: max() registers
    // make the sketch idempotent and commutative
    val doubled = ev.unionAll(ev).orderBy(rand(7))
    val dir2 = java.nio.file.Files.createTempDirectory("hll_dup").toString
    doubled.write.mode("overwrite")
      .parquet(s"$dir2/events.parquet")
    // the query touches only the events table, so the overlay dir
    // needs nothing else
    val got = Sketches.sketchHll(spark, dir2).collect()
    assert(base.map(_.toString).sorted.sameElements(got.map(_.toString).sorted))
  }

  test("hll: estimate lands within the sketch's error band") {
    val exact = exactDistinct
    Sketches.sketchHll(spark, sf).collect().foreach { r =>
      val n = exact(r.getAs[String]("event_type")).toDouble
      val est = r.getAs[Double]("est_distinct")
      // m=64 → rel std err ~1.04/8 = 13%; allow 4 sigma
      assert(math.abs(est - n) / n < 0.52,
        s"${r.getAs[String]("event_type")}: est $est vs exact $n")
    }
  }

  test("cms: never underestimates, and finds the true heaviest user") {
    val rows = Sketches.sketchCmsTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS must overestimate: ${r.mkString(",")}")
    }
    val trueTop = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("user_id")).limit(1)
      .collect().head.getAs[Long]("c")
    // the true heaviest count must be visible through the sketch's
    // top-10 (its estimate is >= its exact count, so it ranks)
    assert(rows.map(_.getAs[Long]("exact_cnt")).max >= trueTop ||
      rows.map(_.getAs[Long]("est_cnt")).max >= trueTop)
  }

  test("bloom: no false negatives, fp accounting is consistent") {
    val r = Sketches.sketchBloomJoin(spark, sf).collect().head
    val nPass = r.getAs[Long]("n_pass")
    val nTrue = r.getAs[Long]("n_true")
    val nFp = r.getAs[Long]("n_fp")
    assert(nPass >= nTrue, "bloom admits every true match")
    assert(nFp == nPass - nTrue, "fp = pass - true (true subset pass)")
    assert(r.getAs[Long]("n_probe") >= nPass)
    assert(r.getAs[Int]("n_bits") <= r.getAs[Long]("m"))
    // size ladder: m is the smallest power of two >= 16 * n_build
    val m = r.getAs[Long]("m")
    assert((m & (m - 1)) == 0 && m >= 16 * r.getAs[Long]("n_build"))
    // exact semi-join row count equals n_true
    val semi = Tables.orders(spark, sf).join(
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey"), "left_semi").count()
    assert(nTrue == semi)
  }

  test("merge laws: shard-and-merge equals the monolithic sketch") {
    val ev = Tables.events(spark, sf)
    val h1 = ev.filter(col("event_id") % 2 === 0)
    val h2 = ev.filter(col("event_id") % 2 === 1)

    // HLL: registers(A ∪ B) == elementwise max of shard registers
    val whole = Sketches.hllRegisters(ev)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val merged = Sketches.hllRegisters(h1)
      .unionAll(Sketches.hllRegisters(h2))
      .groupBy("event_type", "j").agg(max("mj").as("mj"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == whole)

    // KMV: bottom-K of (bottom-K(A) ∪ bottom-K(B)) == bottom-K(A ∪ B)
    // — through the production dedup-in-heap aggregate
    def bottomK(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvBottomK(Sketches.kmvHashes(d))
        .select(col("event_type"), col("bot").as("b"))
    val wholeK = bottomK(ev).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val mergedK = bottomK(h1).unionAll(bottomK(h2))
      .groupBy("event_type")
      .agg(flatten(collect_list(col("b"))).as("u"))
      .select(col("event_type"),
        slice(array_sort(array_distinct(col("u"))), 1, Sketches.KmvK)
          .as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(mergedK == wholeK)

    // CMS: counters(A ∪ B) == elementwise SUM of shard counters (the
    // additive merge law — contrast with HLL's max-idempotence)
    val wholeC = Sketches.cmsCounters(ev)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mergedC = Sketches.cmsCounters(h1)
      .unionAll(Sketches.cmsCounters(h2))
      .groupBy("r", "b").agg(sum("c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mergedC == wholeC && wholeC.nonEmpty)
  }

  test("bottom-k distinct aggregate: duplicates never occupy slots, ascending, bounded") {
    import spark.implicits._
    // 200 rows over 30 distinct values, the smallest value repeated
    // 171 times — a duplicate-blind heap would fill every slot with it
    val vals = (1L to 30L) ++ Seq.fill(170)(1L)
    val got = vals.map(("g", _)).toDF("event_type", "hv")
      .transform(Sketches.kmvBottomK)
      .collect().head.getSeq[Long](1)
    assert(got == (1L to Sketches.KmvK.toLong))
    // below-k group: the full distinct set, still ascending
    val small = Seq(5L, 3L, 5L, 9L, 3L).map(("s", _))
      .toDF("event_type", "hv").transform(Sketches.kmvBottomK)
      .collect().head.getSeq[Long](1)
    assert(small == Seq(3L, 5L, 9L))
  }

  test("data profile: exact ndv below K, null accounting, numeric ranges") {
    val ev = Tables.events(spark, sf)
    val prof = Sketches.dataProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("event_id", "event_type", "props", "ts",
      "user_id", "value"))
    val n = ev.count()
    prof.values.foreach(r => assert(r.getLong(1) == n))
    // event_type is below K distinct ⇒ the profile's ndv is EXACT
    val types = ev.filter(col("event_type").isNotNull)
      .select("event_type").distinct().count()
    assert(types < Sketches.KmvK &&
      prof("event_type").getDouble(7) == types.toDouble)
    // null accounting matches the direct count
    val nullUsers = ev.filter(col("user_id").isNull).count()
    assert(prof("user_id").getLong(2) == nullUsers)
    // numeric range matches the direct aggregate; non-numeric is null
    val (lo, hi) = ev.agg(min("value"), max("value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    assert(prof("value").getDouble(3) == lo && prof("value").getDouble(4) == hi)
    assert(prof("event_type").isNullAt(3) && prof("ts").isNullAt(4))
  }

  test("join cardinality: full containment on the TPC-H FK, sane estimates") {
    val r = Sketches.sketchJoinCard(spark, sf).collect().head
    // every o_custkey exists in customer ⇒ the probe sketch's retained
    // hashes are all present in the build sketch ⇒ containment == 1.0
    assert(r.getAs[Double]("containment") == 1.0)
    val nCust = Tables.customer(spark, sf).count().toDouble
    val est = r.getAs[Double]("est_build")
    // K=16 sketch: crude but bounded — within 4σ ≈ 4/√(K-2)
    assert(est > nCust * 0.3 && est < nCust * 3.0,
      s"est_build $est vs true $nCust")
  }

  test("partition layout plan: ceil-div file counts and coherent shares") {
    val rows = Sketches.partitionLayoutPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    assert(rows.head.getAs[Long]("n_days") == rows.length)
    val t = Sketches.WriteTargetRows
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val f = r.getAs[Long]("n_files")
      assert(f == (n + t - 1) / t, "n_files must be ceil(rows/target)")
      val fill = r.getAs[Long]("last_fill_ppm")
      assert(fill > 0 && fill <= 1000000L)
      assert((r.getAs[Long]("is_small") == 1L) == (n * 2 < t))
      val skew = r.getAs[Double]("skew")
      assert(skew == n.toDouble * rows.length / total)
    }
    // shares are floor-ppm of a full partition: they sum to ≤ 1e6
    // and within one ppm-per-day of it
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
  }

  test("range partition plan: boundaries ordered, audit counts exhaustive") {
    val rows = Sketches.rangePartitionPlan(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty && rows.length <= Sketches.RppB)
    val total = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // open ends are open; interior boundaries are the planned range
    assert(rows.head.getAs[Long]("bucket") == 0L && rows.head.isNullAt(
      rows.head.fieldIndex("lo")))
    assert(rows.last.isNullAt(rows.last.fieldIndex("hi")))
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("lo")) && !r.isNullAt(r.fieldIndex("hi")))
        assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
    // a bucket's lo is the previous bucket's hi when both adjacent
    rows.sliding(2).foreach {
      case Array(a, b)
        if b.getAs[Long]("bucket") == a.getAs[Long]("bucket") + 1 &&
           !a.isNullAt(a.fieldIndex("hi")) =>
        assert(a.getAs[Double]("hi") == b.getAs[Double]("lo"))
      case _ =>
    }
    // the audit exists to price balance: on the smooth o_totalprice
    // column a 256-row sample must land every bucket within 4× of
    // the uniform 1/B share
    rows.foreach { r =>
      val skew = r.getAs[Double]("skew")
      assert(skew > 0.25 && skew < 4.0, s"bucket skew $skew out of band")
    }
  }

  test("zone map report: chain/skip algebra coherent on the real layout") {
    val rows = Sketches.zoneMapReport(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("n_parts") == rows.length)
    val probe = rows.map(_.getAs[Double]("min_v")).max
    assert(rows.head.getAs[Double]("probe") == probe)
    val skippable = rows.count(_.getAs[Double]("max_v") < probe)
    assert(rows.head.getAs[Long]("n_skippable") == skippable)
    assert(rows.map(_.getAs[Long]("chain_start")).sum ==
      rows.head.getAs[Long]("n_chains"))
    // first partition in the (min_v, max_v, day) order starts chain 1
    val first = rows.minBy(r => (r.getAs[Double]("min_v"),
      r.getAs[Double]("max_v"), r.getAs[java.sql.Date]("day").toString))
    assert(first.getAs[Long]("chain_start") == 1L)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
      assert(Set(0L, 1L)(r.getAs[Long]("chain_start")))
    }
  }

  test("zone map report: a value-clustered layout prunes, a random one can't") {
    import spark.implicits._
    def z(rows: Seq[(String, Long, Double, Double)]) =
      rows.toDF("d", "n_rows", "min_v", "max_v")
        .withColumn("day", to_date(col("d"))).drop("d")
    // disjoint per-partition ranges = the layout a sorted write makes
    val sorted = Sketches.zoneMapOf(z(Seq(
      ("2024-01-01", 10L, 0.0, 1.0), ("2024-01-02", 10L, 2.0, 3.0),
      ("2024-01-03", 10L, 4.0, 5.0)))).collect()
    assert(sorted.head.getAs[Long]("n_chains") == 3L)
    assert(sorted.head.getAs[Long]("n_skippable") == 2L)
    // fully-overlapping ranges = the layout a random write makes
    val random = Sketches.zoneMapOf(z(Seq(
      ("2024-01-01", 10L, 0.0, 9.0), ("2024-01-02", 10L, 0.1, 8.0),
      ("2024-01-03", 10L, 0.2, 9.5)))).collect()
    assert(random.head.getAs[Long]("n_chains") == 1L)
    assert(random.head.getAs[Long]("n_skippable") == 0L)
  }

  test("compaction plan: contiguous day batches cut by running total") {
    val rows = Sketches.compactionPlan(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(rows.nonEmpty)
    val t = Sketches.CompactTargetRows
    // grp must equal floor(rows-before / budget) in day order
    var cum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("grp") == cum / t)
      cum += r.getAs[Long]("n_rows")
    }
    // batch totals agree with their members
    rows.groupBy(_.getAs[Long]("grp")).foreach { case (_, members) =>
      val grpRows = members.map(_.getAs[Long]("n_rows")).sum
      members.foreach { m =>
        assert(m.getAs[Long]("grp_rows") == grpRows)
        assert(m.getAs[Long]("grp_parts") == members.length)
        assert(m.getAs[Long]("grp_fill_ppm") == grpRows * 1000000L / t)
      }
    }
    // day-ordered packing keeps batches contiguous (grp non-decreasing)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("grp") <= b.getAs[Long]("grp"))
      case _ =>
    }
  }

  test("equi-depth: boundaries monotone and in range per group") {
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
    val ranges = ev.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val byType = Sketches.sketchEquidepth(spark, sf).collect()
      .groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (t, rows) =>
      val bs = rows.sortBy(_.getInt(3)).map(_.getDouble(4))
      assert(bs.length == Sketches.HistBuckets - 1)
      assert(bs.sliding(2).forall(p => p(0) <= p(1)), s"$t not monotone")
      val (lo, hi) = ranges(t)
      assert(bs.head >= lo && bs.last <= hi)
    }
  }

  test("quantiles: monotone, in-range, and rank-accurate at sample size") {
    val vals = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted }
    val rows = Sketches.sketchQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (p50, p90, p99) = (r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, s"$et: quantiles not monotone")
      val corpus = vals(et)
      assert(corpus.contains(p50) && corpus.contains(p99),
        s"$et: estimates must be actual corpus values")
      // rank accuracy: the q-th sample quantile of K uniform draws has
      // rank-proportion std err sqrt(q(1-q)/K); allow 4 sigma
      for ((est, q) <- Seq(p50 -> 0.5, p90 -> 0.9, p99 -> 0.99)) {
        val frac = corpus.count(_ <= est).toDouble / corpus.length
        val tol = 4.0 * math.sqrt(q * (1 - q) / Sketches.QtlK) + 0.02
        assert(math.abs(frac - q) <= tol,
          s"$et q=$q: rank fraction $frac outside ±$tol")
      }
    }
  }

  test("quantiles: exact percentile_disc when the group fits the sample") {
    import spark.implicits._
    // 10 rows < K: the sample IS the group, so ceil(q·n) indexes the
    // true sorted values — textbook percentile_disc
    val vs = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("qtl_tiny").toString
    vs.zipWithIndex.map { case (v, i) => (i.toLong, t0, "a", v) }
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Sketches.sketchQuantiles(spark, dir).collect().head
    assert(r.getAs[Int]("n_sample") == 10)
    assert(r.getAs[Double]("p50") == 5.0)  // ceil(0.5·10)=5th
    assert(r.getAs[Double]("p90") == 9.0)  // ceil(0.9·10)=9th
    assert(r.getAs[Double]("p99") == 10.0) // ceil(9.9)=10th
  }

  test("theta ops: exact on below-K sets, estimated on partial overlap") {
    // sf0.001 has 15 distinct users per type (< K=16): every pair
    // rides the exact path — θ = 2^48, retained = full sets
    val exact = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getAs[Number](1).longValue).toSet }
    val rows = Sketches.sketchThetaOps(spark, sf).collect()
    assert(rows.length == exact.size * (exact.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("et_a"), r.getAs[String]("et_b"))
      val (sa, sb) = (exact(a), exact(b))
      assert(r.getAs[Double]("est_inter") == sa.intersect(sb).size.toDouble,
        s"$a∩$b: below-K pair must be exact")
      assert(r.getAs[Double]("est_union") == sa.union(sb).size.toDouble)
      assert(r.getAs[Double]("jaccard") ==
        sa.intersect(sb).size.toDouble / sa.union(sb).size)
    }

    // estimated path: two 100-user groups sharing 50 (jaccard 1/3),
    // both far above K — assert the estimate's error band, and the
    // structural invariants that hold at ANY K
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("theta_est").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((1 to 100).map(u => ("a", u.toLong)) ++
      (51 to 150).map(u => ("b", u.toLong)))
      .zipWithIndex.map { case ((et, u), i) => (i.toLong, t0, et, u) }
      .toDF("event_id", "ts", "event_type", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = Sketches.sketchThetaOps(spark, dir).collect().head
    assert(e.getAs[Long]("theta") < Sketches.KmvK * 17592186044416L,
      "above-K pair must carry a real (estimated) theta")
    assert(e.getAs[Int]("n_inter") <= e.getAs[Int]("n_union"))
    assert(e.getAs[Double]("est_inter") <= e.getAs[Double]("est_union"))
    val j = e.getAs[Double]("jaccard")
    assert(j >= 0.0 && j <= 1.0)
    // true jaccard 50/150 = 1/3; K=16 draws → σ ≈ sqrt(j(1-j)/K) ≈
    // 0.12; allow 4σ (deterministic — this either always passes or
    // the geometry changed)
    assert(math.abs(j - 1.0 / 3.0) < 0.48, s"jaccard $j vs 1/3")
    val estU = e.getAs[Double]("est_union")
    assert(math.abs(estU - 150.0) / 150.0 < 4.0 / math.sqrt(Sketches.KmvK - 2.0),
      s"union est $estU vs 150")
  }

  test("sketches are deterministic under repartitioning") {
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val a = canon(Sketches.sketchKmv(spark, sf))
    val b = canon(Sketches.sketchKmv(spark, sf)
      .repartition(7)) // plan tail reshuffle only
    assert(a == b)
    val h1 = canon(Sketches.sketchHll(spark, sf))
    val h2 = canon(Sketches.sketchHll(spark, sf).repartition(5))
    assert(h1 == h2)
  }
}
