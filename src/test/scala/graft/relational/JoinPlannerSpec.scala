package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the K70 decision algebra beyond the gate's hash: every arm
  * reachable deterministically on synthetic frames, the documented
  * bloom-over-salt precedence, and the skew lower bound.
  */
class JoinPlannerSpec extends SparkSpec {

  import spark.implicits._

  private def facts(keys: Seq[Long]) = keys.toDF("fk")
  private def dim(keys: Seq[Long]) = keys.toDF("k")

  // synthetic fixtures are row-count-scaled, so they pass a 1-row
  // task budget where the salt arm should be reachable; the
  // deployment default (4M rows) is exercised by its own test below
  private def strat(factKeys: Seq[Long], dimKeys: Seq[Long],
      saltHotRows: Long = 1L): String =
    JoinPlanner.strategyOf(facts(factKeys), "fk", dim(dimKeys), "t",
        saltHotRows)
      .collect()(0).getAs[String]("strategy")

  test("each arm fires on its synthetic fixture") {
    // broadcast: tiny dim
    assert(strat((1L to 50L), (1L to 10L)) == "broadcast")
    // bloom: large dim, selective (10% of fact keys match)
    val bigDim = (1L to JoinPlanner.BroadcastRows + 500L)
    val factsSel = (1L to 1000L) ++ (100001L to 109000L)
    assert(strat(factsSel, bigDim) == "bloom")
    // salt: large dim, full containment, one hot key >= 3x uniform
    val hot = Seq.fill(300)(7L)
    val cold = (1L to 1200L)
    assert(strat(cold ++ hot, bigDim) == "salt")
    // shuffle: large dim, full containment, uniform key
    assert(strat((1L to 1500L), bigDim) == "shuffle")
  }

  test("the salt arm needs hot-key VOLUME, not just ratio: under the " +
      "deployment budget a skewed-but-small key routes shuffle") {
    val bigDim = (1L to JoinPlanner.BroadcastRows + 500L)
    val hot = Seq.fill(300)(7L)
    val cold = (1L to 1200L)
    // same 3x-ratio fixture: salt when the 300-row hot key exceeds
    // the budget, shuffle when the budget is the deployment default
    // (300 rows through one task straggles nothing)
    assert(strat(cold ++ hot, bigDim, saltHotRows = 300L) == "salt")
    assert(strat(cold ++ hot, bigDim,
      saltHotRows = JoinPlanner.SaltHotRowsDefault) == "shuffle")
  }

  test("autoJoined's stat pass dedupes duplicate dim keys — the " +
      "decision cannot be skewed by an inflated match count") {
    // duplicated dim keys would inflate n_fact/n_match through the
    // stats left join; the join OUTPUT keeps the duplicates (plain
    // join semantics), only the measure is deduped
    val f = (1L to 1000L).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("fk", "pk")
    val dupDim = ((1L to 1500L) ++ (1L to 1500L)).toDF("k")
    val (got, joined) = JoinPlanner.autoJoined(f, "fk", dupDim, "k", "pk")
    val (gotClean, _) = JoinPlanner.autoJoined(f, "fk",
      (1L to 1500L).toDF("k"), "k", "pk")
    assert(got == gotClean,
      s"duplicate dim keys changed the routing: $got vs $gotClean")
    val plain = f.join(dupDim, col("fk") === col("k"))
    val j2 = joined.select(plain.columns.map(col): _*)
    assert(j2.count() == plain.count() &&
      j2.exceptAll(plain).isEmpty && plain.exceptAll(j2).isEmpty)
  }

  test("bloom outranks salt when a candidate is selective AND skewed") {
    val bigDim = (1L to JoinPlanner.BroadcastRows + 500L)
    // hot key 7 matches the dim, but 90% of fact ROWS miss the dim
    val hot = Seq.fill(600)(7L)
    val misses = (100001L to 105400L)
    assert(strat(hot ++ misses, bigDim) == "bloom")
  }

  test("autoJoined dispatches each arm and every arm equals the plain join") {
    val bigDim = (1L to JoinPlanner.BroadcastRows + 500L)
    val fixtures = Seq(
      ("broadcast", (1L to 50L), (1L to 10L)),
      ("bloom", (1L to 1000L) ++ (100001L to 109000L), bigDim),
      ("salt", (1L to 1200L) ++ Seq.fill(300)(7L), bigDim),
      ("shuffle", (1L to 1500L), bigDim))
    for ((want, factKeys, dimKeys) <- fixtures) {
      val f = factKeys.zipWithIndex
        .map { case (k, i) => (k, i.toLong) }.toDF("fk", "pk")
      val d = dimKeys.toDF("k")
      val (got, joined) =
        JoinPlanner.autoJoined(f, "fk", d, "k", "pk", saltHotRows = 1L)
      assert(got == want, s"fixture $want dispatched $got")
      val plain = f.join(d, col("fk") === col("k"))
      val j2 = joined.select(plain.columns.map(col): _*)
      assert(j2.count() == plain.count() &&
        j2.exceptAll(plain).isEmpty && plain.exceptAll(j2).isEmpty,
        s"arm $want diverged from the plain join")
    }
  }

  test("gate corpus exercises all four arms; skew is bounded below") {
    // the arms are scale-dependent (sf0.001's dims all fall under the
    // broadcast cap) — the all-four-arms fixture claim lives at the
    // driver's gate SF
    val rows = JoinPlanner.joinStrategyPlan(spark,
      "/root/testdata/sf0.01").collect()
    val strategies = rows.map(_.getAs[String]("strategy")).toSet
    assert(strategies == Set("broadcast", "bloom", "salt", "shuffle"),
      s"expected all four arms on the gate corpus, saw $strategies")
    for (r <- rows) {
      assert(r.getAs[Long]("skew_x100") >= 100L,
        "max*ndv >= n_fact, so skew_x100 floors at 100")
      assert(r.getAs[Long]("sel_ppm") <= 1000000L)
    }
  }
}
