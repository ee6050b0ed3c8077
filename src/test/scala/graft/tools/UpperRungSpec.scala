package graft.tools

import graft.SparkSpec

/** Census over the UPPER-RUNG geometry fixture (round-10 VERDICT
  * item #7): every size-derived-geometry query runs on a corpus big
  * enough that the ladders leave their bottom rung — simhash W = 9
  * (> 16,384 docs), knn planesFor p = 9 (> 16,384 vectors), IVF
  * lists = √n ≈ 128 past the 16-list floor — with zero failures and
  * sane output shapes. The cross-engine HASH verification of the
  * same rungs is `scripts/upper_rung.py` (DuckDB isn't reachable
  * from ScalaTest); this spec pins the Spark side as a suite-run
  * regression: ladder arithmetic, banding, salting, probe selection
  * and re-rank all execute above the thresholds the sf gates never
  * cross.
  */
class UpperRungSpec extends SparkSpec {

  // just past the 16,384 threshold — the smallest corpus that leaves
  // the bottom rung, keeping the census affordable inside sbt test
  private val NDocs = 16500L
  private val NVecs = 16500L
  private val dir = "/tmp/graft_upper_rung_spec"

  private lazy val fixture: Unit =
    UpperRung.writeFixture(spark, dir, NDocs, NVecs)

  test("the fixture sizes actually cross every ladder threshold") {
    assert(graft.dedup.Dedup.simhashBandBits(NDocs) == 9)
    assert(graft.sim.Knn.planesFor(NVecs) == 9)
    assert(graft.sim.Ivf.numLists(NVecs) > 16)
  }

  test("simhash dedup at W=9: runs clean, finds the planted families") {
    fixture
    val pairs = graft.dedup.DedupQueries.dedupSimhash(spark, dir)
    // families are doc_id div 4: a 1-word-of-12 member perturbation
    // lands at hamming ~3, so the W=9 banding must surface in-family
    // pairs in volume. (Cross-family chance collisions at hamming ≤ 6
    // are legitimate simhash behavior, not asserted against.)
    val inFamily = pairs.filter("doc_a div 4 = doc_b div 4").count()
    assert(inFamily > 1000,
      s"only $inFamily in-family pairs of ~5000 planted families")
  }

  test("knn self-join at p=9: every vector resolves in-bucket neighbors") {
    fixture
    val knn = graft.sim.SimQueries.knnJoin(spark, dir)
    val n = knn.count()
    assert(n > 0)
    // ranks are 1..k per query with k=3
    assert(knn.filter("rank < 1 OR rank > 3").count() == 0)
  }

  test("knn_lsh query search runs clean on the big corpus") {
    fixture
    val r = graft.sim.SimQueries.knnLsh(spark, dir)
    assert(r.filter("rank = 1").count() > 0)
  }

  test("IVF at ~128 lists: fit, probe and re-rank above the floor") {
    fixture
    val r = graft.sim.Ivf.knnIvf(spark, dir)
    // 5 queries, each with up to k=3 in-probe neighbors
    assert(r.count() > 0 && r.count() <= 15)
    assert(r.select("query_id").distinct().count() <= 5)
    // and the index really is THIS corpus's (the round-10 memo-key
    // bug served the 500-vector testdata index here): the fitted
    // quantizer must spread the fixture over >16 inverted lists
    val sd = graft.sim.Ivf.semdedupQ(spark, dir)
    assert(sd.count() == NVecs)
    val lists = sd.select("list_id").distinct().count()
    assert(lists > 16, s"only $lists lists — wrong corpus's index?")
  }

  test("given-centroid twins run clean at upper-rung corpus size") {
    fixture
    val knn = graft.sim.Ivf.knnGivenCentroidsQ(spark, dir)
    assert(knn.count() > 0)
    val sd = graft.sim.Ivf.semdedupGivenCentroidsQ(spark, dir)
    val total = sd.count()
    val kept = sd.filter("keep").count()
    assert(total == NVecs)
    // in-cluster cosines clear tau=0.45 by construction, so the drop
    // rule must actually drop — and never everything (list minima keep)
    assert(kept < total && kept > 0, s"kept $kept of $total")
  }
}
