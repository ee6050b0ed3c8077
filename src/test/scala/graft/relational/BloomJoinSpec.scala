package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins what the two K66 hash gates prove only in aggregate: the
  * semi-join-reduction identity at row level, the no-false-negative
  * invariant directly (every key IN the dim passes its own filter),
  * the constant filter size, real pruning, and the empty-dim edge.
  */
class BloomJoinSpec extends SparkSpec {

  private def dim = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")
  private def facts = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_extendedprice", "l_returnflag")

  test("bloom-prefiltered join is row-identical to the plain join") {
    val viaBloom = BloomJoin
      .bloomFiltered(facts, "l_orderkey", dim, "o_orderkey")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
    val plain = facts.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty,
      "bloom path emitted rows the plain join lacks")
    assert(plain.exceptAll(viaBloom).isEmpty,
      "bloom pre-filter dropped rows with a real join partner")
  }

  test("no false negatives: every dim key passes its own filter") {
    val keysAsFacts = dim.select(col("o_orderkey").as("k"))
    val kept = BloomJoin.bloomFiltered(keysAsFacts, "k", dim, "o_orderkey")
    assert(kept.count() == keysAsFacts.count())
  }

  test("the filter prunes: survivors sit between matches and facts") {
    val survivors =
      BloomJoin.bloomFiltered(facts, "l_orderkey", dim, "o_orderkey")
        .count()
    val nFacts = facts.count()
    val nMatch = facts
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(survivors >= nMatch, "a false negative slipped through")
    assert(survivors < nFacts,
      "filter passed everything — no reduction happened")
  }

  test("filter size is the constant word array, data-independent") {
    val bfFull = BloomJoin.bloomWordsOf(dim, "o_orderkey")
    val bfOne = BloomJoin.bloomWordsOf(dim.limit(1), "o_orderkey")
    assert(bfFull.length == BloomJoin.BloomWords &&
      bfOne.length == BloomJoin.BloomWords)
    assert(bfOne.count(_ != 0L) <= BloomJoin.BloomK,
      "one key sets at most k words")
  }

  test("empty dim yields the all-zero filter that rejects every probe") {
    val bf = BloomJoin.bloomWordsOf(dim.limit(0), "o_orderkey")
    assert(bf.length == BloomJoin.BloomWords && bf.forall(_ == 0L))
    val kept = BloomJoin
      .bloomFiltered(facts, "l_orderkey", dim.limit(0), "o_orderkey")
    assert(kept.isEmpty)
  }

  test("bloom index report: no false negatives, bounded bits, non-trivial") {
    val rows = BloomJoin.bloomIndexReport(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nUsers, nBits) = (r.getAs[Long]("n_users"),
        r.getAs[Long]("n_bits_set"))
      val (present, canSkip) = (r.getAs[Boolean]("present"),
        r.getAs[Boolean]("can_skip"))
      assert(!(present && canSkip),
        s"false negative: probe present on ${r.get(0)} but bloom skips")
      assert(nBits <= 2 * nUsers && nBits <= BloomJoin.BixBits,
        "a key sets at most k=2 bits")
    }
    assert(rows.exists(_.getAs[Boolean]("can_skip")),
      "fixture should have at least one skippable partition")
  }
}
