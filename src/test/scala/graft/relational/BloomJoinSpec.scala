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

  test("bloom-pruned lookup: identity with the plain filter, and a " +
      "batch-disjoint probe reads exactly one batch directory") {
    import java.sql.Timestamp
    import spark.implicits._
    // 4 days x CompactTargetRows rows -> 4 one-day batches, with
    // DISJOINT user ranges per day so the probe user lives in exactly
    // one batch
    val perDay = Sketches.CompactTargetRows.toInt
    val evs = for {
      d <- 0 until 4
      i <- 0 until perDay
    } yield (d.toLong * perDay + i,
      Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00"),
      d * 1000L + (i % 100), "view", 1.0, "{}")
    val df = evs.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props").withColumn("ts_ns", expr("0L"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_bloomlookup").toString
    val layout = s"$base/layout"
    Compactor.execute(df, layout)
    val idx = s"$base/idx"
    BloomJoin.saveBatchBlooms(
      Compactor.loadCompacted(spark, layout), idx)
    val probe = 2013L // day-2 range only
    val got = BloomJoin.prunedLookup(spark, layout, idx, probe)
    val expect = Compactor.loadCompacted(spark, layout)
      .filter(col("user_id") === probe)
    assert(got.count() == expect.count() && got.count() > 0)
    assert(got.select("event_id").exceptAll(expect.select("event_id"))
      .isEmpty &&
      expect.select("event_id").exceptAll(got.select("event_id"))
        .isEmpty, "pruned read lost or invented rows")
    // the pruned scan touched exactly the one batch that can contain
    // the probe (no false skips is already proven by the identity;
    // this pins that the index actually PRUNES)
    val touched = got.select(col("_metadata.file_path"))
      .distinct().count()
    assert(touched == 1L, s"expected 1 batch file touched, saw $touched")
  }

  test("null dim keys are ignored — they cannot zero word 0 and drop " +
      "real matches") {
    import spark.implicits._
    val dimWithNulls = dim.select(col("o_orderkey"))
      .unionByName(Seq.empty[Long].toDF("o_orderkey")
        .select(lit(null).cast("long").as("o_orderkey")))
      .unionByName(Seq(Option.empty[Long], Option.empty[Long])
        .toDF("o_orderkey"))
    val clean = BloomJoin.bloomWordsOf(dim, "o_orderkey")
    val dirty = BloomJoin.bloomWordsOf(dimWithNulls, "o_orderkey")
    assert(clean.sameElements(dirty),
      "null keys altered the filter bits")
    // the end-to-end invariant: every real dim key still passes
    val keysAsFacts = dim.select(col("o_orderkey").as("k"))
    val kept = BloomJoin
      .bloomFiltered(keysAsFacts, "k", dimWithNulls, "o_orderkey")
    assert(kept.count() == keysAsFacts.count(),
      "a null dim key introduced a false negative")
  }

  test("m below one word is rejected — the geometry require") {
    intercept[IllegalArgumentException] {
      BloomJoin.bloomFilteredM(facts, "l_orderkey", dim, "o_orderkey", 32L)
    }
    // 64 is the smallest legal m and must not throw on build or probe
    val kept = BloomJoin
      .bloomFilteredM(facts.limit(10), "l_orderkey", dim, "o_orderkey", 64L)
    kept.count()
  }
}
