package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sim.Ivf
import graft.streaming.StreamQueries
import graft.text.Chunk

/** Specs for the late round-5 operators: doc_chunk, ts_outliers,
  * q_range_frame, q_histogram, semdedup.
  */
class RoundFiveOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- doc_chunk -------------------------------------------------

  test("chunking: short doc is one chunk, long doc overlaps by Size-Stride") {
    val toks120 = (1 to 120).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, "a b c"), (2L, toks120)).toDF("doc_id", "text")
    val out = Chunk.chunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_id")
      .collect()

    val short = out.filter(_.getLong(0) == 1L)
    assert(short.length == 1)
    assert(short.head.getAs[Int]("n_tok") == 3)
    assert(short.head.getAs[String]("chunk_text") == "a b c")

    // 120 tokens, size 64 stride 48 -> chunks at 0, 48, 96
    val long = out.filter(_.getLong(0) == 2L)
    assert(long.map(_.getAs[Int]("start_tok")).toSeq == Seq(0, 48, 96))
    assert(long.map(_.getAs[Int]("n_tok")).toSeq == Seq(64, 64, 24))
    // consecutive chunks overlap by exactly Size - Stride tokens
    val c0 = long(0).getAs[String]("chunk_text").split(" ")
    val c1 = long(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(Chunk.Size - Chunk.Stride).sameElements(
      c1.take(Chunk.Size - Chunk.Stride)))
  }

  test("chunking covers every token: non-overlap prefixes reassemble the doc") {
    val docs = Seq((1L, (1 to 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunk.chunks(docs, "doc_id", "text")
      .orderBy("chunk_id").collect()
    // taking the first Stride tokens of each chunk plus the full last
    // chunk reassembles the original token sequence exactly
    val rebuilt = chunks.init.flatMap(
      _.getAs[String]("chunk_text").split(" ").take(Chunk.Stride)) ++
      chunks.last.getAs[String]("chunk_text").split(" ")
    assert(rebuilt.toSeq == (1 to 200).map(i => s"w$i"))
  }

  // ---- ts_outliers -----------------------------------------------

  test("outliers flags exactly the |z| > 3 rows with hand-computed z") {
    // 100 values at 10.0 and one at 1000 -> the spike's z is huge,
    // the rest are within 3 sd
    val rows = (1L to 100L).map(i => (i, "m", 10.0 + (i % 5) * 0.1)) :+
      (101L, "m", 1000.0)
    val df = rows.toDF("event_id", "event_type", "value")
    val out = StreamQueries.outliers(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(101L))

    // hand-compute z for the spike from exact moments
    val vals = rows.map(_._3)
    val n = vals.size
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => v * v).sum / n - mean * mean)
    val zExp = (1000.0 - mean) / sd
    assert(math.abs(out.head.getAs[Double]("z") - zExp) < 1e-4)
  }

  test("outliers on a constant series flags nothing (sd=0 -> null z)") {
    val df = (1L to 50L).map(i => (i, "c", 7.0))
      .toDF("event_id", "event_type", "value")
    assert(StreamQueries.outliers(df).count() == 0)
  }

  // ---- q_range_frame ---------------------------------------------

  test("range frame matches a naive trailing-30s scan") {
    val base = 1700000000000000L // us
    val rows = (0 until 60).map { i =>
      (i.toLong * 20, // event_id: every 20th kept by the query filter
        if (i % 2 == 0) "a" else "b",
        new Timestamp((base + i.toLong * 7 * 1000000L) / 1000),
        i * 1.5)
    }
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    val out = StreamQueries.rangeFrame(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap

    // naive O(n^2) oracle over the same rows
    val us = rows.map { case (id, t, ts, v) => (id, t, ts.getTime * 1000, v) }
    for ((id, t, tsUs, _) <- us) {
      val in = us.filter { case (_, t2, ts2, _) =>
        t2 == t && ts2 >= tsUs - 30000000L && ts2 <= tsUs }
      val (n, s) = out(id)
      assert(n == in.size, s"count at $id")
      assert(math.abs(s - in.map(_._4).sum) < 1e-6, s"sum at $id")
    }
  }

  // ---- q_histogram -----------------------------------------------

  test("histogram bins partition the orders rows exactly") {
    val out = graft.relational.SqlApi.qHistogram(spark, sf).collect()
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    // bins are disjoint by construction; check min/max sit inside bins
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(r.getAs[Double]("min_price") >= bin * 20000.0)
      assert(r.getAs[Double]("max_price") < (bin + 1) * 20000.0)
    }
  }

  // ---- event_transitions -----------------------------------------

  test("transitions count consecutive pairs per user with probabilities") {
    val rows = Seq(
      (1L, 10L, new Timestamp(1000), "view"),
      (2L, 10L, new Timestamp(2000), "click"),
      (3L, 10L, new Timestamp(3000), "view"),
      (4L, 20L, new Timestamp(1000), "view"),
      (5L, 20L, new Timestamp(2000), "click"),
      (6L, 30L, new Timestamp(5000), "buy")) // single event: no pair
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = StreamQueries.transitions(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // view->click twice, click->view once; P(view->click)=1,
    // click splits nothing (only one outgoing)
    assert(out.toSet == Set(
      ("click", "view", 1L, 1.0),
      ("view", "click", 2L, 1.0)))
  }

  test("transitions tie-break equal timestamps by event_id") {
    val rows = Seq(
      (2L, 10L, new Timestamp(1000), "b"),
      (1L, 10L, new Timestamp(1000), "a"),
      (3L, 10L, new Timestamp(2000), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = StreamQueries.transitions(rows).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }

  // ---- etl_validate ----------------------------------------------

  test("etl_validate: five constraint rows, qty rule fires, others pass") {
    val out = graft.etl.EtlQueries.etlValidate(spark, sf).collect()
    assert(out.length == 5)
    val byName = out.map(r => r.getAs[String]("check_name") ->
      ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass")))).toMap
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    val nLines = graft.sources.Tables.lineitem(spark, sf).count()
    assert(byName("orders.price_nonneg") == ((nOrders, 0L, true)))
    assert(byName("orders.orderdate_not_null") == ((nOrders, 0L, true)))
    assert(byName("orders.pk_unique") == ((nOrders, 0L, true)))
    assert(byName("lineitem.fk_orders") == ((nLines, 0L, true)))
    // quantities run 1..50 -> the 41..50 tail violates the 1..40 rule
    val (qn, qv, qp) = byName("lineitem.qty_1_40")
    assert(qn == nLines && qv > 0 && !qp)
  }

  // ---- bpe_merges ------------------------------------------------

  test("bpe merges pick the most frequent pair, then exhaust gracefully") {
    // words: xx:3, xy:1, y:1
    // round 1: (x,x)=3 beats (x,y)=1 -> merge "xx"
    // round 2: only (x,y)=1 remains   -> merge "xy"
    // round 3: no pairs left          -> no row (both engines agree)
    val docs = Seq((1L, "xx xx xy"), (2L, "xx y")).toDF("doc_id", "text")
    val out = graft.text.Bpe.merges(docs, "text").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1, "x", "x", "xx", 3L), (2, "x", "y", "xy", 1L)))
  }

  test("bpe counts overlapping pairs per occurrence, merges left-to-right") {
    // word "aaa" freq 2: round 1 counts (a,a) twice per word -> cnt 4,
    // greedy left-to-right replace yields [aa, a]; round 2 merges
    // (aa, a) -> "aaa" with cnt 2
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = graft.text.Bpe.merges(docs, "text").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
  }

  // ---- knn_join --------------------------------------------------

  test("knn_join: a duplicated vector's top neighbor is its exact copy") {
    val dim = 40
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val emb = ((0 until 40).map(i => (i.toLong, oneHot(i))) ++
      (0 until 5).map(i => (100L + i, oneHot(i * 3))))
      .toDF("vec_id", "embedding")
    val out = graft.sim.Knn.lshJoin(emb, 3).collect()
    val top1 = out.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))).toMap
    (0 until 5).foreach { i =>
      // identical vectors share a bucket and rank each other first
      assert(top1(100L + i) == ((i * 3L, 1.0)), s"dup ${100 + i}")
      assert(top1(i * 3L) == ((100L + i, 1.0)), s"orig ${i * 3}")
    }
    // ranks are consecutive from 1 within each query
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rs.length).toSeq)
    }
  }

  // ---- semdedup --------------------------------------------------

  test("semdedup drops exact-duplicate vectors, keeps the earliest id") {
    val dim = 40
    // 40 mutually-orthogonal one-hot vectors + 5 exact duplicates:
    // distinct-pair cosine is 0 (never near tau), dup-pair cosine is 1
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val distinct = (0 until 40).map(i => (i.toLong, oneHot(i)))
    val dups = (0 until 5).map(i => (100L + i, oneHot(i * 3)))
    val emb = (distinct ++ dups).toDF("vec_id", "embedding")

    val out = Ivf.semdedup(emb).collect()
    assert(out.length == 45)
    val keep = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every duplicate's original has a smaller id -> duplicate dropped
    dups.foreach { case (id, _) => assert(!keep(id), s"dup $id kept") }
    // everything else is orthogonal to everything -> kept
    distinct.foreach { case (id, _) => assert(keep(id), s"distinct $id dropped") }
  }
}
