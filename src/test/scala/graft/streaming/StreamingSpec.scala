package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  import Streaming._

  test("batch sessionize: gaps split sessions, ns arithmetic exact") {
    val rows = StreamQueries.sessionizeQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("duration_us") ==
        r.getAs[Long]("end_us") - r.getAs[Long]("start_us"))
      assert(r.getAs[Long]("n_events") >= 1)
    }
    // total events preserved
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("streaming windowed agg with watermark produces hourly rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = windowedCountsStream(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    val base = Timestamp.valueOf("2024-01-01 10:15:00")
    mem.addData(
      Event(1, base, 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 10:45:00"), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 11:05:00"), 2, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 and 11:00 windows
    mem.addData(Event(4, Timestamp.valueOf("2024-01-01 15:00:00"), 3, "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("win_out").collect()
    q.stop()
    val clicks = out.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[String]("hour_start") == "2024-01-01 10:00")
    assert(clicks.getAs[Long]("n_events") == 2)
    assert(clicks.getAs[Double]("sum_value") == 3.0)
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStream(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    mem.addData(
      Event(1, new Timestamp(1000), 7, "click", 1.0),
      Event(2, new Timestamp(30000), 7, "click", 1.0))
    q.processAllAvailable()
    // gap > 60s closes the first session
    mem.addData(Event(3, new Timestamp(200000), 7, "click", 1.0))
    q.processAllAvailable()
    val out = spark.table("sess_out").as[SessionOut].collect()
    q.stop()
    assert(out.length == 1)
    assert(out(0) == SessionOut(7, 2, 1000, 30000))
  }

  test("event-time timeout closes idle sessions once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStream(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_timeout_out")
      .outputMode("append").start()
    // user 9's session ends at t=30s; nothing further from user 9
    mem.addData(
      Event(1, new Timestamp(1000), 9, "click", 1.0),
      Event(2, new Timestamp(30000), 9, "click", 1.0))
    q.processAllAvailable()
    // a much later event from ANOTHER user advances the watermark
    // beyond 30s + gap; the next batch fires user 9's timeout
    mem.addData(Event(3, new Timestamp(7200000), 8, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Event(4, new Timestamp(7260000), 8, "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("sess_timeout_out").as[SessionOut].collect()
    q.stop()
    assert(out.contains(SessionOut(9, 2, 1000, 30000)),
      s"user 9 session not emitted by timeout: ${out.toSeq}")
    // user 8's session is still open (no gap, watermark not past it)
    assert(!out.exists(_.user_id == 8))
  }

  test("streaming dedup drops re-delivered event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(Event(1, t, 1, "click", 1.0), Event(1, t, 1, "click", 1.0),
      Event(2, t, 1, "view", 1.0))
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 2)
  }

  test("stream-stream interval join pairs clicks with follow-ups only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val others = MemoryStream[Event]
    val q = followWithinStream(clicks.toDF(), others.toDF(), windowSec = 30)
      .writeStream.format("memory").queryName("follow_out")
      .outputMode("append").start()
    clicks.addData(Event(1, new Timestamp(10000), 7, "click", 1.0))
    others.addData(
      Event(2, new Timestamp(5000), 7, "view", 1.0),      // before: no
      Event(3, new Timestamp(25000), 7, "purchase", 1.0), // within 30s: yes
      Event(4, new Timestamp(45000), 7, "view", 1.0),     // past window: no
      Event(5, new Timestamp(20000), 8, "purchase", 1.0)) // other user: no
    q.processAllAvailable()
    // advance both watermarks so the joined rows are emittable
    clicks.addData(Event(9, new Timestamp(7200000), 99, "click", 1.0))
    others.addData(Event(10, new Timestamp(7200000), 98, "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("follow_out").collect()
    q.stop()
    assert(out.length == 1, s"got: ${out.toSeq}")
    assert(out(0).getAs[Long]("click_id") == 1)
    assert(out(0).getAs[String]("o_type") == "purchase")
  }

  test("streaming corpus ingest dedups by content and gates on quality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = corpusIngestStream(
        mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val good = Array.fill(graft.pipeline.Corpus.MinTokens)("word").mkString(" ")
    mem.addData(
      (1L, t, good),                       // passes, first arrival
      (2L, t, good),                       // exact dup of 1: dropped
      (3L, t, "too short"),                // quality-gated: dropped
      (4L, t, good + " extra tail"))       // distinct content: passes
    q.processAllAvailable()
    val out = spark.table("ingest_out").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L))
    out.foreach { r =>
      assert(r.getAs[Int]("n_tokens") >= graft.pipeline.Corpus.MinTokens)
    }
  }

  test("qualityScoreStream serves the batch-fitted margin bit-equal to the batch path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // lambda split: fit once on the batch corpus, serve continuously
    val corpus = graft.sources.Tables.documents(spark, sf)
    val model = graft.pipeline.QualityModel.modelFor(corpus).get
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = qualityScoreStream(
        mem.toDF().toDF("doc_id", "ts", "text"), model)
      .writeStream.format("memory").queryName("qscore_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val good = (1 to 30).map(j => s"tok$j").mkString(" ")
    val spam = Array.fill(40)("buy").mkString(" ")
    mem.addData((1L, t, good), (2L, t, spam), (3L, t, "short one"),
      (4L, t, ""))                          // empty: filtered, not scored
    q.processAllAvailable()
    val out = spark.table("qscore_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("margin")).toMap
    q.stop()
    assert(out.keySet == Set(1L, 2L, 3L))
    // the batch side over the same rows: same features, same rendered
    // margin text — the stream's array-expression H5 features must
    // reproduce the batch aggregate's doubles bit-for-bit
    val batch = Seq((1L, good), (2L, spam), (3L, "short one"), (4L, ""))
      .toDF("doc_id", "text")
    val expected = graft.pipeline.QualityModel.features(batch)
      .withColumn("margin",
        org.apache.spark.sql.functions.expr(
          graft.pipeline.QualityModel.marginSql(model)))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("margin")).toMap
    assert(expected.keySet == Set(1L, 2L, 3L))
    out.foreach { case (id, m) => assert(m == expected(id), s"doc $id") }
  }

  test("pqEncodeStream codes are bit-equal to the batch PQ encode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // lambda split: codebook from the standing corpus, arriving
    // vectors encoded continuously
    val corpus = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val sample = corpus.filter(col("vec_id") < 40).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = pqEncodeStream(mem.toDF().toDF("vec_id", "embedding"), corpus)
      .writeStream.format("memory").queryName("pqenc_out")
      .outputMode("append").start()
    mem.addData(sample.toIndexedSeq: _*)
    q.processAllAvailable()
    val out = spark.table("pqenc_out").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until graft.sim.Pq.NumSub).map(m => r.getAs[Long](s"code_$m")))
      .toMap
    q.stop()
    val batch = graft.sim.Pq.encode(corpus)
      .filter(col("vec_id") < 40).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until graft.sim.Pq.NumSub).map(m => r.getAs[Long](s"code_$m")))
      .toMap
    assert(out.keySet == batch.keySet && out.keySet.size == 40)
    out.foreach { case (id, cs) => assert(cs == batch(id), s"vec $id") }
  }

  test("q_funnel stages require strict view -> click -> purchase order") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      // full funnel in order -> stage 3
      (1L, "view", t(0)), (1L, "click", t(1)), (1L, "purchase", t(2)),
      // purchase BEFORE the first click -> stage 2 only
      (2L, "view", t(0)), (2L, "purchase", t(1)), (2L, "click", t(2)),
      // click before the first view -> that click can't count; none after
      (3L, "click", t(0)), (3L, "view", t(1)),
      // no view at all -> excluded from the funnel entirely
      (4L, "click", t(0)), (4L, "purchase", t(1)))
      .toDF("user_id", "event_type", "ts")
    val rows = StreamQueries.funnel(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    assert(rows == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("retention_cohorts buckets users by first-event week and offset") {
    import spark.implicits._
    import java.sql.Timestamp
    // 2023-12-25 is a Monday: week boundaries are deterministic
    def t(day: Int) = new Timestamp(1703462400000L + day * 86400000L)
    val events = Seq(
      (1L, t(0)), (1L, t(1)),  // same week twice: ONE distinct user row
      (1L, t(15)),             // week offset 2
      (2L, t(0)),              // same cohort as user 1
      (3L, t(7)))              // next week's cohort
      .toDF("user_id", "ts")
    val rows = StreamQueries.cohorts(events).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Int]("week_offset"))
        -> r.getAs[Long]("n_users")).toMap
    assert(rows == Map(
      ("2023-12-25", 0) -> 2L,   // users 1 and 2, dup event collapsed
      ("2023-12-25", 2) -> 1L,   // user 1 returns two weeks later
      ("2024-01-01", 0) -> 1L))  // user 3's own cohort
  }

  test("funnelStream emits one row per stage advance, in order, state-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = funnelStream(mem.toDS(), windowMs = 3600000L)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    // user 7: purchase before any click is ignored; then the ordered
    // walk advances one stage per event. user 8: click with no view
    // emits nothing.
    mem.addData(
      Event(1, new Timestamp(1000), 7, "purchase", 1.0),
      Event(2, new Timestamp(2000), 7, "view", 1.0),
      Event(3, new Timestamp(3000), 8, "click", 1.0))
    q.processAllAvailable()
    mem.addData(
      Event(4, new Timestamp(4000), 7, "click", 1.0),
      Event(5, new Timestamp(5000), 7, "purchase", 1.0))
    q.processAllAvailable()
    val out = spark.table("funnel_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"),
        r.getAs[Long]("at_ms"))).toSet
    q.stop()
    assert(out == Set((7L, 1, 2000L), (7L, 2, 4000L), (7L, 3, 5000L)))
  }

  test("custom gap sessionization agrees with Spark's native session_window") {
    // J2's window/cumsum formulation and the engine's built-in
    // session_window must carve IDENTICAL sessions — cross-validation
    // of the gap semantics against an independent implementation.
    // (session_window's end = last event + gap, so compare on
    // (user, start, n_events) and the last-event time.)
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf)
    val custom = Streaming.sessionize(events)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val native = events
      .withColumn("tsu", expr("timestamp_micros(ts_ns div 1000)"))
      .groupBy(col("user_id"),
        expr("session_window(tsu, '30 minutes')").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(expr("unix_micros(tsu)")).as("start_us"),
        max(expr("unix_micros(tsu)")).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(custom == native,
      s"custom-only=${(custom -- native).take(3)} native-only=${(native -- custom).take(3)}")
  }

  test("attributionStream credits the latest touch and keeps one-row state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.attributionStream(mem.toDS(), windowMs = 3600000L)
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    mem.addData(
      Event(1, new Timestamp(1000), 7, "view", 1.0),
      Event(2, new Timestamp(2000), 7, "click", 1.0),
      Event(3, new Timestamp(3000), 7, "purchase", 1.0), // -> click
      Event(4, new Timestamp(1000), 8, "purchase", 1.0)) // -> (direct)
    q.processAllAvailable()
    // user 7's touch state persists across batches: a second purchase
    // still credits the click
    mem.addData(Event(5, new Timestamp(9000), 7, "purchase", 1.0))
    q.processAllAvailable()
    val out = spark.table("attrib_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_ms"),
        r.getAs[String]("touch_type"))).toSet
    q.stop()
    assert(out == Set((7L, 3000L, "click"), (8L, 1000L, "(direct)"),
      (7L, 9000L, "click")))
  }

  test("attributionStream survives a late touch behind the watermark (timeout clamp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // 1-minute attribution window, 10-minute watermark delay. The
    // round-5 ADVICE crash, reproduced deterministically: the late
    // filter admits a touch against the PREVIOUS batch's watermark
    // while setTimeoutTimestamp validates against the CURRENT
    // (eviction) one — so an admitted touch whose atMs + window sits
    // behind the eviction watermark kills the query with "Timeout
    // timestamp cannot be earlier than the current watermark" unless
    // clamped. Needs noDataMicroBatches=false (a documented perf
    // knob): with empty batches on, an intervening no-data batch
    // advances the late filter first and simply drops the touch.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val q = Streaming.attributionStream(mem.toDS(), windowMs = 60000L)
        .writeStream.format("memory").queryName("attrib_late_out")
        .outputMode("append").start()
      val h = 3600L * 1000L
      // batch 1: user 8 at 01:00 drives the post-batch watermark to 00:50
      mem.addData(Event(1, new Timestamp(h), 8, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 10 touch at 00:45 — admitted (late filter sees
      // the pre-advance watermark) but 00:45 + 1 min = 00:46 < the
      // eviction watermark 00:50 → unclamped setTimeoutTimestamp throws
      mem.addData(
        Event(2, new Timestamp(45L * 60L * 1000L), 10, "view", 1.0),
        Event(3, new Timestamp(56L * 60L * 1000L), 10, "purchase", 1.0))
      q.processAllAvailable() // pre-fix: IllegalArgumentException here
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val out = spark.table("attrib_late_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("touch_type")))
      q.stop()
      // the admitted touch survived and the purchase credits it
      assert(out.toSet == Set((10L, "view")))
    } finally
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
  }

  test("sessionize/funnel streams survive the admitted-but-behind-watermark touch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same clamp regression as the attribution test, for the other
    // two flatMapGroupsWithState operators: an event admitted against
    // the previous watermark whose state timeout (last + gap/window)
    // sits behind the eviction watermark
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val h = 3600L * 1000L
      val sess = MemoryStream[Event]
      val qs = Streaming.sessionizeStream(sess.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName("sess_late_out")
        .outputMode("append").start()
      sess.addData(Event(1, new Timestamp(h), 8, "view", 1.0))
      qs.processAllAvailable()
      // admitted at 00:45, but 00:45 + 1 min gap < watermark 00:50
      sess.addData(Event(2, new Timestamp(45L * 60L * 1000L), 10, "view", 1.0))
      qs.processAllAvailable() // pre-fix: IllegalArgumentException
      assert(qs.exception.isEmpty, s"sessionize died: ${qs.exception}")
      // two more watermark advances: the clamped timeout fires and
      // user 10's one-event session emits
      sess.addData(Event(3, new Timestamp(2 * h), 8, "view", 1.0))
      qs.processAllAvailable()
      sess.addData(Event(4, new Timestamp(3 * h), 8, "view", 1.0))
      qs.processAllAvailable()
      assert(qs.exception.isEmpty)
      val sessions = spark.table("sess_late_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events")))
      qs.stop()
      assert(sessions.contains((10L, 1)))

      val fun = MemoryStream[Event]
      val qf = Streaming.funnelStream(fun.toDS(), windowMs = 60000L)
        .writeStream.format("memory").queryName("funnel_late_out")
        .outputMode("append").start()
      fun.addData(Event(1, new Timestamp(h), 8, "purchase", 1.0))
      qf.processAllAvailable()
      fun.addData(Event(2, new Timestamp(45L * 60L * 1000L), 10, "view", 1.0))
      qf.processAllAvailable() // pre-fix: IllegalArgumentException
      assert(qf.exception.isEmpty, s"funnel died: ${qf.exception}")
      val stages = spark.table("funnel_late_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
      qf.stop()
      // the admitted view still advanced user 10 to stage 1
      assert(stages.contains((10L, 1)))
    } finally
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
  }

  test("outlierStream flags only beyond-threshold rows against static stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static profile: type "m" with mean 10, sd 1 (n=100, s=1000,
    // sq = sum of v^2 for 100 values at mean 10 sd 1 -> 100*(100+1))
    val stats = Seq(("m", 100L, 1000.0, 10100.0)).toDF("event_type", "n", "s", "sq")
    val mem = MemoryStream[Event]
    val q = Streaming.outlierStream(mem.toDF(), stats)
      .writeStream.format("memory").queryName("outlier_out")
      .outputMode("append").start()
    mem.addData(
      Event(1, new Timestamp(1000), 1, "m", 10.5),  // z = 0.5
      Event(2, new Timestamp(2000), 1, "m", 14.0),  // z = 4
      Event(3, new Timestamp(3000), 2, "x", 99.0))  // no profile -> dropped
    q.processAllAvailable()
    val out = spark.table("outlier_out").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(2L))
    assert(math.abs(out.head.getAs[Double]("z") - 4.0) < 1e-9)
  }

  test("J12 hll register stream: update-mode registers converge to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = hllRegisterStream(mem.toDF())
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val evs = (1L to 60L).map(i => Event(i, base, i % 17,
      if (i % 2 == 0) "view" else "click", 1.0))
    mem.addData(evs.take(30): _*)
    q.processAllAvailable()
    // second batch re-delivers a prefix: registers are max-idempotent,
    // so duplicate arrivals must not move any state
    mem.addData(evs.drop(30) ++ evs.take(10): _*)
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends each revision; mj is monotone,
    // so the final state per register is its max across revisions
    val streamed = spark.table("hll_regs")
      .groupBy("event_type", "j").agg(max("mj").as("mj"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val batch = graft.relational.Sketches.hllRegisters(evs.toDF())
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.keySet.map(_._1) == Set("view", "click"))
  }

  test("J18 bloom index stream: update-mode words converge to batch, re-delivery is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.bloomIndexStream(mem.toDF())
      .writeStream.format("memory").queryName("bix_words")
      .outputMode("update").start()
    val d1 = Timestamp.valueOf("2024-01-01 10:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 10:00:00")
    val evs = (1L to 40L).map(i => Event(i, if (i % 2 == 0) d1 else d2,
      i % 13, "view", 1.0))
    mem.addData(evs.take(20): _*)
    q.processAllAvailable()
    // re-deliver a prefix alongside the tail: bit_or is idempotent,
    // so duplicate arrivals must not set any new bit
    mem.addData(evs.drop(20) ++ evs.take(10): _*)
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends revisions; word values are
    // monotone under OR (never under signed max — a new bit 63 turns
    // the long negative), so fold revisions with bit_or
    def wordsOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "w").agg(expr("bit_or(bits)").as("bits"))
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
        .toMap
    val streamed = wordsOf(spark.table("bix_words"))
    val batch = wordsOf(
      graft.relational.BloomJoin.bloomIndexWords(evs.toDF()))
    assert(streamed == batch && batch.nonEmpty)
    assert(batch.keySet.map(_._1) == Set("2024-01-01", "2024-01-02"))
  }

  test("J13 cms counter stream: exact under exactly-once, over-counts (never under) on re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val evs = (1L to 60L).map(i => Event(i, base, i % 17,
      if (i % 2 == 0) "view" else "click", 1.0))
    def finalCounters(table: String): Map[(Int, Long), Long] =
      // update-mode sink appends revisions; counts are monotone, so
      // the final state per cell is its max across revisions
      spark.table(table).groupBy("r", "b").agg(max("c").as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.relational.Sketches.cmsCounters(evs.toDF())
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val mem = MemoryStream[Event]
    val q = Streaming.cmsCounterStream(mem.toDF())
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("update").start()
    mem.addData(evs.take(30): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(30): _*)
    q.processAllAvailable()
    val exact = finalCounters("cms_cells")
    // exactly-once: stream state bit-equals the batch body
    assert(exact == batch && batch.nonEmpty)
    // at-least-once: a re-delivered prefix INFLATES its cells — the
    // additive contract (vs J12's idempotent registers). Every cell
    // stays >= the true counter: est >= exact survives re-delivery.
    mem.addData(evs.take(10): _*)
    q.processAllAvailable()
    q.stop()
    val inflated = finalCounters("cms_cells")
    assert(batch.forall { case (k, c) => inflated(k) >= c })
    assert(inflated.exists { case (k, c) => c > batch(k) })
    // the over-count is exactly the re-delivered mass
    assert(inflated.values.sum - batch.values.sum ==
      10L * graft.relational.Sketches.CmsD)
  }

  test("J14 kmv sketch stream: bounded distinct state, idempotent under re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    // 60 events over 25 distinct users per type — above K=16, so the
    // bounded heap genuinely evicts
    val evs = (1L to 120L).map(i => Event(i, base, i % 25,
      if (i % 2 == 0) "view" else "click", 1.0))
    val mem = MemoryStream[Event]
    val q = Streaming.kmvSketchStream(mem.toDF())
      .writeStream.format("memory").queryName("kmv_bot")
      .outputMode("complete").start()
    mem.addData(evs.take(60): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(60): _*)
    q.processAllAvailable()
    def state(): Map[String, Seq[Long]] =
      spark.sql("SELECT * FROM kmv_bot").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val once = state()
    val batch = graft.relational.Sketches.kmvBottomK(
      graft.relational.Sketches.kmvHashes(evs.toDF())).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(once == batch && batch.nonEmpty)
    assert(batch.values.forall(_.length == graft.relational.Sketches.KmvK))
    // re-delivery: inserting already-seen hashes must not move ANY
    // group's state — the idempotent contract (vs J13's inflation)
    mem.addData(evs.take(40): _*)
    q.processAllAvailable()
    q.stop()
    assert(state() == batch)
  }

  test("J15 sketch store stream: micro-batches maintain the persisted store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sketch_stream_ckpt").toString
    // 80 events across 3 days, day 2 split across the two micro-
    // batches — forces the same-partition merge path
    val evs = (1L to 80L).map { i =>
      Event(i, Timestamp.valueOf(s"2024-01-0${1 + (i % 3)} 10:00:00"),
        i % 21, if (i % 2 == 0) "view" else "click", i.toDouble)
    }
    val mem = MemoryStream[Event]
    val q = Streaming.sketchStoreStream(mem.toDF(), storeDir)
      .option("checkpointLocation", ckpt).start()
    mem.addData(evs.take(50): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    // the continuously-maintained store answers exactly what a batch
    // save over the full corpus answers — every family
    val batchDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_stream_batch").toString
    graft.relational.SketchStore.save(evs.toDF(), batchDir)
    for ((sub, schema) <- Seq(
        "kmv" -> "event_type STRING, bot ARRAY<BIGINT>, day DATE",
        "hll" -> "event_type STRING, j INT, mj INT, day DATE",
        "cms" -> "r INT, b BIGINT, c BIGINT, day DATE",
        "qtl" -> ("event_type STRING, n_total BIGINT, " +
          "samp ARRAY<STRUCT<hv: BIGINT, value: DOUBLE>>, day DATE"))) {
      val got = spark.read.schema(schema).parquet(s"$storeDir/$sub")
        .collect().map(_.toString).toSet
      val want = spark.read.schema(schema).parquet(s"$batchDir/$sub")
        .collect().map(_.toString).toSet
      assert(got == want && want.nonEmpty, s"family $sub diverged")
    }
  }

  test("J16 snapshot diff stream: insert/update rows bit-equal the batch diff") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (old, neu) = graft.relational.SnapshotDiff.carved(
      graft.sources.Tables.orders(spark, sf))
    val oldRows = old.collect()
    val feed = neu.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2), r.getAs[java.time.LocalDateTime](3)))
    val mem = MemoryStream[(Long, Double, String, java.time.LocalDateTime)]
    val q = snapshotDiffStream(
      mem.toDF().toDF("o_orderkey", "o_totalprice", "o_orderstatus",
        "o_orderdate"),
      old.localCheckpoint(true))
      .writeStream.format("memory").queryName("snap_diff")
      .outputMode("append").start()
    // the new snapshot lands across two micro-batches mid-table
    mem.addData(feed.take(feed.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(feed.drop(feed.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("snap_diff").collect()
      .map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Long])
    // the batch face minus deletes: absence never ARRIVES on a stream
    val batch = graft.relational.SnapshotDiff.snapshotDiff(spark, sf)
      .filter(col("kind") =!= "delete").collect()
      .map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.nonEmpty && streamed.length == batch.length)
    assert(streamed.toList == batch.toList)
    // and the deletes the stream cannot see exist only on the batch face
    assert(graft.relational.SnapshotDiff.snapshotDiff(spark, sf)
      .filter(col("kind") === "delete").count() ==
      oldRows.length - feed.count(t => oldRows.exists(_.getLong(0) == t._1)))
  }

  test("J17 snapshot apply stream: the store converges to old ∘ (inserts ∪ updates)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (old0, neu) = graft.relational.SnapshotDiff.carved(
      graft.sources.Tables.orders(spark, sf))
    val old = old0.localCheckpoint(true)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_snapstore_stream").toString + "/st"
    graft.relational.SnapshotStore.init(old, storeDir)
    val feed = neu.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2), r.getAs[java.time.LocalDateTime](3)))
    val mem = MemoryStream[(Long, Double, String, java.time.LocalDateTime)]
    val q = Streaming.snapshotApplyStream(
      Streaming.snapshotDiffStreamWide(
        mem.toDF().toDF("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderdate"),
        old),
      storeDir).start()
    mem.addData(feed.take(feed.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(feed.drop(feed.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    // each micro-batch landed as one version: init + 2 applies
    assert(graft.relational.SnapshotStore
      .currentVersion(spark, storeDir) == 3L)
    // the store converges to the batch apply over the DELETE-FREE
    // diff (the J16 honest contract: absence never arrives)
    val wideDiff = graft.relational.SnapshotDiff.classifiedWide(
      graft.relational.SnapshotDiff.asOld(old).join(
        graft.relational.SnapshotDiff.asNew(neu),
        col("k_old") === col("k_new"), "full_outer"))
      .filter(col("kind") =!= "delete")
    val expect = graft.relational.SnapshotDiff.applyDiff(old, wideDiff)
    val got = graft.relational.SnapshotStore.readCurrent(spark, storeDir)
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // an at-least-once replay of an already-applied micro-batch id
    // is a no-op (the store's marker guard)
    graft.relational.SnapshotStore.applyDiffOnce(spark, storeDir,
      wideDiff, 1L)
    assert(graft.relational.SnapshotStore
      .currentVersion(spark, storeDir) == 3L)
  }

  test("J19 purge stream: every retained version forgets the keys; " +
      "re-delivery is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (old0, neu) = graft.relational.SnapshotDiff.carved(
      graft.sources.Tables.orders(spark, sf))
    val old = old0.localCheckpoint(true)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_snappurge_stream").toString + "/st"
    graft.relational.SnapshotStore.init(old, storeDir)
    val wideDiff = graft.relational.SnapshotDiff.classifiedWide(
      graft.relational.SnapshotDiff.asOld(old).join(
        graft.relational.SnapshotDiff.asNew(neu),
        col("k_old") === col("k_new"), "full_outer"))
      .localCheckpoint(true)
    graft.relational.SnapshotStore.applyDiffOnce(
      spark, storeDir, wideDiff, 1L) // v2
    // two request micro-batches: disjoint halves of a deterministic
    // ~5% subject set drawn from the old snapshot
    val keys: Array[Long] = old.select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
      .zipWithIndex.collect { case (k, i) if i % 20 == 0 => k }
    assert(keys.length >= 2)
    val (half1, half2) = keys.splitAt(keys.length / 2)
    val mem = MemoryStream[Long]
    val q = Streaming.snapshotPurgeStream(
      mem.toDF().toDF("o_orderkey"), storeDir).start()
    mem.addData(half1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(half2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    // pointer untouched — purge changes content, not visibility
    assert(graft.relational.SnapshotStore
      .currentVersion(spark, storeDir) == 2L)
    // EVERY retained version forgot the union of both batches, and
    // kept everything else (the batch purge expectation)
    val keyDf = keys.toSeq.toDF("o_orderkey")
    val expectV1 = old.join(keyDf, Seq("o_orderkey"), "left_anti")
    val expectV2 = graft.relational.SnapshotDiff.applyDiff(old, wideDiff)
      .join(keyDf, Seq("o_orderkey"), "left_anti")
    for ((v, want) <- Seq(1L -> expectV1, 2L -> expectV2)) {
      val got = graft.relational.SnapshotStore.readAt(spark, storeDir, v)
      assert(got.join(keyDf, Seq("o_orderkey"), "left_semi").isEmpty,
        s"v$v still contains purged keys")
      assert(got.count() == want.count() &&
        got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"v$v lost or changed non-purged rows")
    }
    // at-least-once: re-delivering a whole request batch is a no-op
    // (idempotence by algebra — no marker needed)
    val snap = graft.relational.SnapshotStore
      .readCurrent(spark, storeDir).collect().toSet
    graft.relational.SnapshotStore.purgeKeys(spark, storeDir,
      half1.toSeq.toDF("o_orderkey"))
    assert(graft.relational.SnapshotStore
      .readCurrent(spark, storeDir).collect().toSet == snap)
  }
}
