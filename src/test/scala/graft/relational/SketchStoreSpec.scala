package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** K41-K43 — the persisted-sketch lifecycle: daily states saved
  * day-partitioned, rollups served from the artifact alone. The
  * merge laws (already spec-pinned in SketchesSpec on in-memory
  * shards) must survive the parquet round-trip, and the range scan
  * must prune to its day partitions.
  */
class SketchStoreSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)

  private lazy val storeDir: String = {
    val d = Files.createTempDirectory("graft_sketch_store").toString
    SketchStore.save(spark, sf, d)
    d
  }

  test("rollup over ALL persisted days equals the monolithic sketch") {
    // a cutoff past the last day ⇒ the rollup covers the whole corpus
    // and must reproduce the fresh monolithic build bit-for-bit
    val allKmv = Sketches.kmvEstimate(Sketches.kmvBottomK(
      spark.read.schema("event_type STRING, bot ARRAY<BIGINT>, day DATE")
        .parquet(s"$storeDir/kmv")
        .select(col("event_type"), explode(col("bot")).as("hv"))))
    assert(allKmv.collect().toSeq ==
      Sketches.sketchKmv(spark, sf).collect().toSeq)

    val allHll = Sketches.hllEstimate(
      spark.read.schema("event_type STRING, j INT, mj INT, day DATE")
        .parquet(s"$storeDir/hll")
        .groupBy("event_type", "j").agg(max("mj").as("mj")))
    assert(allHll.collect().toSeq ==
      Sketches.sketchHll(spark, sf).collect().toSeq)

    val allCms = spark.read.schema("r INT, b BIGINT, c BIGINT, day DATE")
      .parquet(s"$storeDir/cms")
      .groupBy("r", "b").agg(sum("c").cast("bigint").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mono = Sketches.cmsCounters(ev)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(allCms == mono && mono.nonEmpty)

    val qtlDaily = spark.read
      .schema("event_type STRING, n_total BIGINT, " +
        "samp ARRAY<STRUCT<hv: BIGINT, value: DOUBLE>>, day DATE")
      .parquet(s"$storeDir/qtl")
    val allQtl = Sketches.qtlEstimate(
      qtlDaily.groupBy("event_type")
        .agg(sum("n_total").cast("bigint").as("n_total"))
        .join(qtlDaily
          .select(col("event_type"), explode(col("samp")).as("x"))
          .groupBy("event_type")
          .agg(graft.plans.AggExpressions.collectTopK(col("x"),
            Sketches.QtlK, largestFirst = false).as("_s")), "event_type"))
    assert(allQtl.collect().toSeq ==
      Sketches.sketchQuantiles(spark, sf).collect().toSeq)
  }

  test("range rollup equals a fresh build over the range-filtered events") {
    val cut = ev.filter(col("user_id").isNotNull)
      .agg(min(to_date(col("ts")))).head().getDate(0)
      .toLocalDate.plusDays(SketchStore.RollupDays)
    val ranged = ev.filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(cut)))
    // the fixture must actually split: days both inside and outside
    val days = ev.select(to_date(col("ts")).as("d")).distinct().count()
    assert(days > SketchStore.RollupDays, s"fixture spans only $days days")

    val got = SketchStore.rollupKmvQ(spark, sf).collect().toSeq
    val want = Sketches.kmvEstimate(
      Sketches.kmvBottomK(Sketches.kmvHashes(ranged))).collect().toSeq
    assert(got == want && got.nonEmpty)

    val gotHll = SketchStore.rollupHllQ(spark, sf).collect().toSeq
    val wantHll = Sketches.hllEstimate(Sketches.hllRegisters(ranged))
      .collect().toSeq
    assert(gotHll == wantHll)

    val gotCms = SketchStore.rollupCmsQ(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wantCms = Sketches.cmsCounters(ranged)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCms == wantCms)

    // quantile cut derives from value-notnull days (its own artifact)
    val qCut = ev.filter(col("value").isNotNull)
      .agg(min(to_date(col("ts")))).head().getDate(0)
      .toLocalDate.plusDays(SketchStore.RollupDays)
    val qRanged = ev
      .filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(qCut)))
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        expr(Sketches.h48("qtl", "event_id")).as("hv"))
    val wantQtl = Sketches.qtlEstimate(qRanged.groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        graft.plans.AggExpressions.collectTopK(
          struct(col("hv"), col("value")),
          Sketches.QtlK, largestFirst = false).as("_s")))
    assert(SketchStore.rollupQtlQ(spark, sf).collect().toSeq ==
      wantQtl.collect().toSeq)
  }

  test("the range scan is partition-pruned to the rollup days") {
    val plan = SketchStore.rangedKmv(spark,
      SketchStore.prebuild(spark, sf)).queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*day[^\\]]*<".r.findFirstIn(plan)
    assert(pruned.isDefined, s"no day partition filter in:\n$plan")
  }

  test("writeDay appends a missing day and is idempotent on re-run") {
    val d = Files.createTempDirectory("graft_sketch_incr").toString
    val lastDay = ev.filter(col("user_id").isNotNull)
      .agg(max(to_date(col("ts")))).head().getDate(0).toLocalDate
    // store built WITHOUT the last day; the daily job then lands it
    SketchStore.save(
      ev.filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(lastDay))), d)
    SketchStore.writeDay(ev, d, lastDay)
    def rollupAll(): Seq[org.apache.spark.sql.Row] =
      Sketches.kmvEstimate(Sketches.kmvBottomK(
        spark.read.schema("event_type STRING, bot ARRAY<BIGINT>, day DATE")
          .parquet(s"$d/kmv")
          .select(col("event_type"), explode(col("bot")).as("hv"))))
        .collect().toSeq
    val mono = Sketches.sketchKmv(spark, sf).collect().toSeq
    assert(rollupAll() == mono)
    // the crashed-job contract: re-running the same day must replace
    // its partitions, not append duplicate state rows
    SketchStore.writeDay(ev, d, lastDay)
    assert(rollupAll() == mono)
    val lastDayRows = spark.read
      .schema("event_type STRING, bot ARRAY<BIGINT>, day DATE")
      .parquet(s"$d/kmv")
      .filter(col("day") === lit(java.sql.Date.valueOf(lastDay)))
    assert(lastDayRows.count() ==
      lastDayRows.select("event_type").distinct().count())
  }

  test("upsertBatch merges mid-day batches into exactly the full-save store") {
    val d = Files.createTempDirectory("graft_sketch_upsert").toString
    // split at an event_id cut so BOTH batches carry rows of the same
    // days — the merge path, not just the new-partition path
    val cut = ev.agg(max("event_id")).head().getLong(0) / 2
    SketchStore.upsertBatch(ev.filter(col("event_id") <= cut), d)
    SketchStore.upsertBatch(ev.filter(col("event_id") > cut), d)

    val full = Files.createTempDirectory("graft_sketch_full").toString
    SketchStore.save(ev, full)
    def rows(p: String, sub: String, schema: String): Set[String] =
      spark.read.schema(schema).parquet(s"$p/$sub")
        .collect().map(_.toString).toSet
    for ((sub, schema) <- Seq(
        "kmv" -> "event_type STRING, bot ARRAY<BIGINT>, day DATE",
        "hll" -> "event_type STRING, j INT, mj INT, day DATE",
        "cms" -> "r INT, b BIGINT, c BIGINT, day DATE",
        "qtl" -> ("event_type STRING, n_total BIGINT, " +
          "samp ARRAY<STRUCT<hv: BIGINT, value: DOUBLE>>, day DATE"))) {
      val got = rows(d, sub, schema)
      val want = rows(full, sub, schema)
      assert(got == want && want.nonEmpty, s"family $sub diverged")
    }
  }

  test("re-delivered batch: KMV/HLL idempotent, CMS/quantiles additive") {
    val d = Files.createTempDirectory("graft_sketch_redeliver").toString
    SketchStore.upsertBatch(ev, d)
    def kmv() = spark.read
      .schema("event_type STRING, bot ARRAY<BIGINT>, day DATE")
      .parquet(s"$d/kmv").collect().map(_.toString).toSet
    def hll() = spark.read
      .schema("event_type STRING, j INT, mj INT, day DATE")
      .parquet(s"$d/hll").collect().map(_.toString).toSet
    def cmsMass() = spark.read
      .schema("r INT, b BIGINT, c BIGINT, day DATE")
      .parquet(s"$d/cms").agg(sum("c")).head().getLong(0)
    def qtl() = spark.read
      .schema("event_type STRING, n_total BIGINT, " +
        "samp ARRAY<STRUCT<hv: BIGINT, value: DOUBLE>>, day DATE")
      .parquet(s"$d/qtl")
      .collect().map(r => (r.getString(0), r.getDate(3).toString) ->
        (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2))).toMap
    val (k1, h1, m1, q1) = (kmv(), hll(), cmsMass(), qtl())
    SketchStore.upsertBatch(ev, d) // at-least-once: the whole batch again
    assert(kmv() == k1 && hll() == h1)
    assert(cmsMass() == 2 * m1) // additive: inflates by the re-sent mass
    val q2 = qtl()
    assert(q2.keySet == q1.keySet)
    def bag(s: Seq[org.apache.spark.sql.Row]): Map[String, Int] =
      s.map(_.toString).groupBy(identity).view.mapValues(_.size).toMap
    q1.foreach { case (k, (n, samp)) =>
      assert(q2(k)._1 == 2 * n) // count additive
      // the sample is additive too: re-sent rows re-enter the bounded
      // heap as duplicates (each entry's multiplicity doubles while
      // the merged size stays under K)
      if (2 * samp.size <= Sketches.QtlK)
        assert(bag(q2(k)._2) == bag(samp).view.mapValues(_ * 2).toMap)
    }
  }

  test("wau: a report day's rolling state equals a fresh KMV over its window") {
    val wau = SketchStore.rollupWauQ(spark, sf)
    val last = wau.agg(max("report_day")).head().getDate(0)
    val lo = java.sql.Date.valueOf(
      last.toLocalDate.minusDays(SketchStore.RollupDays - 1))
    val fresh = Sketches.kmvEstimate(Sketches.kmvBottomK(Sketches.kmvHashes(
      ev.filter(to_date(col("ts")).between(lit(lo), lit(last))))))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.get(2), r.getDouble(3))).toMap
    val got = wau.filter(col("report_day") === lit(last))
      .collect().map(r => r.getString(1) ->
        (r.getInt(2), r.get(3), r.getDouble(4))).toMap
    assert(got == fresh && fresh.nonEmpty)
    // one row per (day, group): the report is days × groups sized
    val days = ev.filter(col("user_id").isNotNull)
      .select(to_date(col("ts"))).distinct().count()
    assert(wau.count() >= days)
  }

  test("wow overlap: one row per shared group, theta-consistent bounds") {
    val wow = SketchStore.rollupWowQ(spark, sf).collect()
    val types = ev.filter(col("user_id").isNotNull)
      .select("event_type").distinct().count()
    assert(wow.length == types) // every group active in both weeks
    wow.foreach { r =>
      val (nI, nU) = (r.getInt(2), r.getInt(3))
      val j = r.getDouble(6)
      assert(nI <= nU && nU > 0)
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getDouble(4) <= r.getDouble(5)) // est_inter <= est_union
    }
  }

  test("store stats: a lost day partition surfaces as a calendar gap") {
    val d = Files.createTempDirectory("graft_sketch_gap").toString
    SketchStore.save(ev, d)
    def kmvStats(): (Long, Long, Long) = {
      val daily = spark.read
        .schema("event_type STRING, bot ARRAY<BIGINT>, day DATE")
        .parquet(s"$d/kmv")
      val r = daily.agg(countDistinct("day"), min("day"), max("day"),
        count(lit(1))).head()
      (r.getLong(0),
        (r.getDate(2).toLocalDate.toEpochDay
          - r.getDate(1).toLocalDate.toEpochDay) + 1 - r.getLong(0),
        r.getLong(3))
    }
    val (days0, gaps0, _) = kmvStats()
    assert(gaps0 == 0 && days0 > 2)
    // simulate a silently-failed daily job: drop a MIDDLE day's dir
    val mid = ev.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day")).distinct()
      .orderBy("day").collect().map(_.getDate(0)).apply(1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$d/kmv/day=$mid"), true))
    val (days1, gaps1, _) = kmvStats()
    assert(days1 == days0 - 1 && gaps1 == 1)
  }

  test("hh window: never underestimates the exact window count, ranked") {
    val hh = SketchStore.hhWindowQ(spark, sf).collect()
    assert(hh.length == 10)
    val ests = hh.map(_.getLong(1))
    assert(ests.sliding(2).forall(p => p(0) >= p(1))) // ranked desc
    val cut = ev.filter(col("user_id").isNotNull)
      .agg(min(to_date(col("ts")))).head().getDate(0)
      .toLocalDate.plusDays(SketchStore.RollupDays)
    val window = ev.filter(col("user_id").isNotNull)
      .filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(cut)))
    val exact = window.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the emitted budget is ε·N = (e/w)·N for the window's mass N
    val n = window.count()
    val budget = math.E * n.toDouble / Sketches.CmsW
    hh.foreach { r =>
      val (est, emitted) = (r.getLong(1), r.getDouble(2))
      // CMS properties survive the store round-trip:
      // exact <= est <= exact + ε·N, and the surfaced budget is the
      // real ε·N (same literal, modulo the decimal(18,9) quantize)
      assert(est >= exact(r.getLong(0)))
      assert(est.toDouble <= exact(r.getLong(0)).toDouble + emitted)
      assert(math.abs(emitted - budget) < 1e-6)
    }
  }

  test("upsertBatchOnce: a completed batch's replay is a no-op") {
    val d = Files.createTempDirectory("graft_sketch_once").toString
    def mass(): Long = spark.read
      .schema("r INT, b BIGINT, c BIGINT, day DATE")
      .parquet(s"$d/cms").agg(sum("c")).head().getLong(0)
    SketchStore.upsertBatchOnce(ev, d, 7L)
    val m = mass()
    // foreachBatch re-invokes the SAME id after a crash-replay: the
    // recorded marker must make it a no-op even for the ADDITIVE
    // families (bare upsertBatch would double them)
    SketchStore.upsertBatchOnce(ev, d, 7L)
    assert(mass() == m)
    // a NEW id applies normally
    SketchStore.upsertBatchOnce(ev, d, 8L)
    assert(mass() == 2 * m)
  }

  test("upsertBatchOnce: mid-upsert crash replay skips landed families") {
    val d = Files.createTempDirectory("graft_sketch_mid").toString
    def cmsMass(): Long = spark.read
      .schema("r INT, b BIGINT, c BIGINT, day DATE")
      .parquet(s"$d/cms").agg(sum("c")).head().getLong(0)
    SketchStore.upsertBatchOnce(ev, d, 1L)
    val m = cmsMass()
    // simulate a crash AFTER the additive cms family committed but
    // BEFORE the batch finished: _done and the other families'
    // markers are gone, cms's survives — the replay must re-apply
    // only the marker-less families and leave cms alone (a bare
    // whole-batch replay would double it permanently)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    for (mk <- Seq("_done", "kmv", "hll", "qtl"))
      assert(fs.delete(
        new org.apache.hadoop.fs.Path(s"$d/_applied_batches/1/$mk"), true))
    SketchStore.upsertBatchOnce(ev, d, 1L)
    assert(cmsMass() == m)
    // legacy whole-batch marker (empty <id> dir) still means done
    val legacy = new org.apache.hadoop.fs.Path(s"$d/_applied_batches/2")
    fs.mkdirs(legacy)
    SketchStore.upsertBatchOnce(ev, d, 2L)
    assert(cmsMass() == m)
  }

  test("upsertBatchOnce: started-but-empty batch replays in full") {
    val d = Files.createTempDirectory("graft_sketch_started").toString
    def cmsMass(): Long = spark.read
      .schema("r INT, b BIGINT, c BIGINT, day DATE")
      .parquet(s"$d/cms").agg(sum("c")).head().getLong(0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    // simulate a crash right after the _started sentinel landed but
    // before ANY family applied: the batch dir exists and holds only
    // _started. Pre-sentinel code could reach the same dir-exists
    // state empty (a crash inside the first family marker's mkdirs)
    // and the empty-dir-means-legacy-done check then SKIPPED the
    // batch — silent data loss. With the sentinel the dir is
    // non-empty, so the replay must apply everything.
    fs.create(new org.apache.hadoop.fs.Path(
      s"$d/_applied_batches/5/_started"), true).close()
    SketchStore.upsertBatchOnce(ev, d, 5L)
    val m = cmsMass()
    assert(m > 0, "replay after started-only crash applied the batch")
    // and the completed batch is now marker-done: replay is a no-op
    SketchStore.upsertBatchOnce(ev, d, 5L)
    assert(cmsMass() == m)
  }

  test("two corpora get two store dirs (path-addressed identity)") {
    assert(SketchStore.storeDirFor("/a/corpus") !=
      SketchStore.storeDirFor("/b/corpus"))
  }
}
