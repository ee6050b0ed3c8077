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

  test("two corpora get two store dirs (path-addressed identity)") {
    assert(SketchStore.storeDirFor("/a/corpus") !=
      SketchStore.storeDirFor("/b/corpus"))
  }
}
