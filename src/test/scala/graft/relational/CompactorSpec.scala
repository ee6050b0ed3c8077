package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins what the compacted_layout hash gate can't see: the physical
  * file layout (one file per batch), the crash-whole commit, the
  * bit-exact data round-trip, and that compaction clears K54's
  * small-partition flags.
  */
class CompactorSpec extends SparkSpec {

  private lazy val dst = {
    val d = Files.createTempDirectory("graft_compact_spec").toString + "/ev"
    Compactor.execute(Tables.events(spark, sf), d)
    d
  }

  test("round-trip: compacted rows bit-equal the source events") {
    val src = Tables.events(spark, sf).filter(col("ts").isNotNull)
    val back = Compactor.loadCompacted(spark, dst)
      .select(src.columns.map(col): _*)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty, "compacted rows not in source")
    assert(src.exceptAll(back).isEmpty, "source rows lost by compaction")
  }

  test("one part file per batch directory") {
    val root = new java.io.File(dst)
    val grps = root.listFiles().filter(_.getName.startsWith("grp="))
    assert(grps.nonEmpty)
    grps.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1,
        s"${d.getName} has ${parts.length} part files")
    }
  }

  test("batches cover disjoint contiguous day ranges") {
    val ranges = Compactor.loadCompacted(spark, dst)
      .groupBy("grp")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .orderBy("grp").collect()
      .map(r => (r.getAs[java.sql.Date]("lo"), r.getAs[java.sql.Date]("hi")))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi.before(lo2), s"batch ranges overlap: $hi >= $lo2")
      case _ =>
    }
    // contiguity: every day between lo and hi of a batch belongs to
    // that batch (no day of a batch's range leaked to another batch)
    val dayGrps = Compactor.loadCompacted(spark, dst)
      .select("day", "grp").distinct().collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("grp"))
    assert(dayGrps.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1),
      "a day split across batches")
  }

  test("K54 re-run on the compacted batch axis: no small partitions") {
    // the point of compacting: the batch axis carries no partition
    // under half a target file (every batch holds >= CompactTargetRows
    // rows except possibly the final remainder, and the remainder at
    // this fixture is > WriteTargetRows/2)
    val layout = Sketches.layoutOf(
      Compactor.loadCompacted(spark, dst)
        .groupBy(col("grp").as("day"))
        .agg(count(lit(1)).as("n_rows")),
      "day").collect()
    assert(layout.nonEmpty)
    assert(layout.forall(_.getAs[Long]("is_small") == 0L),
      "compacted layout still has small partitions")
  }

  test("writePlanned lands exactly the K54 plan's n_files per day") {
    val d = Files.createTempDirectory("graft_write_planned").toString + "/ev"
    Compactor.writePlanned(Tables.events(spark, sf), d)
    val plan = Sketches.partitionLayoutPlan(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("n_files")).toMap
    val root = new java.io.File(d)
    val dirs = root.listFiles().filter(_.getName.startsWith("day="))
    assert(dirs.length == plan.size)
    dirs.foreach { dd =>
      val day = dd.getName.drop("day=".length)
      val parts = dd.listFiles().count(_.getName.startsWith("part-"))
      assert(parts.toLong == plan(day),
        s"day $day landed $parts files, plan says ${plan(day)}")
    }
    // and the written rows round-trip
    val src = Tables.events(spark, sf).filter(col("ts").isNotNull)
    assert(spark.read.parquet(d).count() == src.count())
    // multi-file case: amplify the corpus past the per-file target so
    // ceil(rows/target) > 1, and the file count still obeys the plan
    val big = (1 to 40).map(_ => src).reduce(_.unionByName(_))
    val d2 = Files.createTempDirectory("graft_write_planned2").toString + "/ev"
    Compactor.writePlanned(big, d2)
    val plan2 = Sketches.layoutOf(
      big.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows")), "day").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("n_files")).toMap
    assert(plan2.values.exists(_ > 1L), "fixture must need multiple files")
    new java.io.File(d2).listFiles().filter(_.getName.startsWith("day="))
      .foreach { dd =>
        val day = dd.getName.drop("day=".length)
        val parts = dd.listFiles().count(_.getName.startsWith("part-"))
        assert(parts.toLong == plan2(day),
          s"day $day landed $parts files, plan says ${plan2(day)}")
      }
  }

  test("staged-swap commit: a crash prefix leaves old or new, never a mix") {
    val d = Files.createTempDirectory("graft_compact_crash").toString + "/ev"
    Compactor.execute(Tables.events(spark, sf), d)
    val before = Compactor.loadCompacted(spark, d).count()
    // simulate a crash that left a stale _staging dir from a dead
    // run: the next execute must overwrite it and commit cleanly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${d}_staging/garbage"))
    Compactor.execute(Tables.events(spark, sf), d)
    assert(Compactor.loadCompacted(spark, d).count() == before)
    // neither staging nor _old survive a completed commit
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${d}_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${d}_old")))
  }
}
