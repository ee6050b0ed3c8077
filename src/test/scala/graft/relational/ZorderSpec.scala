package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The point of K31's Morton keys: a z-sorted file layout bounds the
  * files touched by range predicates on EITHER dimension, where a
  * 1-D sort only prunes its own sort column — the multi-dimensional
  * file-skipping property (Delta/Iceberg Z-ORDER BY) that decides
  * scan cost at 100 TB.
  */
class ZorderSpec extends SparkSpec {

  private def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(dir).filter(pred)
      .select(col("_metadata.file_path")).distinct().count()

  test("z-order layout bounds file count for range queries on both dims") {
    val keyed = SqlApi.zorderKeys(graft.sources.Tables.orders(spark, sf))
    val orders = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(keyed.select("o_orderkey", "zval"), "o_orderkey")
      .withColumn("d", expr("unix_date(cast(o_orderdate as date))"))
    val base = Files.createTempDirectory("graft_zorder").toString
    val zDir = s"$base/z"
    val ckDir = s"$base/ck"
    orders.repartitionByRange(16, col("zval"))
      .write.mode(SaveMode.Overwrite).parquet(zDir)
    orders.repartitionByRange(16, col("o_custkey"))
      .write.mode(SaveMode.Overwrite).parquet(ckDir)

    val (ckLo, ckHi, dLo, dHi) = {
      val r = orders.agg(min("o_custkey"), max("o_custkey"),
        min("d"), max("d")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))
    }
    // a 1/8-wide band in each dimension
    def band(lo: Long, hi: Long) = (lo + (hi - lo) / 2, lo + (hi - lo) * 5 / 8)
    val (cb0, cb1) = band(ckLo, ckHi)
    val (db0, db1) = band(dLo, dHi)
    val ckPred = col("o_custkey").between(cb0, cb1)
    val dPred = col("d").between(db0, db1)

    // custkey-sorted layout: prunes its own column but a date band
    // touches (nearly) every file
    assert(filesTouched(ckDir, ckPred) <= 4)
    assert(filesTouched(ckDir, dPred) >= 14)
    // z-sorted layout: BOTH bands stay bounded well below the full
    // file count (Morton squares: a 1/8 band crosses ~one row of the
    // 4x4 file grid)
    assert(filesTouched(zDir, ckPred) <= 9)
    assert(filesTouched(zDir, dPred) <= 9)
  }

  test("K72 executor: committed layout is bit-exact, one file per " +
      "bucket, both axes quadrant-bounded") {
    val dst = Files.createTempDirectory("graft_zx").toString + "/zx"
    ZOrderExport.execute(spark, sf, dst)
    val landed = ZOrderExport.loadExported(spark, dst)
    // round-trip: exactly the keyed frame, nothing lost or mutated
    val expect = SqlApi.zorderFrame(graft.sources.Tables.orders(spark, sf))
      .withColumn("bucket", expr(s"zval div ${65536 / ZOrderExport.ZBuckets}"))
      .select("o_orderkey", "o_custkey", "d", "xb", "yb", "zval", "bucket")
    assert(landed.count() == expect.count())
    assert(landed.exceptAll(expect).isEmpty &&
      expect.exceptAll(landed).isEmpty)
    // one part file per bucket directory
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dst), spark.sparkContext.hadoopConfiguration)
    for (st <- fs.listStatus(new org.apache.hadoop.fs.Path(dst))
         if st.getPath.getName.startsWith("bucket=")) {
      val parts = fs.listStatus(st.getPath)
        .count(_.getPath.getName.startsWith("part-"))
      assert(parts == 1, s"${st.getPath.getName} has $parts part files")
    }
    // the multi-dim claim: every bucket confines BOTH dimension cells
    // to a quarter-domain band (top 2 bits of each axis fixed)
    val spans = landed.groupBy("bucket")
      .agg((max("xb") - min("xb")).as("xs"), (max("yb") - min("yb")).as("ys"))
      .collect()
    assert(spans.nonEmpty)
    for (r <- spans) {
      assert(r.getAs[Long]("xs") <= 63 && r.getAs[Long]("ys") <= 63,
        s"bucket ${r.get(0)} exceeds its quadrant band")
    }
  }
}
