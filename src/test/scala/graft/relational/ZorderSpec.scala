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
}
