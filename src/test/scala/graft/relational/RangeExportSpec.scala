package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Pins what the range_exported_layout hash gate can't see: the
  * physical layout (one file per bucket), agreement with the K55
  * audit's exact per-bucket counts, and the zone-map payoff (K56 on
  * the exported layout reports the fully-clustered extreme).
  */
class RangeExportSpec extends SparkSpec {

  private lazy val dst = {
    val d = Files.createTempDirectory("graft_range_spec").toString + "/orders"
    RangeExport.execute(spark, sf, d)
    d
  }

  test("per-bucket rows equal the K55 audit's n_rows exactly") {
    val audit = Sketches.rangePartitionPlan(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_rows")).toMap
    val landed = RangeExport.loadExported(spark, dst)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    assert(landed == audit,
      "exported bucket counts diverge from the plan audit")
  }

  test("one part file per bucket directory; rows round-trip bit-exact") {
    val root = new java.io.File(dst)
    val dirs = root.listFiles().filter(_.getName.startsWith("bucket="))
    assert(dirs.length == Sketches.RppB)
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.startsWith("part-")) == 1,
        s"${d.getName} not compact")
    }
    val src = Tables.orders(spark, sf).filter(col("o_totalprice").isNotNull)
    val back = RangeExport.loadExported(spark, dst)
      .select(src.columns.map(col): _*)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("K56 over the exported layout: fully clustered (n_chains == n_buckets)") {
    // bucket ranges are disjoint by construction (v >= boundary is
    // strict between adjacent buckets), so the zone-map chain count
    // must hit the clustered extreme — every bucket prunable
    val z = RangeExport.loadExported(spark, dst)
      .groupBy(col("bucket").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        min("o_totalprice").as("min_v"), max("o_totalprice").as("max_v"))
    val rep = Sketches.zoneMapOf(z).collect()
    assert(rep.length == Sketches.RppB)
    assert(rep.head.getAs[Long]("n_chains") == Sketches.RppB.toLong,
      "exported layout is not value-clustered")
  }
}
