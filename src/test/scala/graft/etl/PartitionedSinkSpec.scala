package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedSinkSpec extends SparkSpec {

  test("partitioned sink prunes partitions on read and overwrites dynamically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString + "/obs"
    val obs = Observations.build(spark, sf)
    Clean.loadPartitioned(obs, tmp, "full-refresh", Seq("year"))

    // partition pruning: the year predicate must land in the scan's
    // PartitionFilters (file-index level), not a data Filter
    val one = spark.read.parquet(tmp).filter(col("year") === 1997)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("year"),
      s"no partition filter in plan:\n$plan")
    assert(one.count() ==
      Observations.build(spark, sf).filter(col("year") === 1997).count())

    // dynamic overwrite of a single partition leaves the rest intact
    val before = spark.read.parquet(tmp).count()
    val y97 = obs.filter(col("year") === 1997)
    Clean.loadPartitioned(y97, tmp, "truncate", Seq("year"))
    val after = spark.read.parquet(tmp).count()
    assert(after == before)
  }
}
