package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single SparkEntry query N times.
  * Usage: runMain graft.tools.TimeOne <queryName> [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- name.split(",").toSeq; i <- 1 to reps) {
      val fn = graft.SparkEntry.queries(q)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      spark.catalog.clearCache()
      println(f"TIMEONE $q rep$i: ${(t1 - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
