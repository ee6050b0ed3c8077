package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected one-time builds (the Bench builds section)
  * N times, evicting every memo between reps so each rep is cold —
  * the focused iteration loop for build-phase optimization.
  * Usage: runMain graft.tools.TimeBuilds <name[,name...]|all> [sfDir] [reps]
  */
object TimeBuilds {
  def main(args: Array[String]): Unit = {
    val names = args(0)
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
    graft.GraftExtensions.register(spark)
    val all = graft.Bench.buildFns(spark, sfDir)
    val picked =
      if (names == "all") all
      else {
        val want = names.split(",").toSet
        all.filter { case (n, _) => want(n) }
      }
    for (i <- 1 to reps) {
      graft.Caches.clearAll()
      // honor declared build order inside the picked subset — some
      // builds deliberately reuse an earlier build's memo
      picked.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn()
        println(f"TIMEBUILD $n rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
