package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // graft SQL functions, as Engine does
    // Warm up JIT/codegen/parquet paths before timing: flagship query
    // at the smallest SF plus a window + HOF + the text/hash path
    // (md5, explode, regex split, collect_set) so interpreter and
    // codegen hot paths are compiled — warmed on sf0.001 data, never
    // the benched SF. Not counted.
    try {
      SparkEntry.entry(spark).count()
      spark.sql(
        """SELECT sum(v) FROM (
          |  SELECT aggregate(sequence(1, 50), 0L, (a, x) -> a + x)
          |    + row_number() OVER (ORDER BY id) AS v
          |  FROM range(1000))""".stripMargin).count()
      graft.dedup.Dedup.shingleSets(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .limit(50), "doc_id", "text").count()
      graft.text.Tfidf.postings(
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .limit(50), "doc_id", "text").count()
    } catch { case _: Throwable => () }
    // sorted: stable attribution of shared-index build costs to the
    // alphabetically-first consumer, comparable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val t1 = System.nanoTime()
      // release per-query persisted relations so cached blocks don't
      // accumulate GC pressure across the suite — outside the timed
      // window, so one query's teardown doesn't bill the next
      spark.catalog.clearCache()
      name -> (t1 - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
