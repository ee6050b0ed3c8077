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
    // One-time shared index/model builds, timed separately so each
    // query reports its MARGINAL cost: billing a build to its first
    // alphabetical consumer made per-query numbers incomparable
    // round-over-round (a memo's first consumer "regresses" whenever
    // a new query sorts ahead of it). The builds go through the SAME
    // memoized entry points the queries hit (plan-keyed), and their
    // checkpoint blocks survive the per-query clearCache below.
    // A throwing query records its error, not a ~4 ms phantom success:
    // r8's regenerated events parquet broke 15 queries and the bench
    // reported them as the fastest entries of the round.
    def timed(fn: () => Unit): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(); None } catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val builds: Seq[(String, Double)] = Seq[(String, () => Unit)](
      "observations" -> (() => { etl.Observations.panel(spark, sfDir).count(); () }),
      "neardup_index" -> (() =>
        { dedup.NearDup.index(sources.Tables.documents(spark, sfDir)); () }),
      "tfidf_index" -> (() =>
        { text.Tfidf.index(sources.Tables.documents(spark, sfDir),
            "doc_id", "text"); () }),
      "gbt_model" -> (() =>
        forecast.Gbt.prebuild(etl.Observations.panel(spark, sfDir))),
      "ivf_index" -> (() => sim.Ivf.prebuild(spark, sfDir)),
      "given_centroid_lists" -> (() => sim.Ivf.prebuildGiven(spark, sfDir)),
      // after neardup_index: the LR labels read the L2 verdict, which
      // probes the (already-billed) standing pair index
      "quality_lr" -> (() =>
        pipeline.QualityModel.prebuild(sources.Tables.documents(spark, sfDir))),
      "pq_codes" -> (() => sim.Pq.prebuild(spark, sfDir)),
      // after given_centroid_lists: residual codes quantize against
      // the (already-billed) given-quantizer assignment
      "pq_residual_codes" -> (() => sim.Pq.prebuildResidual(spark, sfDir))
    ).map { case (name, fn) => name -> timed(fn)._1 }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t, err) = timed(() => { fn(spark, sfDir).count(); () })
      // release per-query persisted relations so cached blocks don't
      // accumulate GC pressure across the suite — outside the timed
      // window, so one query's teardown doesn't bill the next
      spark.catalog.clearCache()
      (name, t, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries appear as {"err": "..."} objects, never as times
    val queriesJson = results.map {
      case (k, v, None) => s"\"" + k + "\":" + v
      case (k, _, Some(e)) => s"\"" + k + "\":{\"err\":" + jstr(e) + "}"
    }.mkString("{", ",", "}")
    val failures = results.count(_._3.isDefined)
    // total keeps covering builds + queries (comparable to r1-r5
    // totals, where builds were billed inside their first consumer)
    val total = builds.map(_._2).sum + results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"builds":${obj(builds)},"queries":$queriesJson,"sf":"$sfDir"}"""
    println(line)
    // stdout is shared with stray log lines; the file is the
    // machine-parseable copy (r6 item: BENCH_r08 had "parsed": null)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
