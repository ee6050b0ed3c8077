package graft

/** Dev tool: dump formatted physical plans for selected queries
  * (plan-shape review — pushdown, broadcast, partial agg, codegen).
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q3_join", "explorer_filter", "insights_trend",
        "dedup_minhash", "knn_brute")
    val spark = Engine.session("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
