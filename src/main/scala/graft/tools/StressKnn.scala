package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: targeted knn_join scaling check (the StressBench embAmp
  * amplification, timing ONLY the corpus-wide self-join) — fast
  * feedback on the dynamic plane-count geometry without paying for
  * the full stress suite. Usage: runMain graft.tools.StressKnn
  * [sfDir] [mult1,mult2,...]
  */
object StressKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("12,24").split(",").map(_.toInt)
    val spark = graft.Engine.session("graft-stress-knn")
    spark.sparkContext.setLogLevel("WARN")

    def rngPerm(n: Int, seed: Long): Array[Int] = {
      val r = new java.util.Random(seed * 0x9E3779B97F4A7C15L + n)
      val out = Array.range(0, n)
      for (k <- n - 1 to 1 by -1) {
        val j = r.nextInt(k + 1)
        val t = out(k); out(k) = out(j); out(j) = t
      }
      out
    }

    for (mult <- mults) {
      val embAmp = (0 until mult).map { i =>
        val p = rngPerm(64, i.toLong)
        graft.sources.Tables.table(spark, sfDir, "embeddings")
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L))
          .withColumn("embedding", expr(
            p.map(d => s"element_at(embedding, ${d + 1})")
              .mkString("array(", ", ", ")")))
      }.reduce(_ unionByName _)
      val n = embAmp.count()
      val planes = graft.sim.Knn.planesFor(n)
      // candidate-pair volume under the occupancy-capped cell key
      val cap = graft.sim.Knn.BucketCap
      val sig = graft.sim.Knn.saltByOccupancy(
        graft.Par.spread(embAmp)
          .select(col("vec_id"),
            graft.sim.Knn.lshBucket("embedding", planes).as("bucket"))
          .localCheckpoint(true))
        .localCheckpoint(true)
      val pairN = sig.select(col("vec_id"), col("bucket"), col("salt"))
        .join(sig.select(col("vec_id").as("v2"), col("bucket"), col("salt")),
          Seq("bucket", "salt"))
        .filter(col("vec_id") =!= col("v2")).count()
      val t2 = System.nanoTime()
      val rows = graft.sim.Knn.lshJoin(embAmp, 3).count()
      println(f"STRESSKNN x$mult: n=$n planes=$planes pairs=$pairN " +
        f"full=${(System.nanoTime() - t2) / 1e9}%.2f s ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
