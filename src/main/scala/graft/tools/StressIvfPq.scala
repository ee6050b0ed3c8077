package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: scaling check for the PERSISTED composed IVFPQ index
  * (G26/G27) — the StressKnn embAmp amplification applied to the
  * serving story. Per rung: build+save the index once, then time the
  * served residual-ADC top-k and the rerank face against the honest
  * competitor (brute-force exact top-k over the full corpus), and
  * count the list directories the serve actually read vs the total —
  * the partition-pruning bound that makes the index sublinear. Two
  * indexes per rung: the pinned 16-list GIVEN twin (probes a constant
  * 4/16 fraction — linear by construction, kept for the hash gate)
  * and the TRAINED √n-list index with capped probes (PqTrained — the
  * production geometry, whose serve should scale ~√n: 4× corpus ≈ 2×
  * serve), plus a recall@k-vs-nProbe sweep of the trained index
  * against exact ground truth.
  * Usage: runMain graft.tools.StressIvfPq [sfDir] [mult1,mult2,...]
  */
object StressIvfPq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("6,12,24").split(",").map(_.toInt)
    val spark = graft.Engine.session("graft-stress-ivfpq")
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

    def timed(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (mult <- mults) {
      // replica 0 keeps the original ids so codebook/centroid vectors
      // (vec_id < 16) and the 5 query ids exist once. The replicas
      // ride a broadcast (rep, perm) table + one transform — NOT a
      // mult-way union of per-replica projections, whose 960-branch
      // plan shipped 80 MB task binaries and stalled in codegen at
      // the top rung. Data identical: replica i permutes dimensions
      // by rngPerm(64, i) exactly as before.
      val spark2 = spark
      import spark2.implicits._
      val perms = (0 until mult).map { i =>
        val p = if (i == 0) Array.range(0, 64) else rngPerm(64, i.toLong)
        (i.toLong, p.toSeq)
      }.toDF("rep", "perm")
      val embAmp = graft.sources.Tables.table(spark, sfDir, "embeddings")
        .select("vec_id", "embedding")
        .crossJoin(broadcast(perms))
        .select(
          (col("vec_id") + col("rep") * lit(100000000L)).as("vec_id"),
          expr("""transform(sequence(1, 64),
                 |  d -> element_at(embedding, element_at(perm, d) + 1))"""
            .stripMargin).as("embedding"))
        .localCheckpoint(true)
      val n = embAmp.count()
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_stress_ivfpq_x$mult").toString
      val t0 = System.nanoTime()
      graft.sim.Pq.saveIvfPq(embAmp, d)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val queries = embAmp.filter(col("vec_id") < graft.sim.Pq.QueryIds)
        .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
        .localCheckpoint(true)
      val (tServe, _) = timed {
        graft.sim.Pq.servedIvfPqKnn(spark, d, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds).count()
      }
      val (tRerank, _) = timed {
        graft.sim.Pq.servedIvfPqRerank(spark, d, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds).count()
      }
      // TRAINED index (√n lists, capped probes — the production
      // geometry): build+save once, then time the served ADC and
      // sweep recall@k over nProbe against exact ground truth
      val dT = java.nio.file.Files
        .createTempDirectory(s"graft_stress_ivfpq_trained_x$mult").toString
      val tT0 = System.nanoTime()
      graft.sim.PqTrained.save(embAmp, dT)
      val tBuildTrained = (System.nanoTime() - tT0) / 1e9
      val nListsTrained = graft.sim.Ivf.numLists(n)
      val (tServeTrained, _) = timed {
        graft.sim.PqTrained.servedKnn(spark, dT, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds).count()
      }
      // exact ground truth once; recall per probe count in the driver
      val exactTop = {
        val q = queries
        val c = embAmp.filter(col("vec_id") >= graft.sim.Pq.QueryIds)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ec"))
        val scored = c.crossJoin(broadcast(q))
          .withColumn("dsq", expr(
            """aggregate(zip_with(eq, ec, (x, y) ->
              |  (cast(x as double) - cast(y as double)) *
              |  (cast(x as double) - cast(y as double))),
              |  cast(0 as double), (a, v) -> a + v)""".stripMargin))
          .withColumn("sim", -col("dsq"))
        graft.plans.AggExpressions
          .topKPerKey(scored, "query_id", "sim", "neighbor_id", Nil, 3)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recallSweep = Seq(4, 8, 16, 32).map { p =>
        def rec(df: org.apache.spark.sql.DataFrame): Double = {
          val got = df.select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          got.count(exactTop.contains).toDouble /
            math.max(1, exactTop.size)
        }
        val adc = rec(graft.sim.PqTrained.knn(embAmp, Some(p)))
        val rr = rec(graft.sim.PqTrained.knnRerank(embAmp, Some(p)))
        s""""$p":{"adc":${f"$adc%.4f"},"rerank":${f"$rr%.4f"}}"""
      }.mkString("{", ",", "}")
      // the honest competitor: exact cosine-free squared-L2 top-k by
      // full scan (the knn_brute shape) over the same corpus
      val (tBrute, _) = timed {
        val q = queries.select(col("query_id"), col("eq"))
        val c = embAmp.filter(col("vec_id") >= graft.sim.Pq.QueryIds)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ec"))
        val scored = c.crossJoin(broadcast(q))
          .withColumn("dsq", expr(
            """aggregate(zip_with(eq, ec, (x, y) ->
              |  (cast(x as double) - cast(y as double)) *
              |  (cast(x as double) - cast(y as double))),
              |  cast(0 as double), (a, v) -> a + v)""".stripMargin))
          .withColumn("sim", -col("dsq"))
        graft.plans.AggExpressions
          .topKPerKey(scored, "query_id", "sim", "neighbor_id", Nil, 3)
          .count()
      }
      // pruning bound: directories the served scan listed vs total
      val totalLists = new java.io.File(s"$d/codes").listFiles()
        .count(_.getName.startsWith("list_id="))
      val probed = graft.sim.Pq.servedIvfPqKnn(spark, d, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds)
        .select("list_id").distinct().count()
      val line =
        s"""{"mult":$mult,"n_vectors":$n,"sec_build":$tBuild,
           |"sec_served_adc":$tServe,"sec_served_rerank":$tRerank,
           |"sec_brute_exact":$tBrute,
           |"lists_total":$totalLists,"lists_in_topk":$probed,
           |"probe_bound":"${graft.sim.Ivf.GivenProbe}/$totalLists",
           |"sec_build_trained":$tBuildTrained,
           |"sec_served_adc_trained":$tServeTrained,
           |"lists_trained":$nListsTrained,
           |"probe_trained":${graft.sim.PqTrained.probeCount(nListsTrained)},
           |"recall_at_probes_trained":$recallSweep}"""
          .stripMargin.replaceAll("\n", "")
      println("STRESSIVFPQ " + line)
      out += line
      graft.Caches.clearAll()
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(
      java.nio.file.Path.of("STRESSIVFPQ_r17.json"),
      out.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
