package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scaling check for the PERSISTED composed IVFPQ index
  * (G26/G27) — build+save per rung, time the served residual-ADC
  * top-k and rerank faces against the honest competitor (brute-force
  * exact top-k), for BOTH the pinned 16-list GIVEN twin (constant 4/16
  * probe fraction — linear by construction, kept for the hash gate)
  * and the TRAINED √n-list index with capped probes (PqTrained — the
  * production geometry, serve ~√n), plus a recall-vs-nProbe sweep of
  * the trained index against exact ground truth.
  *
  * The corpus is PLANTED-CLUSTER data (round 18 — the r17 verdict's
  * top item): the r17 fixture was permuted-replica random floats, the
  * provably adversarial case for PQ (no subspace structure → ADC
  * uncorrelated with true distance → recall noise-bound at 0.0-0.13
  * and FLAT in nProbe, so a real recall regression was invisible).
  * Here vectors are Gaussian clusters (σ_noise around seeded centers
  * — the shape real embeddings have) and each query gets exactly K
  * planted near-neighbors (σ_plant ≪ σ_noise) appended at the END of
  * the id space, so exact ground truth IS the planted set, found only
  * if probe routing reaches the query's cluster lists — recall now
  * RESPONDS to nProbe and certifies retrieval quality, not just
  * speed. Planted ids live at the top of the range so the given
  * twin's first-16-ids quantizer stays unpolluted.
  *
  * Usage: runMain graft.tools.StressIvfPq [n1,n2,...] [nCenters]
  */
object StressIvfPq {

  private val Dim = 64
  private val SigmaNoise = 0.25
  // half of σ_noise: tight enough that the planted points stay each
  // query's exact top-k (planted dist² ≈ 2·d·σ_plant² ≈ 2 vs ≥ 4 to
  // the nearest of ~n/centers cluster-mates), loose enough that they
  // STRADDLE the √n-list quantizer's sub-cluster boundaries — which
  // is what makes recall respond to nProbe instead of saturating at
  // one probe (σ_plant = 0.02 measured flat-at-1.0 from nProbe=1)
  private val SigmaPlant = 0.125

  /** Deterministic planted-cluster corpus: `nCenters` seeded Gaussian
    * centers; ids [0, QueryIds) are the queries, the top QueryIds·K
    * ids are the planted near-neighbors (id → its query derivable by
    * position), everything else is a cluster point (hashed center +
    * σ_noise). Pure function of (n, nCenters, seed) — any executor
    * re-derives any row.
    */
  def planted(spark: SparkSession, n: Long, nCenters: Int,
      seed: Long): DataFrame = {
    val nQ = graft.sim.Pq.QueryIds
    val kPlant = graft.sim.Pq.K
    val firstPlant = n - nQ.toLong * kPlant
    require(firstPlant > 32,
      s"planted corpus needs n > ${32 + nQ * kPlant}, got $n")
    // everything the udf closure touches is a LOCAL (the enclosing
    // object is not serializable and must not be captured)
    val (dim, sNoise, sPlant, nC, s) =
      (Dim, SigmaNoise, SigmaPlant, nCenters, seed)
    def rng(x: Long) = new java.util.Random(x * 0x9E3779B97F4A7C15L + s)
    val centers: Array[Array[Double]] = Array.tabulate(nC) { c =>
      val r = rng(0x5EEDC0DEL + c)
      Array.fill(dim)(r.nextGaussian())
    }
    val gen = udf((id: Long) => {
      def mk(x: Long) =
        new java.util.Random(x * 0x9E3779B97F4A7C15L + s)
      def baseVec(i: Long): Array[Double] = {
        val c = centers(java.lang.Math
          .floorMod(i * 2654435761L, nC.toLong).toInt)
        val r = mk(i)
        Array.tabulate(dim)(j => c(j) + sNoise * r.nextGaussian())
      }
      val v: Array[Double] =
        if (id >= firstPlant) {
          val q = (id - firstPlant) / kPlant
          val b = baseVec(q) // the query's own vector, re-derived
          val r = mk(id)
          Array.tabulate(dim)(j => b(j) + sPlant * r.nextGaussian())
        } else baseVec(id)
      v.map(_.toFloat)
    })
    spark.range(n)
      .select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("480000,1920000")
      .split(",").map(_.trim.toLong)
    val nCenters = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = graft.Engine.session("graft-stress-ivfpq")
    spark.sparkContext.setLogLevel("WARN")

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
    for (n <- ns) {
      val corpus = planted(spark, n, nCenters, seed = 18L)
        .localCheckpoint(true)
      require(corpus.count() == n)
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_stress_ivfpq_$n").toString
      val t0 = System.nanoTime()
      graft.sim.Pq.saveIvfPq(corpus, d)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val queries = corpus.filter(col("vec_id") < graft.sim.Pq.QueryIds)
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
        .createTempDirectory(s"graft_stress_ivfpq_trained_$n").toString
      val tT0 = System.nanoTime()
      graft.sim.PqTrained.save(corpus, dT)
      val tBuildTrained = (System.nanoTime() - tT0) / 1e9
      val nListsTrained = graft.sim.Ivf.numLists(n)
      val (tServeTrained, _) = timed {
        graft.sim.PqTrained.servedKnn(spark, dT, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds).count()
      }
      // exact ground truth once (its timing IS the honest brute
      // competitor); with the planted fixture it should BE the
      // planted set — reported as a fixture sanity check
      val tB0 = System.nanoTime()
      val exactTop = {
        val c = corpus.filter(col("vec_id") >= graft.sim.Pq.QueryIds)
          .select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ec"))
        val scored = c.crossJoin(broadcast(queries))
          .withColumn("dsq", expr(
            """aggregate(zip_with(eq, ec, (x, y) ->
              |  (cast(x as double) - cast(y as double)) *
              |  (cast(x as double) - cast(y as double))),
              |  cast(0 as double), (a, v) -> a + v)""".stripMargin))
          .withColumn("sim", -col("dsq"))
        graft.plans.AggExpressions
          .topKPerKey(scored, "query_id", "sim", "neighbor_id", Nil,
            graft.sim.Pq.K)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val tBrute = (System.nanoTime() - tB0) / 1e9
      val firstPlant =
        n - graft.sim.Pq.QueryIds.toLong * graft.sim.Pq.K
      val plantedFrac = exactTop.count(_._2 >= firstPlant).toDouble /
        math.max(1, exactTop.size)
      val recallSweep = Seq(1, 2, 4, 8, 16, 32).map { p =>
        def rec(df: org.apache.spark.sql.DataFrame): Double = {
          val got = df.select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          got.count(exactTop.contains).toDouble /
            math.max(1, exactTop.size)
        }
        val adc = rec(graft.sim.PqTrained.knn(corpus, Some(p)))
        val rr = rec(graft.sim.PqTrained.knnRerank(corpus, Some(p)))
        s""""$p":{"adc":${f"$adc%.4f"},"rerank":${f"$rr%.4f"}}"""
      }.mkString("{", ",", "}")
      // pruning bound: directories the served scan listed vs total
      val totalLists = new java.io.File(s"$d/codes").listFiles()
        .count(_.getName.startsWith("list_id="))
      val probed = graft.sim.Pq.servedIvfPqKnn(spark, d, queries,
          col("vec_id") >= graft.sim.Pq.QueryIds)
        .select("list_id").distinct().count()
      val line =
        s"""{"fixture":"planted_clusters","n_centers":$nCenters,
           |"sigma_noise":$SigmaNoise,"sigma_plant":$SigmaPlant,
           |"n_vectors":$n,"planted_in_exact_top":$plantedFrac,
           |"sec_build":$tBuild,
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
      java.nio.file.Path.of("STRESSIVFPQ_r18.json"),
      out.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
