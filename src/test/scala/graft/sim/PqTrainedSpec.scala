package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqTrainedSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("geometry: codeword count and probe cap follow the scale rules") {
    assert(PqTrained.codewords(500) == 16)
    assert(PqTrained.codewords(64 * 256) == 256)
    assert(PqTrained.codewords(2000000) == 256)
    assert(PqTrained.probeCount(16) == 4)
    assert(PqTrained.probeCount(128) == 32)
    // the cap is the sublinearity: fraction shrinks as lists grow
    assert(PqTrained.probeCount(1400) == 32)
  }

  test("trained knn returns k rows per query from <= nProbe lists") {
    val rows = PqTrained.knn(emb).collect()
    assert(rows.length == Pq.QueryIds * Pq.K)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until Pq.QueryIds.toLong).toSet)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to Pq.K))
      // results come from the probed lists only
      assert(rs.map(_.getAs[Long]("list_id")).distinct.length <=
        PqTrained.probeCount(1000))
      // adist ascending with rank
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("adist"))
      assert(sorted.sameElements(sorted.sorted))
    }
  }

  test("recall floor: the trained index finds true neighbors " +
      "(deterministic — seeded fits over an md5 sample)") {
    val atDefault = PqTrained.meanRecall(emb)
    val atAll = PqTrained.meanRecall(emb, Some(10000))
    info(s"meanRecall default=$atDefault allLists=$atAll")
    // Floors pinned from the measured deterministic values with slack.
    // Context: the test corpus is RANDOM 64-dim floats — the
    // adversarial case for PQ (no subspace structure to quantize), so
    // absolute recall is low by nature; a broken encode/probe would
    // sit at ~K/n ≈ 0.006, an order of magnitude below the floor.
    assert(atDefault >= 0.1,
      s"recall@${Pq.K} at default probes = $atDefault")
    assert(atAll >= atDefault,
      s"probe-sweep regression: allLists=$atAll < default=$atDefault " +
        "(empirical pin on this corpus — superset candidates are not " +
        "a recall guarantee in general)")
    // training the codebook must beat the pinned given-quantizer twin
    // on the same corpus (its measured mean is 1/15 here)
    val givenMean = Pq.ivfPqRecall(emb)
      .agg(avg("recall")).collect()(0).getDouble(0)
    info(s"given-twin meanRecall=$givenMean")
    assert(atDefault >= givenMean,
      s"trained recall $atDefault fell below the given twin $givenMean")
  }

  test("recall floor on a PLANTED-cluster corpus: routing finds the " +
      "planted true neighbors (the r17 verdict's quality-at-scale pin)") {
    // Gaussian clusters + K planted near-neighbors per query (the
    // STRESSIVFPQ_r18 fixture, small): exact ground truth IS the
    // planted set, found only if probe routing reaches the query's
    // cluster lists — unlike the random-floats corpus above, recall
    // here is structural, not noise-bound, so a probe-routing or
    // encode regression collapses it. Deterministic (seeded fixture,
    // seeded fits over an md5 sample).
    val planted = graft.tools.StressIvfPq
      .planted(spark, 20000L, 32, seed = 18L)
      .localCheckpoint(true)
    val atOne = PqTrained.meanRecall(planted, Some(1))
    val atDefault = PqTrained.meanRecall(planted)
    info(s"planted meanRecall probe1=$atOne default=$atDefault")
    assert(atDefault >= 0.8,
      s"ADC recall@${Pq.K} at default probes = $atDefault on the " +
        "planted corpus — structure the index must recover")
    assert(atDefault >= atOne,
      s"more probes lost recall: default=$atDefault < probe1=$atOne")
    // the two-stage serve (ADC proposes, exact disposes) must be
    // essentially perfect here: planted neighbors are unambiguous
    val exact = {
      val q = planted.filter(col("vec_id") < Pq.QueryIds)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("eq"))
      val c = planted.filter(col("vec_id") >= Pq.QueryIds)
        .select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("ec"))
      graft.plans.AggExpressions.topKPerKey(
          c.crossJoin(broadcast(q)).withColumn("sim",
            -aggregate(zip_with(col("eq"), col("ec"),
              (x, y) => (x - y) * (x - y)), lit(0.0d), (a, v) => a + v)),
          "query_id", "sim", "neighbor_id", Nil, Pq.K)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val rr = PqTrained.knnRerank(planted)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rerankRecall = rr.count(exact.contains).toDouble /
      math.max(1, exact.size)
    info(s"planted rerank recall=$rerankRecall")
    assert(rerankRecall >= 0.9,
      s"rerank recall@${Pq.K} = $rerankRecall on the planted corpus")
  }

  test("probeForRecall finds the knee of the measured curve on the " +
      "planted corpus (deterministic)") {
    val planted = graft.tools.StressIvfPq
      .planted(spark, 20000L, 32, seed = 18L)
      .localCheckpoint(true)
    val (knee, curve) = PqTrained.probeForRecall(planted, 0.8,
      candidates = Seq(1, 2, 4, 8))
    info(s"curve=$curve knee=$knee")
    // the curve must RESPOND to probes on structured data (the r17
    // fixture was flat — noise-bound); the knee sits at or below 8
    assert(curve.last._2 >= 0.8, s"curve never reached 0.8: $curve")
    assert(knee <= 8)
    assert(PqTrained.meanRecall(planted, Some(knee)) >= 0.8)
    // monotone up to measurement ties: later probes never LOSE recall
    curve.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a - 1e-9, s"recall fell along the curve: $curve")
    }
  }

  test("the nprobe session config widens/narrows the probe set " +
      "(explicit argument still wins)") {
    val planted = graft.tools.StressIvfPq
      .planted(spark, 20000L, 32, seed = 18L)
      .localCheckpoint(true)
    def listsPerQuery(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "list_id").distinct().collect()
        .groupBy(_.getLong(0)).values.map(_.length).max
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val explicit1 = rows(PqTrained.knn(planted, Some(1)))
    val explicit6 = rows(PqTrained.knn(planted, Some(6)))
    try {
      // the conf is exactly the explicit argument, session-wide
      spark.conf.set(PqTrained.NProbeConfKey, "1")
      assert(rows(PqTrained.knn(planted)) == explicit1,
        "conf nprobe=1 != explicit nProbe=1")
      assert(listsPerQuery(PqTrained.knn(planted)) <= 1)
      // an explicit argument overrides the session conf
      assert(rows(PqTrained.knn(planted, Some(6))) == explicit6)
      spark.conf.set(PqTrained.NProbeConfKey, "0")
      intercept[IllegalArgumentException] {
        PqTrained.knn(planted).collect()
      }
    } finally spark.conf.unset(PqTrained.NProbeConfKey)
    // default restored: the probe cap applies again
    val lists = Ivf.numLists(20000L)
    assert(listsPerQuery(PqTrained.knn(planted)) <=
      PqTrained.probeCount(lists))
  }

  test("served knn from the saved artifact is bit-equal to in-session") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained").toString
    PqTrained.save(emb, dir)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val served = PqTrained
      .servedKnn(spark, dir, queries, col("vec_id") >= Pq.QueryIds)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val fresh = PqTrained.knn(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(served.sorted.sameElements(fresh.sorted))
  }

  test("served two-stage rerank from the saved artifact is bit-equal " +
      "to the in-session knnRerank") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_rr").toString
    PqTrained.save(emb, dir)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val served = PqTrained
      .servedKnnRerank(spark, dir, queries, emb,
        col("vec_id") >= Pq.QueryIds)
      .collect().map(_.toSeq)
    val fresh = PqTrained.knnRerank(emb).collect().map(_.toSeq)
    assert(served.sameElements(fresh))
  }

  test("the served trained scan is partition-pruned to the probed lists") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_prune").toString
    PqTrained.save(emb, dir)
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    val plan = PqTrained
      .servedKnn(spark, dir, queries, col("vec_id") >= Pq.QueryIds)
      .queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*list_id[^\\]]*IN".r
      .findFirstIn(plan)
    assert(pruned.isDefined, s"no partition IN-filter on list_id in:\n$plan")
  }

  test("G34 appendTrained: pinned-model append equals encoding the " +
      "union with the same model; re-delivered batch is a no-op") {
    import spark.implicits._
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_app").toString
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    PqTrained.save(half1, dirA)
    PqTrained.appendTrained(half2, dirA)
    // model-copied rebuild: same quantizer + codebook, the whole
    // union arriving through the SAME append path — for a pinned
    // model, codes must be bit-identical regardless of arrival order
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_app_b").toString
    for (sub <- Seq("centroids", "pq")) {
      val src = new java.io.File(s"$dirA/$sub")
      val dst = new java.io.File(s"$dirB/$sub")
      dst.mkdirs()
      src.listFiles().foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath)
      }
    }
    PqTrained.appendTrained(half2.unionByName(half1), dirB)
    val schema = "vec_id BIGINT, " +
      (0 until Pq.NumSub).map(m => s"code_$m BIGINT").mkString(", ") +
      ", list_id BIGINT"
    def codes(d: String) = spark.read.schema(schema)
      .parquet(s"$d/codes").collect().map(_.toSeq).sortBy(_.head.toString)
    // the build-path half (dirA's half1, assigned by the quantizer
    // fit's own transform) and the append-path half agree with the
    // all-append dirB on every (assignment, code) — the pinned-model
    // identity, and the assignment-metric parity between MLlib's
    // transform and the append argmin
    assert(codes(dirA).sameElements(codes(dirB)))
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    def served(d: String) = PqTrained
      .servedKnn(spark, d, queries, col("vec_id") >= Pq.QueryIds)
      .collect().map(_.toSeq)
    assert(served(dirA).sameElements(served(dirB)))
    // at-least-once re-delivery: a committed batch id appends nothing
    val n0 = spark.read.schema(schema).parquet(s"$dirA/codes").count()
    PqTrained.appendTrainedOnce(half2, dirA, 7L)
    PqTrained.appendTrainedOnce(half2, dirA, 7L)
    assert(spark.read.schema(schema).parquet(s"$dirA/codes").count()
      == n0 + half2.count())
    PqTrained.appendTrainedOnce(half2, dirA, 7L)
    assert(spark.read.schema(schema).parquet(s"$dirA/codes").count()
      == n0 + half2.count())
  }

  test("G35/G36 deleteTrained removes exactly the requested ids from " +
      "touched lists only; compactTrained is serve-invariant") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_del").toString
    PqTrained.save(emb, dir)
    val schema = "vec_id BIGINT, " +
      (0 until Pq.NumSub).map(m => s"code_$m BIGINT").mkString(", ") +
      ", list_id BIGINT"
    def codes = spark.read.schema(schema).parquet(s"$dir/codes")
    val n = emb.count()
    val delIds = Seq(n / 2, n / 2 + 1, n / 2 + 2).map(_.toLong)
    val touched = codes.filter(col("vec_id").isin(delIds: _*))
      .select("list_id").distinct().collect().map(_.getLong(0)).toSet
    assert(touched.nonEmpty)
    def stamps: Map[String, Long] = {
      val root = new java.io.File(s"$dir/codes")
      root.listFiles().filter(_.getName.startsWith("list_id="))
        .map(p => p.getName -> p.lastModified()).toMap
    }
    val before = codes.collect().map(_.toSeq).toSet
    val stampsBefore = stamps
    PqTrained.deleteTrained(spark, dir, delIds.toDF("vec_id"))
    // content = before minus exactly the deleted rows, bit-equal
    val after = codes.collect().map(_.toSeq).toSet
    assert(after == before.filterNot(r => delIds.contains(
      r.head.asInstanceOf[Long])))
    // untouched list directories were never rewritten
    for ((dirName, t0) <- stampsBefore
        if !touched.contains(dirName.stripPrefix("list_id=").toLong))
      assert(stamps(dirName) == t0, s"untouched $dirName rewritten")
    val queries = emb.filter(col("vec_id") < Pq.QueryIds)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"))
    def served = PqTrained
      .servedKnn(spark, dir, queries, col("vec_id") >= Pq.QueryIds)
      .collect().map(_.toSeq).toSeq
    val servedAfterDelete = served
    assert(!servedAfterDelete.exists(r =>
      delIds.contains(r(2).asInstanceOf[Long])))
    PqTrained.compactTrained(spark, dir)
    assert(codes.collect().map(_.toSeq).toSet == after)
    assert(served == servedAfterDelete)
    val partFiles = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(d =>
        d.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(partFiles == 1, "compaction left multiple files in a list")
  }

  test("J24 trained ingest stream: vector micro-batches append " +
      "idempotently into the saved trained index") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = emb.filter(col("vec_id") < 400)
    val d = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_ingest").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_ingest_ck").toString
    PqTrained.save(all.filter(col("vec_id") < 200), d)
    val b1 = all.filter(col("vec_id") >= 200 && col("vec_id") < 300)
      .as[(Long, Array[Float])].collect().toSeq
    val b2 = all.filter(col("vec_id") >= 300)
      .as[(Long, Array[Float])].collect().toSeq
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.Streaming.ivfPqTrainedIngestStream(
        src.toDF().toDF("vec_id", "embedding"), d)
      .option("checkpointLocation", ckpt).start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val schema = "vec_id BIGINT, " +
      (0 until Pq.NumSub).map(m => s"code_$m BIGINT").mkString(", ") +
      ", list_id BIGINT"
    def nCodes = spark.read.schema(schema).parquet(s"$d/codes").count()
    assert(nCodes == 400)
    // at-least-once re-delivery: a committed batch id is a no-op
    PqTrained.appendTrainedOnce(b1.toDF("vec_id", "embedding"), d, 0L)
    assert(nCodes == 400, "re-delivered batch duplicated vectors")
  }

  test("trained maintenance edges: an empty append batch and an " +
      "absent-id delete leave the index untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqtrained_edge").toString
    PqTrained.save(emb.filter(col("vec_id") < 300), dir)
    val schema = "vec_id BIGINT, " +
      (0 until Pq.NumSub).map(m => s"code_$m BIGINT").mkString(", ") +
      ", list_id BIGINT"
    def codes = spark.read.schema(schema).parquet(s"$dir/codes")
      .collect().map(_.toSeq).toSet
    val before = codes
    PqTrained.appendTrained(emb.filter(lit(false)), dir)
    PqTrained.deleteTrained(spark, dir,
      Seq(99999999L).toDF("vec_id"))
    assert(codes == before)
  }

  test("empty corpus serves an empty result, not an MLlib failure") {
    val empty = emb.filter(lit(false))
    val out = PqTrained.knn(empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "adist", "list_id"))
  }
}
