package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  test("corpus_sample: deterministic, exhaustive, roughly 80/10/10") {
    val rows = Corpus.corpusSample(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n) // every doc assigned exactly once
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // stability: re-running yields identical assignments
    val again = Corpus.corpusSample(spark, sf).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("corpus_clean: verdict columns compose into keep") {
    val rows = Corpus.corpusClean(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n) // one verdict per doc
    rows.foreach { r =>
      val expected = r.getAs[Boolean]("keep_quality") &&
        r.getAs[Boolean]("keep_exact") && r.getAs[Boolean]("keep_neardup")
      assert(r.getAs[Boolean]("keep") == expected)
    }
    // the corpus has no exact dups, so every doc is its own keeper
    assert(rows.forall(_.getAs[Boolean]("keep_exact")))
    // quality gate actually discriminates on this corpus
    assert(rows.exists(!_.getAs[Boolean]("keep_quality")))
    assert(rows.exists(_.getAs[Boolean]("keep_quality")))
    // near-dup losers are exactly the non-representative cluster members
    val ccLosers = graft.dedup.Clusters.dedupClusters(spark, sf).collect()
      .filter(!_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val ndLosers = rows.filter(!_.getAs[Boolean]("keep_neardup"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ndLosers == ccLosers)
  }

  test("corpus_pack: within-shard cumulative offsets and budget cuts") {
    val rows = Corpus.corpusPack(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n)
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("tok_start") == cum)
        assert(r.getAs[Long]("seq_id") == cum / Corpus.PackBudget)
        cum += r.getAs[Int]("n_tokens")
      }
    }
    // packing actually cuts whenever some shard exceeds one budget
    val maxShardTokens = rows.groupBy(_.getAs[Long]("bucket"))
      .values.map(_.map(_.getAs[Int]("n_tokens").toLong).sum).max
    if (maxShardTokens > Corpus.PackBudget)
      assert(rows.exists(_.getAs[Long]("seq_id") > 0))
  }

  test("decontaminate: flags exactly the train docs sharing an eval 5-gram") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"smp|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 1000
    }
    def grams(t: String): Set[String] = {
      val ws = t.toLowerCase.split(" ", -1)
      if (ws.length < Corpus.DecontamN) Set.empty
      else ws.sliding(Corpus.DecontamN).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.collect {
      case (id, t) if bucket(id) >= 900 => grams(t)
    }.foldLeft(Set.empty[String])(_ ++ _)
    val expected = docs.collect {
      case (id, t) if bucket(id) < 800 && grams(t).intersect(evalGrams).nonEmpty =>
        id -> grams(t).intersect(evalGrams).size
    }.toMap
    val rows = Corpus.decontaminate(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") == expected(r.getAs[Long]("doc_id")))
      assert(r.getAs[Double]("contam_ratio") > 0.0 &&
        r.getAs[Double]("contam_ratio") <= 1.0)
    }
    assert(rows.nonEmpty) // the corpus actually has cross-split overlap
  }

  test("corpus_shuffle: a deterministic permutation, contiguous per shard") {
    val rows = Corpus.corpusShuffle(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n) // every doc placed exactly once
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      assert(docs.map(_.getAs[Int]("pos")).sorted.toList ==
        (1 to docs.length).toList)
    }
    // deterministic: identical on re-run
    val again = Corpus.corpusShuffle(spark, sf).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
    // it actually permutes: doc_id order differs from shuffle order
    val inOrder = rows.sortBy(r => (r.getAs[Long]("shard"), r.getAs[Int]("pos")))
      .map(_.getAs[Long]("doc_id"))
    assert(inOrder.toList != inOrder.sorted.toList)
  }

  test("stratified_sample: en downsampled to its bucket rate, rest kept") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Corpus.stratifiedSample(spark, sf).collect()
    val keptByLang = kept.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    byLang.foreach { case (lang, total) =>
      if (lang == "en") {
        assert(keptByLang("en") < total) // actually downsampled
        kept.filter(_.getAs[String]("lang") == "en")
          .foreach(r => assert(r.getAs[Long]("bucket") < 250))
      } else assert(keptByLang(lang).toLong == total) // others untouched
    }
  }

  test("domain_mix: per-shard prefix cut at the exact token budget") {
    val rows = Corpus.domainMix(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == docs) // verdict row per doc, none dropped
    // budget = floor(source_tokens * weight / shards), same for all
    // rows of a source; keep == cum_before < budget everywhere
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, grp) =>
      val tot = grp.map(_.getAs[Long]("n_tokens")).sum
      val w = if (Corpus.MixDownweighted.contains(src)) 0.2 else 0.8
      val budget = math.floor(tot.toDouble * w / Corpus.MixShards).toLong
      assert(grp.map(_.getAs[Long]("budget")).toSet == Set(budget))
      grp.foreach { r =>
        assert(r.getAs[Boolean]("keep") ==
          (r.getAs[Long]("cum_before") < r.getAs[Long]("budget")))
      }
      // within each shard, cum_before values form a prefix-sum chain:
      // sorted ascending, each equals the sum of all earlier n_tokens
      grp.groupBy(_.getAs[Long]("shard")).values.foreach { sh =>
        val ordered = sh.sortBy(_.getAs[Long]("cum_before"))
        var run = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("cum_before") == run)
          run += r.getAs[Long]("n_tokens")
        }
      }
      // kept token share lands near the weight (within one doc per shard)
      val keptTok = grp.filter(_.getAs[Boolean]("keep"))
        .map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = grp.map(_.getAs[Long]("n_tokens")).max
      assert(keptTok <= budget * Corpus.MixShards +
        maxDoc * Corpus.MixShards)
    }
    // deterministic: identical on re-run
    val again = Corpus.domainMix(spark, sf).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("corpus_stats cells reconcile with the corpus and L1 split") {
    val rows = Corpus.corpusStats(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(Set("train", "val", "test")(r.getAs[String]("split")))
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_bytes") > 0)
    }
    // split totals agree with corpus_sample's assignment
    val sampleSplits = Corpus.corpusSample(spark, sf).collect()
      .groupBy(_.getAs[String]("split")).view.mapValues(_.length.toLong).toMap
    val statSplits = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(statSplits == sampleSplits)
  }

  test("corpus_loss_report is a monotone funnel consistent with the verdicts") {
    val stages = Corpus.corpusLossReport(spark, sf).collect()
      .sortBy(_.getAs[Int]("stage_id"))
    assert(stages.map(_.getAs[String]("stage")).toSeq ==
      Seq("ingest", "quality_gate", "exact_dedup", "near_dedup"))
    val surv = stages.map(_.getAs[Long]("n_surviving"))
    assert(surv.sameElements(surv.sorted.reverse), "survivors must shrink")
    // each stage's drop count reconciles with the previous stage
    stages.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Long]("n_dropped") ==
          prev.getAs[Long]("n_surviving") - cur.getAs[Long]("n_surviving"))
      case _ => ()
    }
    // endpoint agreement with the verdict frame itself
    val v = Corpus.corpusClean(spark, sf).collect()
    assert(surv.head == v.length.toLong)
    assert(surv.last == v.count(_.getAs[Boolean]("keep")).toLong)
  }

  test("dsir steers the sample toward target-domain vocabulary") {
    import spark.implicits._
    // target docs (src0) speak vocab A; the general pool splits into
    // A-speakers and B-speakers. Importance log-weights must separate
    // them, and the Gumbel-top-k draw must overwhelmingly pick
    // A-speakers when k covers half the pool.
    val a = "alpha beta gamma delta epsilon"
    val b = "zebra yak xylo walrus vulture"
    val docs = (
      (0L until 20L).map(i => (i, "src0", a)) ++
      (20L until 60L).map(i => (i, "srcA", a)) ++
      (60L until 100L).map(i => (i, "srcB", b))
    ).toDF("doc_id", "source", "text")
    val full = Corpus.dsir(docs, Seq("src0"), 100).collect()
    val byDoc = full.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    val aW = (20L until 60L).map(byDoc)
    val bW = (60L until 100L).map(byDoc)
    assert(aW.min > bW.max,
      "every A-speaker must outweigh every B-speaker")
    // a half-pool draw: A-speakers selected ahead of B-speakers
    val drawn = Corpus.dsir(docs, Seq("src0"), 50).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val aDrawn = drawn.count(_ < 60L)
    assert(aDrawn >= 45, s"expected the draw dominated by A, got $aDrawn")
  }

  test("dsir_sample shape and repartition determinism") {
    val rows = Corpus.dsirSample(spark, sf).collect()
    assert(rows.length == Corpus.DsirK)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to Corpus.DsirK))
    val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    rows.foreach { r => // rendered components reassemble the key
      assert(math.abs(r.getAs[Double]("score") -
        (r.getAs[Double]("logw") + r.getAs[Double]("gumbel"))) < 1e-8)
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
    val again = Corpus.dsir(docs.repartition(7), Corpus.DsirTarget,
      Corpus.DsirK).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("quality_percentile_filter: verdict consistency and sample rank accuracy") {
    import org.apache.spark.sql.functions._
    val rows = Corpus.qualityPercentileFilter(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == n) // every doc gets a verdict, none dropped
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val lens = rs.map(_.getAs[Long]("n_tokens"))
      val (lo, hi) = (rs.head.getAs[Long]("lo"), rs.head.getAs[Long]("hi"))
      assert(rs.forall(r => r.getAs[Long]("lo") == lo
        && r.getAs[Long]("hi") == hi), s"$lang: thresholds not constant")
      assert(lo <= hi)
      // thresholds are actual corpus lengths of this lang (sampled rows)
      assert(lens.contains(lo) && lens.contains(hi))
      rs.foreach { r =>
        val t = r.getAs[Long]("n_tokens")
        assert(r.getAs[Boolean]("kept") == (t >= lo && t <= hi))
      }
      // rank accuracy of the sampled p10: 4 sigma of sqrt(q(1-q)/K)
      val frac = lens.count(_ < lo).toDouble / lens.length
      val tol = 4.0 * math.sqrt(0.1 * 0.9 / Corpus.QpfK) + 0.02
      assert(frac <= 0.1 + tol, s"$lang: p10 rank fraction $frac")
    }
    // below-K lang is textbook-exact: 20 docs -> lo = 2nd shortest,
    // hi = ceil(99*20/100) = 20th = max
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qpf_tiny").toString
    (1 to 20).map(i => (i.toLong, ("w " * i).trim, "xx", "s", i.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tiny = Corpus.qualityPercentileFilter(spark, dir).collect()
    assert(tiny.length == 20)
    assert(tiny.head.getAs[Long]("lo") == 2L)
    assert(tiny.head.getAs[Long]("hi") == 20L)
    assert(tiny.count(_.getAs[Boolean]("kept")) == 19) // only len-1 trimmed
  }

  test("mixture_reweight: downsample-only plan improves balance") {
    val rows = Corpus.mixtureReweight(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Long]("tok_total")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total)
    assert(rows.map(_.getAs[Long]("keep_tokens")).sum ==
      rows.head.getAs[Long]("keep_total"))
    val target = 1000000L / rows.length
    rows.foreach { r =>
      assert(r.getAs[Long]("target_ppm") == target)
      val mult = r.getAs[Double]("mult")
      assert(mult > 0.0 && mult <= 1.0, "downsample-only")
      assert(r.getAs[Long]("keep_tokens") <= r.getAs[Long]("n_tokens"))
      // a lang at or under target keeps everything
      if (r.getAs[Long]("obs_ppm") <= target)
        assert(mult == 1.0 &&
          r.getAs[Long]("keep_tokens") == r.getAs[Long]("n_tokens"))
    }
    // the dominant language is cut hardest, and the plan's post-
    // reweight share spread is no worse than the observed one
    val byObs = rows.sortBy(_.getAs[Long]("obs_ppm"))
    assert(byObs.last.getAs[Double]("mult") ==
      rows.map(_.getAs[Double]("mult")).min)
    assert(byObs.last.getAs[Long]("exp_ppm") <=
      byObs.last.getAs[Long]("obs_ppm"))
    val expSpread = rows.map(_.getAs[Long]("exp_ppm")).max -
      rows.map(_.getAs[Long]("exp_ppm")).min
    val obsSpread = rows.map(_.getAs[Long]("obs_ppm")).max -
      rows.map(_.getAs[Long]("obs_ppm")).min
    assert(expSpread <= obsSpread)
  }

  test("mixture_apply: the executed sample obeys the plan's multipliers") {
    val plan = Corpus.mixtureReweight(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val rows = Corpus.mixtureApply(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == plan.size)
    val keptTotal = rows.head.getAs[Long]("kept_total")
    assert(rows.map(_.getAs[Long]("tokens_kept")).sum == keptTotal)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val p = plan(lang)
      // downsample-only: never more docs than the corpus has
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_kept") <= p.getAs[Long]("n_tokens"))
      // a lang at or under target keeps every document (mult 1e6 —
      // every coin < 1e6 by construction)
      if (p.getAs[Long]("obs_ppm") <= p.getAs[Long]("target_ppm")) {
        assert(r.getAs[Long]("mult_ppm") == 1000000L)
        assert(r.getAs[Long]("n_docs_kept") == r.getAs[Long]("n_docs"))
        assert(r.getAs[Long]("tokens_kept") == p.getAs[Long]("n_tokens"))
      }
      // the integer multiplier is the plan's double ratio in ppm
      // (floor semantics on both)
      assert(math.abs(r.getAs[Long]("mult_ppm") -
        math.floor(p.getAs[Double]("mult") * 1e6)) <= 1.0)
    }
    // per-document fate is the coin, re-derived independently: replay
    // one language's kept count from doc ids
    import org.apache.spark.sql.functions._
    val l = rows.minBy(_.getAs[Long]("mult_ppm")).getAs[String]("lang")
    val mult = rows.find(_.getAs[String]("lang") == l).get
      .getAs[Long]("mult_ppm")
    val replay = graft.sources.Tables.documents(spark, sf)
      .filter(col("lang") === l)
      .withColumn("coin", expr(
        """cast(conv(substring(md5(concat('mix|', cast(doc_id as string))),
          |  1, 8), 16, 10) as bigint) % 1000000""".stripMargin))
      .filter(col("coin") < mult).count()
    assert(replay ==
      rows.find(_.getAs[String]("lang") == l).get.getAs[Long]("n_docs_kept"))
  }
}
