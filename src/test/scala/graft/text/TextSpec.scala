package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {

  test("lang_id classifies every document deterministically") {
    val r1 = TextQueries.langId(spark, sf).collect()
    assert(r1.length == graft.sources.Tables.documents(spark, sf).count())
    assert(r1.forall(_.getAs[Long]("overlap") > 0))
    val r2 = TextQueries.langId(spark, sf).collect()
    assert(r1.map(_.toString).sameElements(r2.map(_.toString)))
  }

  test("text_quality ratios are within [0, 1]") {
    TextQueries.textQuality(spark, sf).collect().foreach { r =>
      Seq("stopword_ratio", "punct_ratio", "digit_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
      assert(r.getAs[Double]("avg_word_len") > 0)
    }
  }

  test("token_count: bpe-ish tokens >= whitespace tokens on word text") {
    TextQueries.tokenCount(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("ws_tokens") >= 1)
      assert(r.getAs[Int]("bpe_ish_tokens") >= r.getAs[Int]("ws_tokens") - 1)
    }
  }

  test("winnowing fingerprints match a reference implementation") {
    import spark.implicits._
    val txt = "the quick brown fox jumps over the lazy dog"
    // reference: rolling base-31 hash over k=8 chars, min of each w=4 window
    val hashes = (0 to txt.length - Fingerprint.K).map { i =>
      txt.substring(i, i + Fingerprint.K).foldLeft(0L)((a, c) => a * 31 + c.toInt)
    }
    val expected = hashes.sliding(Fingerprint.W).map(_.min).toSet
    val got = Fingerprint.fingerprints(
      Seq((1L, txt)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getAs[Long]("fingerprint")).toSet
    assert(got == expected)
  }

  test("repetition profile matches a local recount") {
    val rows = TextQueries.repetitionRatio(spark, sf).limit(50).collect()
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).toLowerCase.split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length)
      assert(r.getAs[Int]("n_tokens") == toks.length)
      assert(r.getAs[Int]("n_distinct") == counts.size)
      assert(r.getAs[Int]("top_count") == counts.values.max)
      assert(r.getAs[Double]("repetition_ratio") ==
        (toks.length - counts.size).toDouble / toks.length)
    }
  }

  test("pii_redact masks emails and phones, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe@corp.example.org thanks"),
      (2L, "call +44-20-7946-0958 now"),
      (3L, "nothing sensitive here at all"),
      (4L, "two mails a@b.io and c.d@e.net plus +1-555-0100"))
      .toDF("doc_id", "text")
    val out = graft.text.Analysis.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Int]("n_emails") == 1)
    assert(out(1).getAs[String]("redacted") == "reach me at <email> thanks")
    assert(out(2).getAs[Int]("n_phones") == 1)
    assert(out(2).getAs[String]("redacted") == "call <phone> now")
    assert(out(3).getAs[String]("redacted") == "nothing sensitive here at all")
    assert(out(4).getAs[Int]("n_emails") == 2)
    assert(out(4).getAs[Int]("n_phones") == 1)
    assert(out(4).getAs[String]("redacted") ==
      "two mails <email> and <email> plus <phone>")
  }

  test("lm_score matches a local bigram-LM re-implementation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"smp|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 1000
    }
    def tokens(t: String): Array[String] = t.toLowerCase.split(" ", -1)
    val train = docs.collect { case (id, t) if bucket(id) < 800 => t }
    val cu = train.flatMap(tokens).groupBy(identity).view.mapValues(_.size)
    val cb = train.flatMap(t => tokens(t).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size)
    val v = cu.size
    def q9(x: Double): Double = // the decimal(18,9) quantization
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.text.TextQueries.lmScore(spark, sf).collect()
    // every doc with >= 2 tokens scored exactly once
    val expectIds = docs.collect {
      case (id, t) if tokens(t).length >= 2 => id
    }.toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expectIds)
    // exact re-computation on a sample of docs (train and non-train)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.toSeq.sortBy(_._1).take(20).foreach { case (id, t) =>
      val tk = tokens(t)
      if (tk.length >= 2) {
        val lps = tk.sliding(2).filter(_.length == 2).map { p =>
          q9(math.log((cb.getOrElse((p(0), p(1)), 0) + 1).toDouble /
            (cu.getOrElse(p(0), 0) + v)))
        }.toSeq
        val r = byId(id)
        assert(r.getAs[Long]("n_bigrams") == lps.length.toLong)
        assert(math.abs(r.getAs[Double]("sum_logp") -
          lps.map(BigDecimal(_)).sum.toDouble) < 1e-9, s"doc $id")
        // lower scores for shuffled-vocab docs than for the corpus mode
        assert(r.getAs[Double]("avg_logp") < 0.0)
      }
    }
  }

  test("token_ids encodes every doc against a locally rebuilt vocab") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def tokens(t: String) = t.toLowerCase.split(" ", -1).toSeq
    // local vocab: top-256 by (count desc, term asc), ids 1..256
    val counts = docs.flatMap(d => tokens(d._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(graft.text.TextQueries.VocabSize)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
    val rows = graft.text.TextQueries.tokenIds(spark, sf).collect()
    assert(rows.length == docs.length)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, t) =>
      val tk = tokens(t)
      val ids = tk.map(w => vocab.getOrElse(w, 0))
      val r = byId(id)
      assert(r.getAs[Long]("n_tokens") == tk.length.toLong)
      assert(r.getAs[Long]("n_oov") == ids.count(_ == 0).toLong)
      assert(r.getAs[String]("ids_csv") == ids.mkString(","), s"doc $id")
    }
  }

  test("fuzzy_match resolves corrupted probes to their source word") {
    import spark.implicits._
    val docs = Seq((1L, "window filter aggregate shuffle xx"))
      .toDF("doc_id", "text")
    val rows = TextQueries.fuzzyMatchOf(docs).collect()
      .map(r => r.getAs[String]("probe") ->
        (r.getAs[String]("matched"), r.getAs[Int]("dist"))).toMap
    // each probe drops the 3rd char; the source word is one insertion
    // away and shares the first char, so it must win with dist 1
    assert(rows == Map(
      "widow" -> ("window", 1), "fiter" -> ("filter", 1),
      "agregate" -> ("aggregate", 1), "shffle" -> ("shuffle", 1)))
  }

  test("bpe_fertility: bounded by word length, 1.0 when merges cover " +
      "the corpus") {
    import spark.implicits._
    val rows = graft.text.TextQueries.bpeFertility(spark, sf).collect()
    assert(rows.length ==
      graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_words"))
      assert(f == r.getAs[Long]("n_subwords").toDouble
        / r.getAs[Long]("n_words"))
    }
    // a corpus dominated by one 2-char word: merge 1 learns that
    // pair, so the dominating word becomes ONE symbol and a doc made
    // only of it has fertility exactly 1.0
    val docs = Seq((1L, "ab ab ab ab"), (2L, "ab cd"), (3L, "ab"))
      .toDF("doc_id", "text")
    val fert = graft.text.Bpe.fertility(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id")
        -> r.getAs[Double]("fertility")).toMap
    assert(fert(1L) == 1.0 && fert(3L) == 1.0)
    assert(fert(2L) >= 1.0)
  }
}
