package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Non-ASCII robustness census: the text/dedup stack must flow CJK
  * (no whitespace at all), emoji with surrogate pairs and skin-tone
  * modifiers, combining diacritics, RTL Arabic, Cyrillic, zero-width
  * characters and math symbols without crashing, without dropping
  * rows, and deterministically. A 100 TB web corpus is mostly NOT
  * clean English; every prior census (EdgeCaseSpec, EmptyInputSpec)
  * exercised degenerate *sizes* but only ASCII *content*. Invariants
  * asserted here are content-independent by design (row preservation,
  * ratio ranges, exact-duplicate detection, redaction locality) — no
  * claim is made about linguistic quality of the heuristics on these
  * scripts, only that the operators remain total and deterministic.
  */
class UnicodeTextSpec extends SparkSpec {

  private val cjk = "机器学习模型需要大量高质量的训练数据来学习语言的统计规律"
  private val emoji = "training data 🚀🔥 quality 👍🏽 matters 💯"
  private val accents = "café naïve résumé déjà vu et café combining"
  private val arabic = "البيانات الجيدة تصنع نماذج جيدة"
  private val cyrillic = "качественные данные важны для обучения моделей машинного обучения"
  private val zeroWidth = "hello​world with‍ zero width characters inside tokens"
  private val symbols = "σ² = Σ(x−μ)²/n ∀x ∈ ℝ statistics notation"

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, cjk), (2L, emoji), (3L, accents), (4L, arabic),
      (5L, cyrillic), (6L, zeroWidth), (7L, symbols),
      (8L, cjk) // exact duplicate of doc 1 — dedup must find it
    ).toDF("doc_id", "text")
  }

  test("quality ratios stay in [0,1] (or null) on every script") {
    val rows = Analysis.quality(corpus, "text").collect()
    assert(rows.length == 8)
    for (r <- rows; c <- Seq("stopword_ratio", "punct_ratio", "digit_ratio")) {
      val i = r.fieldIndex(c)
      if (!r.isNullAt(i)) {
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range on doc ${r.getLong(0)}")
      }
    }
  }

  test("token counts: whitespace and BPE-ish counters are total and sane") {
    val rows = Analysis.tokenCounts(corpus, "text")
      .select("doc_id", "ws_tokens", "bpe_ish_tokens").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, s"ws_tokens on doc ${r.getLong(0)}")
      assert(r.getInt(2) >= 1, s"bpe_ish_tokens on doc ${r.getLong(0)}")
    }
    // pure CJK has no spaces: exactly one whitespace token, while the
    // BPE-ish pattern counts each non-latin char as a symbol token
    val c = rows.find(_.getLong(0) == 1L).get
    assert(c.getInt(1) == 1)
    assert(c.getInt(2) == cjk.length)
  }

  test("fingerprints are deterministic and identical for identical unicode texts") {
    val f = Fingerprint.fingerprints(corpus, "doc_id", "text")
    val byDoc = f.groupBy("doc_id")
      .agg(sort_array(collect_list("fingerprint")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // doc 8 is byte-identical to doc 1 → identical winnowed set
    // (guard first: None == None would pass vacuously if a regression
    // made these docs emit no fingerprints at all)
    assert(byDoc.contains(1L) && byDoc(1L).nonEmpty)
    assert(byDoc.get(1L) == byDoc.get(8L))
    // re-computation is bit-stable
    val again = Fingerprint.fingerprints(corpus, "doc_id", "text")
      .groupBy("doc_id").agg(sort_array(collect_list("fingerprint")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byDoc == again)
  }

  test("simhash: identical unicode docs collide exactly; recompute is stable") {
    val sigs = graft.dedup.Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 8)
    assert(sigs(1L) == sigs(8L), "exact CJK duplicate must share the signature")
    val again = graft.dedup.Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == again)
  }

  test("minhash shingles + buckets survive every script and pair the duplicate") {
    val sets = graft.dedup.Dedup.shingleSets(corpus, "doc_id", "text")
    // every doc here is ≥ shingle window in characters
    assert(sets.select("doc_id").distinct().count() == 8)
    val buckets = graft.dedup.Dedup.minhashBuckets(sets)
    // docs 1 and 8 share every shingle → same minhash vector → at
    // least one common (band, bucket) cell
    val shared = buckets.as("a")
      .join(buckets.as("b"),
        expr("a.band = b.band AND a.bucket = b.bucket " +
          "AND a.doc_id = 1 AND b.doc_id = 8"))
    assert(shared.count() >= 1)
  }

  test("ngram trigram rows stay keyed on whitespace tokens across scripts") {
    val g = graft.dedup.Dedup.trigramRows(corpus, "doc_id", "text")
    val ids = g.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    // the pure-CJK docs (1, 8) have one whitespace token → no trigram;
    // all space-delimited docs (≥3 tokens) must contribute
    assert(!ids.contains(1L) && !ids.contains(8L))
    assert(Set(2L, 3L, 4L, 5L, 6L, 7L).subsetOf(ids))
  }

  test("lang-id recovers the label of each script when trained on itself") {
    import spark.implicits._
    val labeled = corpus.filter("doc_id <= 7").withColumn("lang",
      expr("element_at(array('zh','en','fr','ar','ru','en2','el'), cast(doc_id as int))"))
    val prof = LangId.profiles(labeled, "text", "lang")
    val pred = LangId.classify(corpus, prof, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // training docs classify back to their own script's profile —
    // trigram inventories of these scripts are disjoint
    assert(pred(1L) == "zh" && pred(4L) == "ar" && pred(5L) == "ru")
    assert(pred(8L) == "zh") // unseen duplicate follows its script
  }

  test("pii redaction fires inside non-latin context and leaves it intact") {
    import spark.implicits._
    // PhoneRe matches international (+-prefixed) numbers by design
    val docs = Seq(
      (1L, "联系 john.doe@example.com 电话 +86-555-123-4567 谢谢"),
      (2L, "بريد jane@example.org هاتف +966-555-987-6543")
    ).toDF("doc_id", "text")
    val red = Analysis.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("redacted"))).toMap
    assert(!red(1L).contains("john.doe@example.com"))
    assert(!red(1L).contains("+86-555-123-4567"))
    assert(red(1L).contains("联系") && red(1L).contains("谢谢"))
    assert(!red(2L).contains("jane@example.org"))
    assert(red(2L).contains("بريد"))
  }

  test("bpe induction and fertility are total over mixed scripts") {
    val m = Bpe.merges(corpus, "text")
    assert(m.count() >= 0) // may learn few merges; must not throw
    val f = Bpe.fertility(corpus, "doc_id", "text")
    assert(f.select("doc_id").distinct().count() == 8)
  }

  test("lm scoring is total and deterministic over mixed scripts") {
    // single-token docs (pure CJK, no whitespace) have no bigrams and
    // drop out by design; every multi-token doc must score, finitely
    def scores = Lm.score(corpus, "doc_id", "text")
      .select("doc_id", "avg_logp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s1 = scores
    assert(Set(2L, 3L, 4L, 5L, 6L, 7L).subsetOf(s1.keySet))
    assert(s1.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(s1 == scores)
  }
}
