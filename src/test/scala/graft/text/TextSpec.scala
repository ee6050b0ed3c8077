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
}
