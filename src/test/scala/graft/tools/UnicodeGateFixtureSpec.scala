package graft.tools

import graft.SparkSpec

/** Pins the unicode-gate fixture contract (`scripts/unicode_gate.py`
  * trusts it): ids continue after the base corpus, member 6 is a
  * byte-exact duplicate of member 0 (dedup_exact must fire), member 7
  * is the bare class text, members 0-5 are distinct near-dups sharing
  * the class prefix, and the content classes cover the
  * UnicodeTextSpec script families (CJK / surrogate pairs / combining
  * marks / RTL / zero-width).
  */
class UnicodeGateFixtureSpec extends SparkSpec {

  test("memberText: exact-dup and near-dup structure per class") {
    for (c <- UnicodeGate.ContentClasses.indices) {
      val texts = (0 until UnicodeGate.MembersPerClass)
        .map(UnicodeGate.memberText(c, _))
      assert(texts(6) == texts(0), s"class $c member 6 must repeat member 0")
      assert(texts(7) == UnicodeGate.ContentClasses(c)._2)
      // members 0-5 distinct, all extending the class prefix
      assert(texts.take(6).distinct.size == 6)
      assert(texts.take(6).forall(_.startsWith(texts(7))))
    }
  }

  test("content classes cover the non-ASCII script families") {
    val all = UnicodeGate.ContentClasses.map(_._2).mkString(" ")
    assert(all.exists(ch => Character.UnicodeScript.of(ch) ==
      Character.UnicodeScript.HAN), "CJK")
    assert(all.exists(Character.isHighSurrogate), "surrogate-pair emoji")
    assert(all.contains('​') && all.contains('‍'), "zero-width")
    assert(all.exists(ch => Character.UnicodeScript.of(ch) ==
      Character.UnicodeScript.ARABIC), "RTL Arabic")
    assert(all.exists(ch => Character.UnicodeScript.of(ch) ==
      Character.UnicodeScript.CYRILLIC), "Cyrillic")
  }

  test("writeFixture appends the slab after the base corpus's max id") {
    import spark.implicits._
    val src = "/tmp/graft_unigate_spec_src"
    val out = "/tmp/graft_unigate_spec_out"
    Seq((0L, "alpha beta", "en", "src0", 10L), (7L, "gamma", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    UnicodeGate.writeFixture(spark, src, out)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val slabRows = UnicodeGate.ContentClasses.size * UnicodeGate.MembersPerClass
    assert(docs.count() == 2 + slabRows)
    val slab = docs.filter("source = 'uni'")
    assert(slab.count() == slabRows)
    assert(slab.agg(org.apache.spark.sql.functions.min("doc_id"))
      .head.getLong(0) == 8L)
    // n_chars counts CODE POINTS (what both engines' length() returns)
    val emojiRow = slab.filter("text like '%💯'").head
    val t = emojiRow.getAs[String]("text")
    assert(emojiRow.getAs[Long]("n_chars") == t.codePointCount(0, t.length))
  }
}
