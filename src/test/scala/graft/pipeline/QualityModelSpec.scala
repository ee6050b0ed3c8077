package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {

  test("classifyGiven (rendered margin) matches model.transform bit-tight") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sql = QualityModel.classifyGiven(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("margin"), r.getAs[Boolean]("pred_keep"))).toMap
    val ml = QualityModel.classify(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("margin"), r.getAs[Boolean]("pred_keep"))).toMap
    assert(sql.keySet == ml.keySet && sql.nonEmpty)
    sql.foreach { case (id, (mSql, pSql)) =>
      val (mMl, pMl) = ml(id)
      // BLAS dot association is the only slack between the two paths
      assert(math.abs(mSql - mMl) <=
        1e-9 * math.max(1.0, math.abs(mMl)), s"doc $id: $mSql vs $mMl")
      // sign agreement away from the boundary
      if (math.abs(mMl) > 1e-6) assert(pSql == pMl, s"doc $id")
    }
  }

  test("the fit is deterministic: an equivalent panel refits to the same weights") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // filter(true) changes the analyzed-plan text (new memo key) but
    // not the data, forcing a genuine second LBFGS run
    val again = docs.filter(lit(true))
    val m1 = QualityModel.modelFor(docs).get
    val m2 = QualityModel.modelFor(again).get
    assert(m1.intercept == m2.intercept)
    assert(m1.coefficients.toArray.toSeq == m2.coefficients.toArray.toSeq)
    assert(m1.coefficients.size == QualityModel.featureCols.size)
    // identical weights render identical oracle text
    assert(QualityModel.marginSql(m1) == QualityModel.marginSql(m2))
  }

  test("distills a linearly-separable keep rule and generalizes to held-out docs") {
    import spark.implicits._
    // keep is driven purely by the token-count gate: short docs (5
    // tokens < MinTokens) fail, long docs (25 tokens) pass; no dups,
    // no stopwords — so the verdict is linearly separable in the
    // n_tokens feature and LR must recover it on every split
    // per-doc-unique tokens: no exact dups, no shingle overlap — the
    // verdict reduces to the quality gate alone
    def short(i: Long) = (1 to 5).map(j => s"w${i}x$j").mkString(" ")
    def long(i: Long) = (1 to 25).map(j => s"w${i}x$j").mkString(" ")
    val docs = (0L until 60L)
      .map(i => (i, if (i % 2 == 0) short(i) else long(i)))
      .toDF("doc_id", "text")
    val verdicts = Corpus.verdictsOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(verdicts.values.toSet == Set(true, false))
    val pred = QualityModel.classifyGiven(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pred_keep")).toMap
    assert(pred.size == 60)
    // perfect recovery, including the ~20% of docs outside the train split
    pred.foreach { case (id, p) => assert(p == verdicts(id), s"doc $id") }
  }

  test("degrades to empty on an empty corpus") {
    import spark.implicits._
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(QualityModel.modelFor(none).isEmpty)
    assert(QualityModel.classifyGiven(none).isEmpty)
    assert(QualityModel.classify(none).isEmpty)
  }
}
