package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RagSpec extends SparkSpec {

  test("tfidf: idf decreases with document frequency") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val p = Tfidf.postings(docs, "doc_id", "text")
    val i = Tfidf.idf(p, docs).collect()
    val byDf = i.map(r => r.getAs[Long]("df") -> r.getAs[Double]("idf"))
    byDf.foreach { case (df1, idf1) =>
      byDf.foreach { case (df2, idf2) =>
        if (df1 < df2) assert(idf1 >= idf2)
      }
    }
  }

  test("cosine top-k returns k docs with descending scores in [0,1]") {
    val rows = RagQueries.cosineTopkDocs(spark, sf).collect()
    assert(rows.length == 5)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    assert(cos.forall(c => c > 0 && c <= 1.0 + 1e-9))
  }

  test("semantic_search surfaces rising-trend insights for a rising query") {
    val rows = RagQueries.semanticSearch(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("cosine") > 0))
  }

  test("bm25 ranks higher-tf matches first and drops non-matching docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join join join table"),
      (2L, "spark join table"),
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val out = Bm25.topK(spark, docs, "doc_id", "text", "join", 5).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), out.mkString(","))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
    assert(out.forall(_.getDouble(1) > 0.0))
  }
}
