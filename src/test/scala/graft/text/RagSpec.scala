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

  test("vocab induction counts match an independent token count") {
    val rows = RagQueries.vocabTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= RagQueries.VocabK)
    // descending frequency, ties broken by term
    rows.sliding(2).foreach { case Array(a, b) =>
      val (na, nb) = (a.getAs[Long]("n_tokens"), b.getAs[Long]("n_tokens"))
      assert(na > nb || (na == nb &&
        a.getAs[String]("term") < b.getAs[String]("term")))
    }
    // spot-check the top term's count against a raw re-tokenization
    val top = rows(0)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val term = top.getAs[String]("term")
    val expected =
      if (term.contains(" ")) { // bigram
        val Array(t1, t2) = term.split(" ")
        docs.map { t =>
          val tk = t.toLowerCase.split("[^a-z0-9]+").filter(w =>
            w.nonEmpty && !Tfidf.stopwords.contains(w))
          tk.sliding(2).count(p => p.length == 2 && p(0) == t1 && p(1) == t2)
        }.sum
      } else
        docs.map(_.toLowerCase.split("[^a-z0-9]+").filter(w =>
          w.nonEmpty && !Tfidf.stopwords.contains(w)).count(_ == term)).sum
    assert(top.getAs[Long]("n_tokens") == expected.toLong)
  }

  test("hybrid_rrf fuses the two retriever rankings by reciprocal rank") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // independent replay: rank each retriever's output in Scala,
    // fuse, and compare the full fused frame
    val cos = Tfidf.searchTopK(spark, docs, "doc_id", "text",
        RagQueries.question, RagQueries.RrfDepth).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("cosine")))
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val bm = Bm25.topK(spark, docs, "doc_id", "text",
        RagQueries.question, RagQueries.RrfDepth).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (cos.keySet ++ bm.keySet).toSeq.map { id =>
      val rrf = cos.get(id).map(r => 1.0 / (RagQueries.RrfC + r))
          .getOrElse(0.0) +
        bm.get(id).map(r => 1.0 / (RagQueries.RrfC + r)).getOrElse(0.0)
      (id, rrf)
    }.sortBy { case (id, r) => (-r, id) }.take(RagQueries.RrfK)
    val out = RagQueries.hybridRrf(spark, sf).collect()
    assert(out.length == RagQueries.RrfK)
    out.zip(expected).foreach { case (row, (id, rrf)) =>
      assert(row.getAs[Long]("doc_id") == id)
      assert(row.getAs[Double]("rrf") == rrf)
      val cr = Option(row.getAs[Integer]("crank")).map(_.toInt)
      val br = Option(row.getAs[Integer]("brank")).map(_.toInt)
      assert(cr == cos.get(id) && br == bm.get(id))
    }
    // both retrievers genuinely contribute to the fused head
    assert(out.exists(r => r.getAs[Integer]("crank") != null) &&
      out.exists(r => r.getAs[Integer]("brank") != null))
  }
}
