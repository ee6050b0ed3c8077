package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.analytics.Insights
import graft.sources.Tables

/** SURVEY §2 D — TF-IDF retrieval / semantic search as driver
  * queries (reference: llm_app/rag_engine.py).
  */
object RagQueries extends QueryModule {

  val question = "spark table join fast"

  /** D1 — tf-idf weighted postings over the documents corpus. */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    Tfidf.index(Tables.documents(spark, dir), "doc_id", "text").weights
      .select(col("id").as("doc_id"), col("term"), col("w"))
      .orderBy("doc_id", "term")

  /** D2 — cosine top-5 documents for a query string. */
  def cosineTopkDocs(spark: SparkSession, dir: String): DataFrame =
    Tfidf.searchTopK(spark, Tables.documents(spark, dir), "doc_id", "text",
        question, 5)
      .select(col("id").as("doc_id"), col("cosine"))

  /** D3 — the reference's semantic_search: top-5 insight texts for a
    * natural-language question, over the C2 insight corpus.
    */
  def semanticSearch(spark: SparkSession, dir: String): DataFrame = {
    val insights = Insights.insightText(spark, dir)
      .select(concat_ws("|", col("geo"), col("indicator")).as("key"),
        col("insight_text"))
    Tfidf.searchTopK(spark, insights, "key", "insight_text",
        "which country trend rising fastest", 5)
      .select(col("id").as("insight_key"), col("cosine"))
  }

  /** D6 — overlapping token-window chunking of the documents corpus
    * (retrieval prep: see [[Chunk]]). Map-only fan-out; the driver
    * gate hashes every chunk's exact text and bounds.
    */
  def docChunk(spark: SparkSession, dir: String): DataFrame =
    Chunk.chunks(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id", "chunk_id")

  /** D4 — BM25 top-5 documents for the same query string. */
  def bm25TopkDocs(spark: SparkSession, dir: String): DataFrame =
    Bm25.topK(spark, Tables.documents(spark, dir), "doc_id", "text",
        question, 5)
      .select(col("id").as("doc_id"), col("score"))

  /** D5 — vocabulary size for induction. */
  val VocabK = 500

  /** D5 — tokenizer vocabulary induction: top-[[VocabK]] terms by
    * corpus frequency over the shared posting index — the counting
    * pass every tokenizer training (BPE and friends) starts from.
    * One map-side-combinable aggregate + a bounded top-k
    * (TakeOrdered), never a full sort.
    */
  def vocabTopk(spark: SparkSession, dir: String): DataFrame =
    Tfidf.index(Tables.documents(spark, dir), "doc_id", "text").postings
      .groupBy("term")
      .agg(sum("tf").as("n_tokens"), countDistinct("id").as("df"))
      .orderBy(desc("n_tokens"), asc("term"))
      .limit(VocabK)

  /** D7 — keyword extraction: each document's top-3 terms by tf-idf
    * weight (ties broken by term) — the per-doc salient-term view a
    * RAG pipeline surfaces as tags/metadata. Rides the shared
    * memoized index; the rank window is pruned map-side by Spark 4's
    * InferWindowGroupLimit, so no group ever materializes past its
    * top-3 (the tie column is a string, which the CollectTopK
    * aggregate's negated-tie heap can't carry).
    */
  def keywordExtract(spark: SparkSession, dir: String): DataFrame = {
    val w = Tfidf.index(Tables.documents(spark, dir), "doc_id", "text")
      .weights
    val win = Window.partitionBy("id").orderBy(desc("w"), asc("term"))
    w.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= 3)
      .select(col("id").as("doc_id"), col("rk"), col("term"), col("w"))
      .orderBy("doc_id", "rk")
  }

  /** D8 — RRF smoothing constant (the standard k = 60) and per-
    * retriever ranking depth.
    */
  val RrfC = 60
  val RrfDepth = 20
  val RrfK = 5

  /** D8 — hybrid retrieval via reciprocal-rank fusion: the lexical
    * (BM25) and vector-ish (tf-idf cosine) retrievers each rank their
    * top-[[RrfDepth]], and documents fuse on
    * Σ_r 1/([[RrfC]] + rank_r) — the standard hybrid-search merge
    * (Cormack et al. 2009), robust to incomparable score scales
    * because only RANKS cross the boundary. Both inputs ride the
    * shared memoized posting index, each is a top-k output
    * (RrfDepth rows at any corpus size), so the fusion join is free
    * next to the retrievals; a doc missing from one list contributes
    * 0 from that retriever (full outer join), exactly how RRF handles
    * disjoint retriever coverage.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cos = Tfidf.searchTopK(spark, docs, "doc_id", "text",
      question, RrfDepth)
    val bm = Bm25.topK(spark, docs, "doc_id", "text", question, RrfDepth)
    rrfFuse(cos, bm)
  }

  /** The RRF merge over the two retrievals' top-[[RrfDepth]] frames —
    * shared by the fresh face above and the served-index face
    * (IndexStore.hybridRrfServedQ), which must fuse identically.
    * All three windows ride ≤ RrfDepth-row inputs.
    */
  private[graft] def rrfFuse(cosTopK: DataFrame, bmTopK: DataFrame): DataFrame = {
    val cos = cosTopK
      .select(col("id").as("doc_id"),
        row_number().over(Window.orderBy(desc("cosine"), asc("id")))
          .as("crank"))
    val bm = bmTopK
      .select(col("id").as("doc_id"),
        row_number().over(Window.orderBy(desc("score"), asc("id")))
          .as("brank"))
    val fused = cos.join(bm, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0d) / (lit(RrfC) + col("crank")), lit(0.0d)) +
        coalesce(lit(1.0d) / (lit(RrfC) + col("brank")), lit(0.0d)))
    fused.orderBy(desc("rrf"), asc("doc_id")).limit(RrfK)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("rrf"), asc("doc_id"))))
      .select("doc_id", "crank", "brank", "rrf", "rank")
      .orderBy("rank")
  }

  /** C5 canned questions — one per routing branch
    * (chatbot.py:54-64: "rising"+"gep/urgent" → exact handler,
    * everything else → semantic search).
    */
  val QIntent = "which country is rising fastest in urgent orders"
  val QSemantic = "which declining indicator changed most"

  /** C5 — the chatbot routing layer as a driver query: both canned
    * questions flow through [[graft.analytics.Chatbot.answer]] and
    * the branch results normalize to one
    * (question, mode, answer_key, score) frame — so the ROUTING
    * decision itself is inside the oracle gate, not just the two
    * handlers separately.
    */
  def chatbotAnswer(spark: SparkSession, dir: String): DataFrame = {
    import graft.analytics.Chatbot
    def one(q: String): DataFrame = Chatbot.answer(spark, dir, q) match {
      case (Chatbot.Intent, df) =>
        df.select(lit(q).as("question"), lit("intent").as("mode"),
          concat_ws("|", col("geo"), col("indicator")).as("answer_key"),
          col("slope_per_year").as("score"))
      case (Chatbot.Semantic, df) =>
        df.select(lit(q).as("question"), lit("semantic").as("mode"),
          col("id").as("answer_key"), col("cosine").as("score"))
    }
    one(QIntent).unionByName(one(QSemantic))
      .orderBy(col("question"), desc("score"), col("answer_key"))
  }

  override def queries: Map[String, Q] = Map(
    "tfidf" -> (tfidf _),
    "cosine_topk_docs" -> (cosineTopkDocs _),
    "semantic_search" -> (semanticSearch _),
    "bm25_topk_docs" -> (bm25TopkDocs _),
    "vocab_topk" -> (vocabTopk _),
    "doc_chunk" -> (docChunk _),
    "keyword_extract" -> (keywordExtract _),
    "hybrid_rrf" -> (hybridRrf _),
    "chatbot_answer" -> (chatbotAnswer _))

  /** Postings + smooth-idf CTEs over an arbitrary corpus CTE named
    * `corpus(id, txt)`.
    */
  private val stopList: String =
    Tfidf.stopwords.map(s => s"'$s'").mkString(", ")

  private def tfidfCtes(corpusName: String): String =
    s"""toks AS (SELECT id,
       |       list_filter(string_split_regex(lower(txt), '[^a-z0-9]+'),
       |         t -> length(t) > 0 AND t NOT IN ($stopList)) AS tk
       |     FROM $corpusName),
       |p AS (SELECT id, term, count(*) AS tf
       |     FROM (SELECT id, unnest(tk ||
       |             [tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]
       |              FOR i IN range(1, len(tk))]) AS term
       |           FROM toks)
       |     GROUP BY 1, 2),
       |i AS (SELECT term, count(DISTINCT id) AS df,
       |     CAST(CAST(ln((1.0 + (SELECT count(*) FROM $corpusName))
       |                  / (1.0 + count(DISTINCT id))) + 1.0
       |          AS DECIMAL(18,9)) AS DOUBLE) AS idf
       |     FROM p GROUP BY term),
       |w AS (SELECT p.id, p.term, p.tf * i.idf AS w
       |     FROM p JOIN i ON p.term = i.term)""".stripMargin

  private def searchSql(queryText: String, outIdCol: String): String =
    s"""${searchCtes(queryText)}
       |SELECT dots.id AS $outIdCol, dot / (sqrt(nrm.nsq) * sqrt(qn.qnsq)) AS cosine
       |FROM dots JOIN nrm ON dots.id = nrm.id CROSS JOIN qn
       |ORDER BY cosine DESC, dots.id ASC LIMIT 5""".stripMargin

  /** The query-side scoring CTEs (nrm/qt/qp/qw/qn/dots) over the
    * `w`/`i` CTEs from [[tfidfCtes]], without the final projection —
    * reusable where the top-k select needs different columns
    * (chatbot_answer).
    */
  private def searchCtes(queryText: String): String =
    s"""nrm AS (SELECT id, CAST(sum(CAST(w * w AS DECIMAL(24,8))) AS DOUBLE) AS nsq
       |     FROM w GROUP BY id),
       |qt AS (SELECT list_filter(string_split_regex(lower('$queryText'), '[^a-z0-9]+'),
       |         t -> length(t) > 0 AND t NOT IN ($stopList)) AS tk),
       |qp AS (SELECT term, count(*) AS tf
       |     FROM (SELECT unnest(tk ||
       |             [tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]
       |              FOR i IN range(1, len(tk))]) AS term
       |           FROM qt)
       |     GROUP BY 1),
       |qw AS (SELECT qp.term, qp.tf * i.idf AS qw FROM qp JOIN i ON qp.term = i.term),
       |qn AS (SELECT CAST(sum(CAST(qw * qw AS DECIMAL(24,8))) AS DOUBLE) AS qnsq
       |     FROM qw),
       |dots AS (SELECT w.id, CAST(sum(CAST(w.w * qw.qw AS DECIMAL(24,8))) AS DOUBLE) AS dot
       |     FROM w JOIN qw ON w.term = qw.term GROUP BY 1)""".stripMargin

  /** BM25 over the `p`/`i` CTEs from [[tfidfCtes]], ending at the
    * per-doc summed-score CTE `bsc`; constants are interpolated from
    * the Scala doubles' toString as VARCHAR→DOUBLE (numeric literals
    * would parse as DECIMAL and DuckDB's decimal→double cast is not
    * correctly rounded).
    */
  private def bm25Ctes(queryText: String): String = {
    val k1 = s"CAST('${Bm25.K1}' AS DOUBLE)"
    val k1p1 = s"CAST('${Bm25.K1p1}' AS DOUBLE)"
    val b = s"CAST('${Bm25.B}' AS DOUBLE)"
    s"""dl AS (SELECT id, sum(tf) AS dl FROM p GROUP BY id),
       |st AS (SELECT (SELECT count(*) FROM corpus) AS n_docs,
       |              (SELECT sum(dl) FROM dl) AS tot_dl),
       |bidf AS (SELECT term,
       |    CAST(CAST(ln((CAST(n_docs - df AS DOUBLE) + 0.5)
       |                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |         AS DECIMAL(18,9)) AS DOUBLE) AS bidf
       |  FROM i, st),
       |bqt AS (SELECT DISTINCT term
       |  FROM (SELECT unnest(tk ||
       |          [tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)]
       |           FOR i IN range(1, len(tk))]) AS term
       |        FROM (SELECT list_filter(
       |            string_split_regex(lower('$queryText'), '[^a-z0-9]+'),
       |            t -> length(t) > 0 AND t NOT IN ($stopList)) AS tk))),
       |sc AS (SELECT p.id,
       |    bidf.bidf * (p.tf * $k1p1)
       |      / (p.tf + $k1 * (1.0 - $b + $b * dl.dl
       |           / (CAST(st.tot_dl AS DOUBLE) / st.n_docs))) AS ts
       |  FROM p JOIN bqt USING (term) JOIN dl USING (id)
       |  JOIN bidf USING (term), st),
       |bsc AS (SELECT id,
       |    CAST(sum(CAST(ts AS DECIMAL(24,8))) AS DOUBLE) AS score
       |  FROM sc GROUP BY id)""".stripMargin
  }

  private def bm25Sql(queryText: String, outIdCol: String): String =
    s"""${bm25Ctes(queryText)}
       |SELECT id AS $outIdCol, score
       |FROM bsc ORDER BY score DESC, $outIdCol ASC LIMIT 5""".stripMargin

  override def oracles: Map[String, String] = Map(
    "doc_chunk" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |n AS (SELECT doc_id, ws,
        |        CASE WHEN len(ws) <= ${Chunk.Size} THEN 1
        |             ELSE 1 + CAST((len(ws) - ${Chunk.Size} + ${Chunk.Stride - 1})
        |                           // ${Chunk.Stride} AS INT) END AS nc
        |      FROM d),
        |c AS (SELECT doc_id, ws, CAST(i AS INT) AS chunk_id
        |      FROM n, UNNEST(range(0, nc)) AS u(i))
        |SELECT doc_id, chunk_id,
        |  chunk_id * ${Chunk.Stride} AS start_tok,
        |  CAST(len(ws[chunk_id * ${Chunk.Stride} + 1 :
        |             chunk_id * ${Chunk.Stride} + ${Chunk.Size}]) AS INT) AS n_tok,
        |  array_to_string(ws[chunk_id * ${Chunk.Stride} + 1 :
        |                     chunk_id * ${Chunk.Stride} + ${Chunk.Size}], ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "bm25_topk_docs" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")},
        |${bm25Sql(question, "doc_id")}""".stripMargin,
    "tfidf" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")}
        |SELECT id AS doc_id, term, w FROM w ORDER BY doc_id, term""".stripMargin,
    "keyword_extract" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")},
        |r AS (SELECT id, term, w,
        |        row_number() OVER (PARTITION BY id
        |                           ORDER BY w DESC, term ASC) AS rk
        |      FROM w)
        |SELECT id AS doc_id, CAST(rk AS INTEGER) AS rk, term, w
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "vocab_topk" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")}
        |SELECT term, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  count(DISTINCT id) AS df
        |FROM p GROUP BY term
        |ORDER BY n_tokens DESC, term LIMIT $VocabK""".stripMargin,
    "cosine_topk_docs" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")},
        |${searchSql(question, "doc_id")}""".stripMargin,
    "chatbot_answer" -> (Insights.labeledCte +
      s""", corpus AS (
        |  SELECT geo || '|' || indicator AS id,
        |    ${Insights.insightTextSql} AS txt
        |  FROM labeled),
        |${tfidfCtes("corpus")},
        |${searchCtes(QSemantic)}
        |SELECT * FROM (
        |  SELECT '$QIntent' AS question, 'intent' AS mode,
        |    geo || '|' || indicator AS answer_key, slope_per_year AS score
        |  FROM labeled WHERE indicator = '1-URGENT'
        |  ORDER BY slope_per_year DESC, geo ASC LIMIT 1)
        |UNION ALL
        |SELECT * FROM (
        |  SELECT '$QSemantic' AS question, 'semantic' AS mode,
        |    dots.id AS answer_key,
        |    dot / (sqrt(nrm.nsq) * sqrt(qn.qnsq)) AS score
        |  FROM dots JOIN nrm ON dots.id = nrm.id CROSS JOIN qn
        |  ORDER BY score DESC, dots.id ASC LIMIT 5)
        |ORDER BY question, score DESC, answer_key""".stripMargin),
    "semantic_search" -> (Insights.labeledCte +
      s""", corpus AS (
        |  SELECT geo || '|' || indicator AS id,
        |    ${Insights.insightTextSql} AS txt
        |  FROM labeled),
        |${tfidfCtes("corpus")},
        |${searchSql("which country trend rising fastest", "insight_key")}""".stripMargin),
    "hybrid_rrf" ->
      s"""WITH corpus AS (SELECT doc_id AS id, text AS txt FROM documents),
        |${tfidfCtes("corpus")},
        |${searchCtes(question)},
        |${bm25Ctes(question)},
        |cosr AS (SELECT id, CAST(rn AS INTEGER) AS crank FROM (
        |    SELECT dots.id, row_number()
        |      OVER (ORDER BY dot / (sqrt(nrm.nsq) * sqrt(qn.qnsq)) DESC,
        |            dots.id ASC) AS rn
        |    FROM dots JOIN nrm ON dots.id = nrm.id CROSS JOIN qn)
        |  WHERE rn <= $RrfDepth),
        |bmr AS (SELECT id, CAST(rn AS INTEGER) AS brank FROM (
        |    SELECT id, row_number()
        |      OVER (ORDER BY score DESC, id ASC) AS rn FROM bsc)
        |  WHERE rn <= $RrfDepth),
        |u AS (SELECT COALESCE(c.id, b.id) AS doc_id, c.crank, b.brank,
        |    COALESCE(CAST(1 AS DOUBLE) / ($RrfC + c.crank),
        |             CAST(0 AS DOUBLE))
        |  + COALESCE(CAST(1 AS DOUBLE) / ($RrfC + b.brank),
        |             CAST(0 AS DOUBLE)) AS rrf
        |  FROM cosr c FULL OUTER JOIN bmr b ON c.id = b.id)
        |SELECT doc_id, crank, brank, rrf, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT *, row_number()
        |        OVER (ORDER BY rrf DESC, doc_id ASC) AS rank FROM u)
        |WHERE rank <= $RrfK
        |ORDER BY rank""".stripMargin)
}
