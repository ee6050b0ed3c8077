package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.sources.Tables

/** SURVEY §2 H — text analysis block as driver queries. */
object TextQueries extends QueryModule {

  /** H1 — trigram-profile language ID over documents. The profile
    * build (one corpus trigram pass) is memoized per (session,
    * corpus) and billed as the `langid_profiles` bench build;
    * classification itself is one distinct-trigram pass + a
    * broadcast profile join.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Par.spread(Tables.documents(spark, dir))
    val profile =
      LangId.profilesMemo(docs.select("lang", "text"), "text", "lang")
    LangId.classify(docs, profile, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Bench build entry for the memoized lang-id profile — constructs
    * the exact frame [[langId]] memoizes on so the plan key matches.
    */
  def prebuildLangId(spark: SparkSession, dir: String): Unit = {
    val docs = graft.Par.spread(Tables.documents(spark, dir))
    LangId.profilesMemo(docs.select("lang", "text"), "text", "lang").count()
    ()
  }

  /** H2 — quality metrics per document. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    Analysis.quality(graft.Par.spread(Tables.documents(spark, dir).select("doc_id", "text")), "text")
      .select("doc_id", "n_chars_m", "n_tokens", "stopword_ratio",
        "punct_ratio", "digit_ratio", "avg_word_len")
      .orderBy("doc_id")
  }

  /** H3 — token counts per document. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    Analysis.tokenCounts(graft.Par.spread(Tables.documents(spark, dir).select("doc_id", "text")), "text")
      .select("doc_id", "ws_tokens", "bpe_ish_tokens")
      .orderBy("doc_id")
  }

  /** H4 — winnowing fingerprints, aggregated per doc for a compact
    * deterministic result (count + min + max fingerprint).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    Fingerprint.fingerprints(
      graft.Par.spread(Tables.documents(spark, dir).select("doc_id", "text")),
      "doc_id", "text")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"), min("fingerprint").as("min_fp"),
        max("fingerprint").as("max_fp"))
      .orderBy("doc_id")
  }

  /** H5 — repetition profile per document. */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame =
    Analysis.repetition(
      graft.Par.spread(Tables.documents(spark, dir).select("doc_id", "text")),
      "doc_id", "text")
      .select("doc_id", "n_tokens", "n_distinct", "top_count",
        "repetition_ratio", "top_token_ratio")
      .orderBy("doc_id")

  /** H6 — PII redaction. The synthetic corpus carries no PII, so a
    * deterministic email+phone is appended per document first — every
    * row exercises both patterns and the masked text is hash-gated.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val withPii = graft.Par.spread(
      Tables.documents(spark, dir).select("doc_id", "text"))
      .withColumn("pii_text", concat(lower(col("text")),
        lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
    Analysis.piiRedact(withPii, "doc_id", "pii_text").orderBy("doc_id")
  }

  /** H8 — tokenizer vocabulary size for the encode pass. */
  val VocabSize = 256

  /** H8 — tokenizer application: induce the top-[[VocabSize]]
    * whitespace vocabulary (count desc, term asc — D5's ranking) and
    * encode every document as its ordered token-id sequence with
    * OOV = 0 — the pass that turns a cleaned corpus into model-ready
    * ids. The vocab is top-K by construction so it broadcast-joins
    * map-side at any corpus size; the encode is ONE groupBy that
    * reassembles ids in position order (emitted as a csv string so
    * the gate compares exact sequences, not float-ish arrays).
    */
  def tokenIds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = graft.Par.spread(
        Tables.documents(spark, dir).select("doc_id", "text"))
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    // rank over the top-K frame only (256 rows — single task is fine)
    val vocab = t.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(VocabSize)
      .withColumn("id",
        row_number().over(Window.orderBy(desc("cnt"), asc("term"))))
      .select("term", "id")
    t.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("tid", coalesce(col("id"), lit(0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
            x => x.getField("tid").cast("string"))).as("ids_csv"))
      .orderBy("doc_id")
  }

  /** H7 — bigram LM score per document (perplexity-style filter). */
  def lmScore(spark: SparkSession, dir: String): DataFrame =
    Lm.score(graft.Par.spread(Tables.documents(spark, dir)
        .select("doc_id", "text")), "doc_id", "text")
      .orderBy("doc_id")

  /** H9 — BPE merge induction over the documents corpus. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    Bpe.merges(Tables.documents(spark, dir), "text")

  /** H11 — per-doc subword fertility under the induced merges. */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    Bpe.fertility(Tables.documents(spark, dir), "doc_id", "text")

  /** H10 — fuzzy matching by edit distance (spell-correction /
    * entity-resolution primitive): corrupted probe tokens (3rd char
    * dropped from every ≥5-char vocabulary word — deterministic, so
    * both engines derive the same probe set) resolve to their nearest
    * dictionary word. The naive form is probe×dict with a levenshtein
    * on every pair; here candidates come from an EQUI-join on
    * (first-char, length) blocks — the probe side explodes onto the
    * ±1 length cells, a deliberate candidate-pruning approximation:
    * distance-2 matches built from two pure insertions or deletions
    * have length delta 2 and are excluded by design (the oracle
    * applies the identical block) — so no cartesian node exists at
    * any dictionary size, the classic blocking trick of record
    * linkage. Best match = `min(struct(dist, word))`, the
    * deterministic tie-break.
    */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchOf(Tables.documents(spark, dir))

  /** The fuzzy-match body over any frame with a `text` column. */
  def fuzzyMatchOf(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val dict = words.select(col("w").as("dw"))
      .withColumn("c1", substring(col("dw"), 1, 1))
      .withColumn("blen", length(col("dw")))
    val probes = words.filter(length(col("w")) >= 5)
      .select(concat(substring(col("w"), 1, 2), expr("substring(w, 4)"))
        .as("probe"))
      .distinct()
    probes
      .withColumn("c1", substring(col("probe"), 1, 1))
      .withColumn("plen", length(col("probe")))
      .withColumn("blen", explode(array(col("plen") - 1, col("plen"),
        col("plen") + 1)))
      .join(dict, Seq("c1", "blen"))
      .withColumn("dist", levenshtein(col("probe"), col("dw")))
      .filter(col("dist") <= 2)
      .groupBy("probe")
      .agg(min(struct(col("dist"), col("dw"))).as("m"))
      .select(col("probe"), col("m.dw").as("matched"),
        col("m.dist").as("dist"))
      .orderBy("probe")
  }

  override def queries: Map[String, Q] = Map(
    "fuzzy_match" -> (fuzzyMatch _),
    "bpe_merges" -> (bpeMerges _),
    "bpe_fertility" -> (bpeFertility _),
    "lang_id" -> (langId _),
    "text_quality" -> (textQuality _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (docFingerprint _),
    "repetition_ratio" -> (repetitionRatio _),
    "pii_redact" -> (piiRedact _),
    "lm_score" -> (lmScore _),
    "token_ids" -> (tokenIds _))

  /** One BPE round: pairs from sN → argmax tN → merged sN+1 (the
    * word column rides along for the fertility join).
    */
  private def bpeRound(n: Int): String = {
    val (s, t, sn) = (s"s${n - 1}", s"t$n", s"s$n")
    s"""p$n AS (SELECT arr[CAST(i AS INT)] AS a, arr[CAST(i AS INT) + 1] AS b,
      |    CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq, string_split(substr(syms, 2, length(syms) - 2),
      |                '&#124;&#124;') AS arr FROM $s) sp,
      |       UNNEST(range(1, len(arr))) u(i)
      |  GROUP BY 1, 2),
      |$t AS (SELECT $n AS merge_no, a, b, a &#124;&#124; b AS merged, cnt
      |       FROM p$n ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
      |$sn AS (SELECT w, freq,
      |    replace(syms, '&#124;' &#124;&#124; t.a &#124;&#124; '&#124;&#124;' &#124;&#124; t.b &#124;&#124; '&#124;',
      |            '&#124;' &#124;&#124; t.a &#124;&#124; t.b &#124;&#124; '&#124;') AS syms
      |  FROM $s, $t t)"""
  }

  /** The shared w → s0 → (3 rounds) chain both BPE oracles build on. */
  private def bpeCtes: String =
    ("""WITH w AS (SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS w
      |    FROM documents)
      |  WHERE length(w) > 0 AND w NOT LIKE '%&#124;%' GROUP BY w),
      |s0 AS (SELECT w, freq,
      |    '&#124;' &#124;&#124; left(regexp_replace(w, '(.)', '\1&#124;&#124;', 'g'),
      |                length(regexp_replace(w, '(.)', '\1&#124;&#124;', 'g')) - 1)
      |      AS syms
      |  FROM w),
      |""" + bpeRound(1) + ",\n" + bpeRound(2) + ",\n" + bpeRound(3))
      .stripMargin.replace("&#124;", "|")

  override def oracles: Map[String, String] = Map(
    // Edit distance is replayed on CODE-POINT arrays, not with
    // DuckDB's levenshtein(): that builtin counts BYTES, so a
    // single-char edit on a multibyte script scores 2-3 and diverges
    // from Spark's code-point distance (caught by the round-11
    // unicode gate). Under the (first-char, length ±1) block only
    // distances 0-2 exist, so the <=2-edit alignments are enumerated
    // exactly: equal length -> hamming ({sub},{sub,sub}) plus the
    // del/del shift for {ins,del}; length delta 1 -> 1 + the minimum
    // hamming over single-deletion alignments ({ins},{ins,sub}).
    "fuzzy_match" ->
      """WITH words AS (SELECT DISTINCT w
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE len(w) > 0),
        |probes AS (SELECT DISTINCT substr(w, 1, 2) || substr(w, 4)
        |             AS probe
        |           FROM words WHERE len(w) >= 5),
        |cand0 AS (SELECT p.probe, d.w AS dw,
        |            regexp_extract_all(p.probe, '.') AS la,
        |            regexp_extract_all(d.w, '.') AS lb
        |          FROM probes p JOIN words d
        |            ON substr(d.w, 1, 1) = substr(p.probe, 1, 1)
        |           AND len(d.w)
        |               BETWEEN len(p.probe) - 1 AND len(p.probe) + 1),
        |heq AS (SELECT probe, dw, la, lb,
        |          len(list_filter(range(1, len(la) + 1),
        |            i -> la[CAST(i AS INT)] <> lb[CAST(i AS INT)])) AS h
        |        FROM cand0 WHERE len(la) = len(lb)),
        |shift2 AS (SELECT DISTINCT probe, dw
        |           FROM heq,
        |                UNNEST(range(1, len(la) + 1)) u(i),
        |                UNNEST(range(1, len(lb) + 1)) v(j)
        |           WHERE h > 2
        |             AND list_slice(la, 1, CAST(i AS INT) - 1)
        |                   || list_slice(la, CAST(i AS INT) + 1, len(la))
        |               = list_slice(lb, 1, CAST(j AS INT) - 1)
        |                   || list_slice(lb, CAST(j AS INT) + 1, len(lb))),
        |dl1 AS (SELECT probe, dw,
        |          CASE WHEN len(la) < len(lb) THEN la ELSE lb END AS ls,
        |          CASE WHEN len(la) < len(lb) THEN lb ELSE la END AS ll
        |        FROM cand0 WHERE len(la) <> len(lb)),
        |dl1h AS (SELECT probe, dw,
        |           min(len(list_filter(range(1, len(ls) + 1),
        |             i -> ls[CAST(i AS INT)] <>
        |               (CASE WHEN i < j THEN ll[CAST(i AS INT)]
        |                     ELSE ll[CAST(i AS INT) + 1] END)))) AS mh
        |         FROM dl1, UNNEST(range(1, len(ll) + 1)) v(j)
        |         GROUP BY probe, dw),
        |cand AS (SELECT probe, dw, h AS dist FROM heq WHERE h <= 2
        |         UNION ALL
        |         SELECT probe, dw, 2 AS dist FROM shift2
        |         UNION ALL
        |         SELECT probe, dw, 1 + mh AS dist FROM dl1h WHERE mh <= 1),
        |r AS (SELECT probe, dw, dist,
        |        row_number() OVER (PARTITION BY probe
        |                           ORDER BY dist, dw) AS rn
        |      FROM cand)
        |SELECT probe, dw AS matched, CAST(dist AS INTEGER) AS dist
        |FROM r WHERE rn = 1 ORDER BY probe""".stripMargin,
    "bpe_merges" ->
      (bpeCtes + """
        |SELECT merge_no, a, b, merged, cnt
        |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2
        |      UNION ALL SELECT * FROM t3)
        |ORDER BY merge_no""".stripMargin),
    "bpe_fertility" ->
      (bpeCtes + """,
        |wsyms AS (SELECT w,
        |    CAST(len(string_split(substr(syms, 2, length(syms) - 2),
        |                          '||')) AS INT) AS n_syms
        |  FROM s3),
        |dtf AS (SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents)
        |  WHERE length(w) > 0 AND w NOT LIKE '%|%')
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(sum(n_syms) AS BIGINT) AS n_subwords,
        |  CAST(sum(n_syms) AS DOUBLE) / count(*) AS fertility
        |FROM dtf JOIN wsyms USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "token_ids" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |           FROM documents),
        |cc AS (SELECT term, count(*) AS cnt FROM (
        |         SELECT unnest(ws) AS term FROM d) GROUP BY term),
        |vocab AS (SELECT term, CAST(row_number() OVER (
        |            ORDER BY cnt DESC, term ASC) AS INT) AS id
        |          FROM cc ORDER BY cnt DESC, term ASC LIMIT $VocabSize),
        |t AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |        ws[CAST(i AS INT)] AS term
        |      FROM d, UNNEST(range(1, len(ws) + 1)) AS u(i)),
        |j AS (SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS tid,
        |        CASE WHEN v.id IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM t LEFT JOIN vocab v USING (term))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws,
        |    CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 1000 AS bucket
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, bucket, ws[CAST(i AS INT)] AS w1,
        |    ws[CAST(i + 1 AS INT)] AS w2
        |  FROM t, UNNEST(range(1, len(ws))) AS u(i)),
        |tb AS (SELECT w1, w2, count(*) AS cb FROM bi
        |       WHERE bucket < 800 GROUP BY w1, w2),
        |tu AS (SELECT w1, count(*) AS cu FROM (
        |         SELECT unnest(ws) AS w1 FROM t WHERE bucket < 800)
        |       GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM tu),
        |lp AS (
        |  SELECT bi.doc_id,
        |    CAST(CAST(ln(CAST(COALESCE(tb.cb, 0) + 1 AS DOUBLE)
        |                 / CAST(COALESCE(tu.cu, 0) + v.v AS DOUBLE))
        |         AS DECIMAL(18,9)) AS DOUBLE) AS logp
        |  FROM bi LEFT JOIN tb ON bi.w1 = tb.w1 AND bi.w2 = tb.w2
        |          LEFT JOIN tu ON bi.w1 = tu.w1
        |          CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(logp AS DECIMAL(24,9))) AS DOUBLE) AS sum_logp,
        |  CAST(sum(CAST(logp AS DECIMAL(24,9))) AS DOUBLE) / count(*)
        |    AS avg_logp
        |FROM lp GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang, lower(text) AS txt FROM documents
        |           WHERE length(text) >= 3),
        |grams AS (
        |  SELECT doc_id, lang, substr(txt, CAST(i AS INT), 3) AS g
        |  FROM t, UNNEST(range(1, length(txt) - 1)) AS u(i)),
        |profile AS (
        |  SELECT p_lang, g FROM (
        |    SELECT lang AS p_lang, g,
        |      row_number() OVER (PARTITION BY lang
        |                         ORDER BY count(*) DESC, g ASC) AS rn
        |    FROM grams GROUP BY lang, g) WHERE rn <= 50),
        |docg AS (SELECT DISTINCT doc_id, g FROM grams),
        |scores AS (
        |  SELECT d.doc_id, p.p_lang, count(*) AS overlap
        |  FROM docg d JOIN profile p ON d.g = p.g
        |  GROUP BY d.doc_id, p.p_lang),
        |pred AS (
        |  SELECT doc_id, p_lang AS pred_lang, overlap,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY overlap DESC, p_lang ASC) AS rn
        |  FROM scores)
        |SELECT doc_id, pred_lang, overlap FROM pred WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(t) AS INTEGER) AS n_chars_m,
        |  CAST(len(string_split(t, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_filter(string_split(t, ' '),
        |    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |    / nullif(len(string_split(t, ' ')), 0) AS stopword_ratio,
        |  CAST(length(t) - length(regexp_replace(t, '[.,!?;:'']', '', 'g')) AS DOUBLE)
        |    / nullif(length(t), 0) AS punct_ratio,
        |  CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS DOUBLE)
        |    / nullif(length(t), 0) AS digit_ratio,
        |  CAST(length(t) - (len(string_split(t, ' ')) - 1) AS DOUBLE)
        |    / nullif(len(string_split(t, ' ')), 0) AS avg_word_len
        |FROM (SELECT doc_id, lower(text) AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(t, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_ish_tokens
        |FROM (SELECT doc_id, lower(text) AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "repetition_ratio" ->
      """WITH toks AS (SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(c) AS INTEGER) AS n_tokens,
        |    CAST(count(*) AS INTEGER) AS n_distinct,
        |    CAST(max(c) AS INTEGER) AS top_count
        |  FROM toks GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct, top_count,
        |  CAST(n_tokens - n_distinct AS DOUBLE) / nullif(n_tokens, 0)
        |    AS repetition_ratio,
        |  CAST(top_count AS DOUBLE) / nullif(n_tokens, 0) AS top_token_ratio
        |FROM agg ORDER BY doc_id""".stripMargin,
    "pii_redact" ->
      s"""WITH t AS (SELECT doc_id,
        |    lower(text) || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt, '${Analysis.EmailRe}')) AS INTEGER)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(txt, '${Analysis.PhoneRe}')) AS INTEGER)
        |    AS n_phones,
        |  regexp_replace(regexp_replace(txt, '${Analysis.EmailRe}', '<email>', 'g'),
        |    '${Analysis.PhoneRe}', '<phone>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents
        |            WHERE length(text) >= ${Fingerprint.K + Fingerprint.W - 1}),
        |kh AS (
        |  SELECT doc_id, i,
        |    CAST(sum(ascii(substr(txt, CAST(i + j AS INT), 1))
        |        * CAST(pow(31, ${Fingerprint.K - 1} - j) AS BIGINT)) AS BIGINT) AS khash
        |  FROM t,
        |    UNNEST(range(1, length(txt) - ${Fingerprint.K - 2})) AS u(i),
        |    UNNEST(range(0, ${Fingerprint.K})) AS v(j)
        |  GROUP BY doc_id, i),
        |mins AS (
        |  SELECT doc_id, i,
        |    min(khash) OVER (PARTITION BY doc_id ORDER BY i
        |                     ROWS BETWEEN CURRENT ROW
        |                     AND ${Fingerprint.W - 1} FOLLOWING) AS wmin,
        |    count(*) OVER (PARTITION BY doc_id) AS n_k
        |  FROM kh),
        |fps AS (
        |  SELECT DISTINCT doc_id, wmin FROM mins
        |  WHERE i <= n_k - ${Fingerprint.W - 1})
        |SELECT doc_id, count(*) AS n_fps, min(wmin) AS min_fp,
        |  max(wmin) AS max_fp
        |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
