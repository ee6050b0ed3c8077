package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass text metrics (SURVEY §2 H2/H3): quality scoring and
  * token counting as pure codegen'd projections — no UDFs, no
  * shuffles; at 100 TB this is a map-only scan.
  */
object Analysis {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single symbols. */
  val bpeIshPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def ws(c: Column): Column = split(c, " ")

  /** H2 — length / punctuation / digit / stopword / word-length
    * profile of a text column.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val nChars = length(t)
    val nTokens = size(ws(t))
    val stopHits = size(filter(ws(t), x => x.isin(stopwords.map(lit): _*)))
    val punct = nChars - length(regexp_replace(t, "[.,!?;:']", ""))
    val digits = nChars - length(regexp_replace(t, "[0-9]", ""))
    // nullif guards: ANSI mode raises DIVIDE_BY_ZERO on empty text
    val safeChars = nullif(nChars, lit(0))
    val safeTokens = nullif(nTokens, lit(0))
    df.withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("stopword_ratio", stopHits.cast("double") / safeTokens)
      .withColumn("punct_ratio", punct.cast("double") / safeChars)
      .withColumn("digit_ratio", digits.cast("double") / safeChars)
      .withColumn("avg_word_len",
        (nChars - (nTokens - lit(1))).cast("double") / safeTokens)
  }

  /** H3 — whitespace and BPE-ish token counts. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    df.withColumn("ws_tokens", size(ws(t)))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit(bpeIshPattern), lit(0))))
  }

  /** H5 — within-document repetition profile: the fraction of
    * repeated tokens and the weight of the single most frequent
    * token — the standard boilerplate/spam gates a corpus filter
    * stacks on top of [[quality]].
    *
    * Shape: explode → two hash aggregates (both map-side
    * combinable), not nested array lambdas — an inner
    * `filter(ws, ...)` inside a per-distinct-token `transform`
    * re-evaluates the tokenizer per element once CollapseProject
    * inlines it, turning a scan into O(distinct · |doc|) regex work.
    * The aggregate shape is also what distributes: one shuffle on
    * (doc, token), one on doc.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(ws(lower(col(textCol)))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("int").as("n_tokens"),
        count(lit(1)).cast("int").as("n_distinct"),
        max("c").cast("int").as("top_count"))
      .withColumn("repetition_ratio",
        (col("n_tokens") - col("n_distinct")).cast("double")
          / nullif(col("n_tokens"), lit(0)))
      .withColumn("top_token_ratio",
        col("top_count").cast("double") / nullif(col("n_tokens"), lit(0)))

  /** H6 — PII patterns, dialect-portable (no lookaround, no \b):
    * run in both Spark (java.util.regex) and DuckDB (RE2) with
    * identical match semantics.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  /** H6 — PII redaction: count and mask email/phone occurrences.
    * Pure codegen'd projections — a map-only scan at 100 TB.
    */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("txt"), lit(EmailRe), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("txt"), lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("txt"), EmailRe, "<email>"),
          PhoneRe, "<phone>"))
      .select("doc_id", "n_emails", "n_phones", "redacted")
}
