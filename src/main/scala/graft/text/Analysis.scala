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
}
