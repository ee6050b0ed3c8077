package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-trigram language identification (SURVEY §2 H1).
  *
  * Classic n-gram profile method: build a top-K trigram profile per
  * language from a labeled corpus, score unlabeled docs by profile
  * overlap, take the argmax. Everything is exploded-relational —
  * explode → hash aggregate → broadcast-join — so the profile build is
  * one shuffle over (lang, gram) and classification is a broadcast
  * join of a K×#langs profile against the corpus, which scales to any
  * corpus size with no per-doc driver work.
  */
object LangId {

  /** One row per (docCols..., trigram occurrence). */
  def trigrams(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_txt", lower(col(textCol)))
      .filter(length(col("_txt")) >= 3)
      .select(df.columns.map(col) :+
        explode(expr("transform(sequence(1, length(_txt) - 2), i -> substring(_txt, i, 3))"))
          .as("g"): _*)

  /** Top-K trigrams per language, deterministic tiebreak. */
  def profiles(labeled: DataFrame, textCol: String, langCol: String,
      topK: Int = 50): DataFrame = {
    val g = trigrams(labeled, textCol)
    val counts = g.groupBy(col(langCol).as("p_lang"), col("g")).count()
    val w = Window.partitionBy("p_lang").orderBy(desc("count"), asc("g"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("p_lang", "g")
  }

  /** [[profiles]] memoized per (session, corpus plan) and eagerly
    * checkpointed — the profile is a K×#langs frame (corpus-
    * independent), but its build is a full corpus trigram pass;
    * rebuilding it per classify call was the slowest recurring
    * non-build cost three bench rounds running. The Tfidf.index
    * discipline applied: build once, bill as a build, every
    * classification pays only the broadcast join.
    */
  def profilesMemo(labeled: DataFrame, textCol: String, langCol: String,
      topK: Int = 50): DataFrame =
    graft.Memo.small(s"langid_profiles|$textCol|$langCol|$topK", labeled)(
      profiles(labeled, textCol, langCol, topK))

  /** Predicted language per doc: argmax profile overlap (distinct
    * doc trigrams ∩ profile), ties broken by language code.
    */
  def classify(docs: DataFrame, profile: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // broadcast-join BEFORE deduplicating: the profile filter drops
    // every non-profile trigram occurrence map-side, so the dedup
    // runs inside one count-distinct aggregate over the (much
    // smaller) profile-hit rows instead of a standalone distinct
    // exchange over the corpus's full (doc, trigram) set; the former
    // per-doc row_number window (exchange + sort just to keep row 1)
    // is an argmax aggregate — min_by over (-overlap, p_lang) is
    // exactly the (overlap DESC, p_lang ASC) head. Same rows out.
    val scores = trigrams(docs.select(idCol, textCol), textCol)
      .select(col(idCol), col("g"))
      .join(broadcast(profile), "g")
      .groupBy(col(idCol), col("p_lang"))
      .agg(count_distinct(col("g")).as("overlap"))
    scores.groupBy(col(idCol))
      .agg(min_by(struct(col("p_lang"), col("overlap")),
        struct(-col("overlap"), col("p_lang"))).as("_best"))
      .select(col(idCol), col("_best.p_lang").as("pred_lang"),
        col("_best.overlap").as("overlap"))
  }
}
