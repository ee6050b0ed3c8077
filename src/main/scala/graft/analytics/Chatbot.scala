package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.text.Tfidf

/** The reference's chatbot entry point (llm_app/chatbot.py:49-80):
  * intent detection first ("rising" + "gep"-style questions go to the
  * exact argmax handler), semantic TF-IDF search as the fallback.
  * Both branches are the distributed operators defined elsewhere —
  * this is only the routing layer.
  */
object Chatbot {

  sealed trait Mode
  case object Intent extends Mode
  case object Semantic extends Mode

  def route(question: String): Mode = {
    val q = question.toLowerCase
    val rising = Seq("rising", "increasing", "growing").exists(q.contains)
    val gep = Seq("urgent", "gep", "gross electricity").exists(q.contains)
    if (rising && gep) Intent else Semantic
  }

  /** Answer a question: (mode, result rows). */
  def answer(spark: SparkSession, dir: String, question: String)
      : (Mode, DataFrame) =
    route(question) match {
      case Intent => (Intent, Insights.fastestRising(spark, dir))
      case Semantic =>
        import org.apache.spark.sql.functions._
        val corpus = Insights.insightText(spark, dir)
          .select(concat_ws("|", col("geo"), col("indicator")).as("key"),
            col("insight_text"))
        (Semantic,
          Tfidf.searchTopK(spark, corpus, "key", "insight_text", question, 5))
    }
}
