package graft.analytics

import graft.SparkSpec

class ChatbotSpec extends SparkSpec {

  test("intent routing matches the reference's keyword rules") {
    assert(Chatbot.route("Which country's URGENT orders are rising fastest?")
      == Chatbot.Intent)
    assert(Chatbot.route("which regions have declining consumption")
      == Chatbot.Semantic)
    assert(Chatbot.route("anything else") == Chatbot.Semantic)
  }

  test("both chatbot branches return results") {
    val (m1, df1) = Chatbot.answer(spark, sf, "which urgent segment is rising?")
    assert(m1 == Chatbot.Intent)
    assert(df1.count() == 1)
    val (m2, df2) = Chatbot.answer(spark, sf, "overall declining indicator")
    assert(m2 == Chatbot.Semantic)
    assert(df2.count() == 5)
  }
}
