package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("top_n_latest only uses the latest year and caps at 10") {
    val rows = Dashboard.topNLatest(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val avgs = rows.map(_.getAs[Double]("avg_value"))
    assert(avgs.sameElements(avgs.sortBy(-_)))
  }

  test("pivot_heatmap has one row per geo and year columns") {
    val df = Dashboard.pivotHeatmap(spark, sf)
    assert(df.columns.toSeq == "geo" +: (1995 to 2001).map(_.toString))
    assert(df.count() == df.select("geo").distinct().count())
  }

  test("insights slope matches (end-start)/n_years") {
    val rows = Insights.insightsTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = (r.getAs[Double]("end_value") - r.getAs[Double]("start_value")) /
        r.getAs[Int]("n_years")
      assert(math.abs(r.getAs[Double]("slope_per_year") - expected) < 0.01)
      assert(Set("rising", "declining", "stable")(r.getAs[String]("trend_label")))
    }
  }

  test("fastest_rising returns the max-slope row for the indicator") {
    val all = Insights.trendStats(spark, sf)
      .filter(col("indicator") === "1-URGENT").collect()
    val best = Insights.fastestRising(spark, sf).collect()(0)
    assert(best.getAs[Double]("slope_per_year") ==
      all.map(_.getAs[Double]("slope_per_year")).max)
  }

  test("insight_text embeds the trend label and the change phrase") {
    val r = Insights.insightText(spark, sf).limit(5).collect()
    val phrase = """\([+-]\d+\.\d% over \d+ years\)|\([+-]\d+\.\d\d units over \d+ years\)""".r
    r.foreach { row =>
      val t = row.getAs[String]("insight_text")
      assert(t.startsWith(s"For ${row.getAs[String]("geo")},"))
      assert(t.contains("Overall trend:"))
      assert(phrase.findFirstIn(t).isDefined,
        s"missing change phrase in: $t")
    }
  }
}
