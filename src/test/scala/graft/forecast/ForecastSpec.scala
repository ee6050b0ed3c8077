package graft.forecast

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ForecastSpec extends SparkSpec {

  private def obs = graft.etl.Observations.build(spark, sf)

  test("lag features shift correctly within one series") {
    val rows = Forecast.lagFeatures(obs)
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .orderBy("year").collect()
    assert(rows.length >= 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("lag1")))
    assert(rows(1).getAs[Double]("lag1") == rows(0).getAs[Double]("value"))
    assert(rows(3).getAs[Double]("lag3") == rows(0).getAs[Double]("value"))
    // rolling mean of the first full window
    val m = rows(2).getAs[Double]("roll_mean_3")
    val expected = (rows(0).getAs[Double]("value") + rows(1).getAs[Double]("value")
      + rows(2).getAs[Double]("value")) / 3
    assert(math.abs(m - expected) < 1e-6)
    assert(rows(1).isNullAt(rows(1).fieldIndex("roll_mean_3")))
  }

  test("train/test split holds out the reference's test_size tail") {
    val rows = Forecast.trainTestSplit(obs).collect()
    val bySeries = rows.groupBy(r =>
      (r.getAs[String]("geo"), r.getAs[String]("indicator")))
    bySeries.values.foreach { grp =>
      val n = grp.length
      val expectedTest = math.min(5, math.max(2, n / 3))
      val test = grp.filter(_.getAs[String]("split") == "test")
      assert(test.length == expectedTest)
      // test rows are the latest years
      val trainYears = grp.filter(_.getAs[String]("split") == "train")
        .map(_.getAs[Int]("year"))
      if (trainYears.nonEmpty)
        assert(test.forall(_.getAs[Int]("year") > trainYears.max))
    }
  }

  test("holt forecast matches a reference Scala implementation") {
    val series = obs
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .orderBy("year").collect()
      .map(r => r.getAs[Int]("year") -> r.getAs[Double]("value"))
    var l = series(0)._2
    var b = series(1)._2 - series(0)._2
    series.drop(1).foreach { case (_, x) =>
      val l2 = Forecast.Alpha * x + (1 - Forecast.Alpha) * (l + b)
      val b2 = Forecast.Beta * (l2 - l) + (1 - Forecast.Beta) * b
      l = l2; b = b2
    }
    val lastYear = series.last._1
    val expected = (1 to Forecast.Horizon)
      .map(i => (lastYear + i) -> (l + i * b)).toMap
    val got = ForecastQueries.holtForecast(spark, sf)
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .collect()
      .map(r => r.getAs[Int]("year") -> r.getAs[Double]("forecast")).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (y, v) =>
      assert(math.abs(got(y) - v) < 1e-6, s"year $y: ${got(y)} vs $v")
    }
  }

  test("gbt forecast produces finite predictions on the test split") {
    val rows = ForecastQueries.gbtForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getAs[Double]("prediction").isNaN))
  }

  test("model_select picks the lower-rmse model") {
    ForecastQueries.modelSelect(spark, sf).collect().foreach { r =>
      val naive = r.getAs[Double]("rmse_naive")
      val holt = r.getAs[Double]("rmse_holt")
      val used = r.getAs[String]("model_used")
      assert(if (holt <= naive) used == "holt" else used == "naive")
    }
  }
}
