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

  /** Plain-Scala Holt fold: returns (l, b, sse) for one (α, β). */
  private def holtFold(values: Seq[Double], alpha: Double,
      beta: Double): (Double, Double, Double) = {
    var l = values(0)
    var b = values(1) - values(0)
    var sse = 0.0
    values.drop(1).foreach { x =>
      sse += (x - (l + b)) * (x - (l + b))
      val l2 = alpha * x + (1 - alpha) * (l + b)
      val b2 = beta * (l2 - l) + (1 - beta) * b
      l = l2; b = b2
    }
    (l, b, sse)
  }

  /** Grid argmin with the engine's tie-break: (sse, alpha, beta). */
  private def fitHolt(values: Seq[Double]): (Double, Double, Double, Double) =
    (for (a <- Forecast.GridValues; b <- Forecast.GridValues) yield {
      val (l, bb, sse) = holtFold(values, a, b)
      (sse, a, b, l, bb)
    }).minBy(t => (t._1, t._2, t._3)) match {
      case (_, a, b, l, bb) => (a, b, l, bb)
    }

  test("holt forecast matches a grid-fitted reference implementation") {
    val series = obs
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .orderBy("year").collect()
      .map(r => r.getAs[Int]("year") -> r.getAs[Double]("value"))
    val (_, _, l, b) = fitHolt(series.map(_._2).toSeq)
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

  test("fitted holt beats or equals fixed smoothing in-sample") {
    val params = Forecast.holtParams(obs).collect()
    assert(params.nonEmpty)
    params.foreach { r =>
      val geo = r.getAs[String]("geo")
      val ind = r.getAs[String]("indicator")
      val values = obs.filter(col("geo") === geo && col("indicator") === ind)
        .orderBy("year").collect().map(_.getAs[Double]("value")).toSeq
      val (_, _, fixedSse) = holtFold(values, 0.8, 0.2)
      assert(r.getAs[Double]("sse") <= fixedSse + 1e-9,
        s"$geo/$ind fitted sse worse than fixed")
    }
  }

  test("gbt forecast emits a full recursive horizon per series") {
    val rows = ForecastQueries.gbtForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getAs[Double]("forecast").isNaN))
    val bySeries = rows.groupBy(r =>
      (r.getAs[String]("geo"), r.getAs[String]("indicator")))
    bySeries.values.foreach { grp =>
      assert(grp.length == Gbt.Horizon)
      val years = grp.map(_.getAs[Int]("year")).sorted
      assert(years.zip(years.tail).forall { case (a, b) => b == a + 1 },
        "horizon years must be consecutive")
    }
    // every horizon year is in the future of the observed panel
    val lastYears = obs.groupBy("geo", "indicator")
      .agg(max("year").as("ly")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Int]("ly")).toMap
    bySeries.foreach { case (k, grp) =>
      assert(grp.map(_.getAs[Int]("year")).min == lastYears(k) + 1)
    }
  }

  test("given-model gbt forecast matches the ml-scored path") {
    // the SQL-rendered ensemble (nested CASEs + left-associated
    // weighted sum) vs model.transform's tree walk + blas ddot over
    // the SAME recursion: branch decisions are exact (thresholds
    // round-trip through toString), so any drift could only come from
    // ddot's summation association — tolerance bounds it while the
    // keys must agree exactly
    val ml = ForecastQueries.gbtForecast(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Int]("year"))
        -> r.getAs[Double]("forecast")).toMap
    val given = ForecastQueries.gbtForecastGiven(spark, sf).collect()
    assert(given.nonEmpty)
    assert(given.length == ml.size)
    given.foreach { r =>
      val k = (r.getString(0), r.getString(1), r.getAs[Int]("year"))
      val g = r.getAs[Double]("forecast")
      val m = ml(k)
      assert(math.abs(g - m) <= 1e-9 * math.max(1.0, math.abs(m)),
        s"$k: given $g vs ml $m")
    }
  }

  test("running the given-model query registers its oracle") {
    ForecastQueries.gbtForecastGiven(spark, sf)
    val sql = ForecastQueries.oracles("gbt_forecast_given_model")
    // the oracle embeds the fitted ensemble: one weighted CASE per tree
    assert(sql.contains("CASE WHEN"))
    assert(sql.split("AS DOUBLE").length > 20,
      "expected strtod-exact double literals throughout")
    assert((1 to Gbt.Horizon).forall(k => sql.contains(s"st$k AS")))
  }

  test("given-model recursion matches ml path on 1-supervised-row series") {
    // a 4-year series has exactly ONE post-dropna row, so the horizon
    // starts from n = 1 and walks every lag/rolling fallback branch
    // (lag2 = lag3 = h1, 1- then 2-element rolling windows); the
    // 8-year series keeps the pooled fit trainable. Parity here pins
    // the rendered-ensemble scorer to model.transform on exactly the
    // fallback-shaped feature rows the sf panels never produce.
    import spark.implicits._
    val tiny = (
      (2000 to 2007).map(y => ("LONG", "P", y, 1000.0 + 37.5 * (y - 2000))) ++
      (2004 to 2007).map(y => ("SHORT", "P", y, 500.0 + 11.25 * (y - 2004)))
    ).toDF("geo", "indicator", "year", "value")
    val ml = Gbt.forecast(tiny).collect()
      .map(r => (r.getString(0), r.getAs[Int]("year"))
        -> r.getAs[Double]("forecast")).toMap
    val given = Gbt.forecastGiven(tiny).collect()
    assert(given.count(_.getString(0) == "SHORT") == Gbt.Horizon)
    assert(given.length == ml.size)
    given.foreach { r =>
      val k = (r.getString(0), r.getAs[Int]("year"))
      val g = r.getAs[Double]("forecast")
      assert(!g.isNaN)
      assert(math.abs(g - ml(k)) <= 1e-9 * math.max(1.0, math.abs(ml(k))),
        s"$k: given $g vs ml ${ml(k)}")
    }
  }

  test("given-model selection agrees with the ml-scored model_select") {
    // same series set; rmse_holt identical (shared path), rmse_gbt
    // within ddot-association tolerance; model_used agrees unless the
    // two candidates are within that tolerance of each other
    val ml = ForecastQueries.modelSelect(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val given = ForecastQueries.modelSelectGivenQ(spark, sf).collect()
    assert(given.nonEmpty && given.length == ml.size)
    given.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val m = ml(k)
      def d(row: org.apache.spark.sql.Row, c: String): Option[Double] =
        Option(row.getAs[java.lang.Double](c)).map(_.toDouble)
      val (gg, gm) = (d(r, "rmse_gbt"), d(m, "rmse_gbt"))
      assert(gg.isDefined == gm.isDefined, s"$k gbt candidacy")
      assert(d(r, "rmse_holt") == d(m, "rmse_holt"), s"$k holt rmse")
      for (a <- gg; b <- gm)
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, b), s"$k gbt rmse")
      val tol = (for (a <- gg; h <- d(r, "rmse_holt"))
        yield math.abs(a - h) <= 1e-6 * math.max(1.0, a)).getOrElse(false)
      if (!tol)
        assert(r.getAs[String]("model_used") == m.getAs[String]("model_used"),
          s"$k model_used")
    }
  }

  test("given-model forecast_series mirrors forecast_series per winner") {
    val given = ForecastQueries.forecastSeriesGivenQ(spark, sf).collect()
    assert(given.nonEmpty)
    val winners = ForecastQueries.modelSelectGivenQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[String]("model_used"))
      .toMap
    val obsCounts = obs.groupBy("geo", "indicator").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count"))
      .toMap
    val bySeries = given.groupBy(r => (r.getString(0), r.getString(1)))
    assert(bySeries.keySet == winners.keySet)
    bySeries.foreach { case (k, grp) =>
      val fut = grp.filter(_.getAs[String]("type") == "forecast")
      assert(fut.length == Gbt.Horizon, s"$k horizon rows")
      val hist = grp.filter(_.getAs[String]("type") == "historical")
      assert(hist.nonEmpty, s"$k history rows")
      // a gbt winner's history is the post-dropna supervised frame
      // (3 fewer rows than the full series); a holt winner's the full
      if (winners(k) == "gbt")
        assert(hist.length == obsCounts(k) - 3, s"$k gbt history")
      else assert(hist.length == obsCounts(k), s"$k holt history")
    }
  }

  test("model_select picks the lower holdout rmse of gbt vs holt") {
    val rows = ForecastQueries.modelSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gbt = Option(r.getAs[java.lang.Double]("rmse_gbt")).map(_.toDouble)
      val holt = Option(r.getAs[java.lang.Double]("rmse_holt")).map(_.toDouble)
      val used = r.getAs[String]("model_used")
      (gbt, holt) match {
        case (Some(g), Some(h)) =>
          assert(if (g <= h) used == "gbt" else used == "holt")
        case (Some(_), None) => assert(used == "gbt")
        case (None, Some(_)) => assert(used == "holt")
        case (None, None) => fail("series with no candidate model")
      }
    }
  }

  test("holt holdout rmse matches a train-prefix refit oracle") {
    val r0 = Forecast.holtHoldoutRmse(obs)
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .collect()
    assert(r0.length == 1)
    val values = obs
      .filter(col("geo") === "NATION_0" && col("indicator") === "1-URGENT")
      .orderBy("year").collect().map(_.getAs[Double]("value")).toSeq
    val ts = math.min(5, math.max(2, values.length / 3))
    val (_, _, l, b) = fitHolt(values.dropRight(ts))
    val test = values.takeRight(ts)
    val rmse = math.sqrt(test.zipWithIndex.map { case (x, i) =>
      val f = l + (i + 1) * b; (x - f) * (x - f)
    }.sum / ts)
    assert(math.abs(r0(0).getAs[Double]("rmse_holt") - rmse) < 1e-9)
  }

  test("forecast_series unions the winner's history and horizon") {
    val fs = ForecastQueries.forecastSeries(spark, sf)
    val sel = ForecastQueries.modelSelect(spark, sf).collect()
      .map(r => (r.getAs[String]("geo"), r.getAs[String]("indicator")) ->
        r.getAs[String]("model_used")).toMap
    val byType = fs.groupBy("geo", "indicator", "type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)) ->
        r.getAs[Long]("n")).toMap
    sel.foreach { case (k, used) =>
      assert(byType(k -> "forecast") == Forecast.Horizon, s"$k horizon rows")
      val nHist = byType(k -> "historical")
      // gbt history is the post-dropna supervised frame (3 fewer rows)
      if (used == "holt") assert(nHist >= 5)
      else assert(nHist >= 2)
    }
  }

  test("gap_fill interpolates planted gaps linearly and leaves observed rows alone") {
    import spark.implicits._
    // series A: years 2000..2005 missing 2002, 2003 -> linear ramp
    // 10 -> 40 interpolates 20, 30; series B: dense, untouched
    val obs = Seq(
      ("x", "A", 2000, 10.0), ("x", "A", 2001, 10.0), ("x", "A", 2004, 40.0),
      ("x", "A", 2005, 45.0),
      ("y", "B", 2010, 1.0), ("y", "B", 2011, 2.0))
      .toDF("geo", "indicator", "year", "value")
    val rows = Forecast.gapFill(obs).collect()
      .map(r => (r.getAs[String]("geo"), r.getAs[Int]("year")) ->
        (r.getAs[Double]("value_filled"), r.getAs[Boolean]("is_filled"))).toMap
    assert(rows.size == 8) // 6 years for A, 2 for B
    assert(rows(("x", 2002)) == (20.0, true))
    assert(rows(("x", 2003)) == (30.0, true))
    assert(rows(("x", 2001)) == (10.0, false))
    assert(rows(("x", 2005)) == (45.0, false))
    assert(rows(("y", 2010)) == (1.0, false))
    // on the real panel, filled rows are exactly the added rows
    val panel = graft.etl.Observations.panel(spark, sf)
    val filled = Forecast.gapFill(panel)
    assert(filled.filter(col("is_filled")).count() ==
      filled.count() - panel.count())
  }

  test("ols_trend matches a plain-Scala least-squares replay") {
    val rows = ForecastQueries.olsTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    val panel = graft.etl.Observations.panel(spark, sf)
      .select("geo", "indicator", "year", "value").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    rows.take(10).foreach { r =>
      val key = (r.getAs[String]("geo"), r.getAs[String]("indicator"))
      val pts = panel(key).map(p =>
        ((p.getAs[Int]("year") - 1998).toDouble,
          p.getAs[Double]("value") / 1000000))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope_m_per_year") - slope)
        < 1e-6 * math.max(1.0, math.abs(slope)), s"$key")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
  }

  test("forecast_backtest: rolling origins hit real observations, RMSE coheres") {
    val rows = ForecastQueries.holtBacktestQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val obs = graft.etl.Observations.panel(spark, sf)
      .select("geo", "indicator", "year", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getDouble(3)).toMap
    val bySeries = rows.groupBy(r =>
      (r.getAs[String]("geo"), r.getAs[String]("indicator")))
    bySeries.foreach { case ((g, i), fs) =>
      assert(fs.length == Forecast.BacktestFolds &&
        fs.head.getAs[Long]("n_folds") == Forecast.BacktestFolds)
      // each fold's held-out actual IS the observed value of its year
      fs.foreach { f =>
        assert(f.getAs[Double]("actual") ==
          obs((g, i, f.getAs[Int]("year"))))
        assert(f.getAs[Double]("err") ==
          f.getAs[Double]("forecast") - f.getAs[Double]("actual"))
      }
      // folds cover the series' last K OBSERVATIONS (years can gap),
      // strictly one origin per observation
      val years = fs.map(_.getAs[Int]("year")).sorted
      assert(years.distinct.length == years.length)
      assert(years.zip(years.tail).forall(p => p._2 > p._1))
      // the emitted RMSE is the fold errors' quadratic mean (up to
      // the decimal(27,6) quantize of each square)
      val sse = fs.map(f => math.pow(f.getAs[Double]("err"), 2)).sum
      val rmse = math.sqrt(sse / fs.length)
      assert(math.abs(fs.head.getAs[Double]("rmse_bt") - rmse)
        <= 1e-5 * math.max(1.0, rmse), s"series ($g,$i)")
    }
  }

  test("forecast_intervals: symmetric bands that widen with horizon") {
    val o = graft.etl.Observations.panel(spark, sf)
      .select("geo", "indicator", "year", "value")
    val rows = Forecast.forecastIntervals(o).collect()
    assert(rows.nonEmpty)
    val bySeries = rows.groupBy(r =>
      (r.getAs[String]("geo"), r.getAs[String]("indicator")))
    bySeries.foreach { case (key, fs) =>
      val byYear = fs.sortBy(_.getAs[Int]("year"))
      val widths = byYear.flatMap { r =>
        if (r.isNullAt(r.fieldIndex("lo"))) None
        else {
          val (f, lo, hi) = (r.getAs[Double]("forecast"),
            r.getAs[Double]("lo"), r.getAs[Double]("hi"))
          // symmetric around the point forecast (same double algebra
          // both sides of the ±)
          assert(lo <= f && f <= hi, s"band excludes forecast in $key")
          assert(math.abs((hi - f) - (f - lo))
            <= 1e-9 * math.max(1.0, hi - lo), s"asymmetric band in $key")
          Some(hi - lo)
        }
      }
      // naive √h widening: nondecreasing width over horizon (a 2-point
      // series emits no bands at all — widths empty is legal)
      if (widths.nonEmpty)
        assert(widths.zip(widths.tail).forall { case (a, b) => b >= a },
          s"band narrowed with horizon in $key")
    }
    // a 2-point series fits (E2 contract) but cannot estimate a
    // residual variance: null band, not fake certainty
    import spark.implicits._
    val two = Seq(("ZZ", "two", 2000, 1.0), ("ZZ", "two", 2001, 2.0))
      .toDF("geo", "indicator", "year", "value")
    val t = Forecast.forecastIntervals(two).collect()
    assert(t.nonEmpty && t.forall(r => r.isNullAt(r.fieldIndex("lo"))
      && r.isNullAt(r.fieldIndex("hi"))))
  }

  test("backtest_mase: fold parity with E11, ratio algebra, naive anchor") {
    val o = graft.etl.Observations.panel(spark, sf)
      .select("geo", "indicator", "year", "value")
    val mase = Forecast.backtestMase(o).collect()
    assert(mase.nonEmpty)
    // mae_holt recomputed from the E11 fold rows must match per series
    val e11 = Forecast.holtBacktest(o).collect()
      .groupBy(r => (r.getAs[String]("geo"), r.getAs[String]("indicator")))
    mase.foreach { m =>
      val key = (m.getAs[String]("geo"), m.getAs[String]("indicator"))
      val fs = e11(key)
      val maeH = fs.map(f => math.abs(f.getAs[Double]("err"))).sum / fs.length
      assert(math.abs(m.getAs[Double]("mae_holt") - maeH)
        <= 1e-5 * math.max(1.0, maeH), s"series $key")
      // the ratio is exactly mae_holt / mae_naive when naive MAE > 0
      val (mh, mn) = (m.getAs[Double]("mae_holt"),
        m.getAs[Double]("mae_naive"))
      if (mn > 0.0) assert(m.getAs[Double]("mase") == mh / mn)
      else assert(m.isNullAt(m.fieldIndex("mase")),
        "constant-tail series must yield null MASE, not infinity")
    }
    // the metric discriminates on the fixture: both sides of 1 appear
    val ratios = mase.filter(!_.isNullAt(5)).map(_.getAs[Double]("mase"))
    assert(ratios.exists(_ < 1.0), "no series where Holt beats naive")
    // a constant synthetic series anchors the null arm exactly
    import spark.implicits._
    val const = (2000 to 2009).map(y => ("ZZ", "const", y, 5.0))
      .toDF("geo", "indicator", "year", "value")
    val cm = Forecast.backtestMase(const).collect()(0)
    assert(cm.getAs[Double]("mae_naive") == 0.0 &&
      cm.isNullAt(cm.fieldIndex("mase")))
  }

  test("backtest_model_select: Holt folds bit-equal E11, winner by the tie rule") {
    val o = graft.etl.Observations.panel(spark, sf)
    val sel = Forecast.backtestModelSelect(o).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(sel.nonEmpty)
    // fold parity: the Holt side IS E11's rmse_bt, bit-for-bit
    val e11 = Forecast.holtBacktest(o)
      .select("geo", "indicator", "rmse_bt", "n_folds").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(sel.keySet == e11.keySet,
      "backtest_model_select covers a different series set than E11")
    sel.foreach { case (k, r) =>
      assert(r.getAs[Double]("rmse_bt_holt") ==
        e11(k).getAs[Double]("rmse_bt"), s"holt rmse diverged for $k")
      assert(r.getAs[Long]("n_folds") == Forecast.BacktestFolds.toLong)
      // winner rule: gbt iff scored and <= holt (ties -> gbt)
      val expected =
        if (!r.isNullAt(r.fieldIndex("rmse_bt_gbt")) &&
          r.getAs[Double]("rmse_bt_gbt") <= r.getAs[Double]("rmse_bt_holt"))
          "gbt" else "holt"
      assert(r.getAs[String]("model_used") == expected, s"winner for $k")
      // a scored GBT side always reports its fold count
      assert(r.isNullAt(r.fieldIndex("rmse_bt_gbt")) ==
        r.isNullAt(r.fieldIndex("n_folds_gbt")))
    }
    // the GBT side scored at least one series (the fixture has full
    // feature rows at the last origins)
    assert(sel.values.exists(!_.isNullAt(
      sel.values.head.fieldIndex("rmse_bt_gbt"))))
  }
}
