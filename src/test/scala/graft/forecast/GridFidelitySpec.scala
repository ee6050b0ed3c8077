package graft.forecast

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E2's documented substitution (grid-fit Holt for statsmodels'
  * continuous optimizer) bounded by a NUMBER: on every gate series,
  * the 121-pair coarse grid's in-sample SSE is compared to a
  * 2401-pair refined grid (α, β ∈ {0.02, 0.04, …, 0.98} — the 1/50
  * stepping a near-continuous optimizer would localize within), and
  * the worst-case ratio is pinned. The refined grid is 20× the
  * fold work per series, which is why the engine ships the coarse
  * grid as default; this spec is the measured cost of that choice.
  */
class GridFidelitySpec extends SparkSpec {

  test("coarse-grid SSE within the pinned factor of a 1/50-step grid " +
      "on every gate series") {
    val obs = graft.etl.Observations.build(spark, sf)
    val series = Forecast.seriesArrays(obs).localCheckpoint(true)
    val fine = (1 to 49).map(_ / 50.0)
    def sseOf(grid: Seq[Double]) = series
      .withColumn("fit",
        graft.plans.VectorExpressions.holtGridFit(col("vs"), grid))
      .filter(col("fit").isNotNull)
      .select(col("geo"), col("indicator"), col("fit.sse").as("sse"))
    val joined = sseOf(Forecast.GridValues.map(identity))
      .withColumnRenamed("sse", "sse_coarse")
      .join(sseOf(fine).withColumnRenamed("sse", "sse_fine"),
        Seq("geo", "indicator"))
      .collect()
    assert(joined.nonEmpty)
    val ratios = joined.map { r =>
      val c = r.getAs[Double]("sse_coarse")
      val f = r.getAs[Double]("sse_fine")
      if (f == 0.0) { assert(c == 0.0); 1.0 } else c / f
    }
    val worst = ratios.max
    val p90 = ratios.sorted.apply((ratios.length * 9) / 10 - 1)
    info(f"series=${ratios.length} worst=$worst%.4f p90=$p90%.4f")
    // the documented fidelity bound (SURVEY §2 E2): measured on the
    // 125 gate series — worst 1.1135, p90 1.0277: the coarse grid
    // costs at most ~11% in-sample SSE on the worst series and ≤3%
    // for 90% of them
    assert(worst <= 1.12,
      f"coarse grid lost $worst%.4f x SSE vs the refined grid")
    assert(p90 <= 1.03, f"p90 ratio $p90%.4f — grid too coarse broadly")
  }
}
