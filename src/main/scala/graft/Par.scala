package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallelism-derived partition counts.
  *
  * Operators must never hardcode partition counts: a literal
  * `repartition(16)` that spreads a single-file local scan caps a
  * 1000-executor cluster at 16 tasks. Everything here derives from
  * `sparkContext.defaultParallelism` (= total cores on a real
  * cluster), overridable via `spark.graft.parallelism`.
  */
object Par {

  /** Base task budget: conf override, else defaultParallelism. */
  def parallelism(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.parallelism")
      .map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
      .max(1)

  /** Repartition round-robin to `mult`× the task budget — used to
    * spread compute-heavy per-row work after a narrow scan (a single
    * parquet file arrives as ONE input partition) or after AQE's
    * byte-based coalescing would serialize CPU-bound work.
    */
  def spread(df: DataFrame, mult: Double = 1.0): DataFrame =
    df.repartition(math.max(1, math.round(parallelism(df.sparkSession) * mult).toInt))

  /** Repartition by key columns at the task budget (AQE leaves
    * user-specified counts alone).
    */
  def spreadBy(df: DataFrame, cols: String*): DataFrame =
    df.repartition(parallelism(df.sparkSession),
      cols.map(org.apache.spark.sql.functions.col): _*)

  /** Side length K of the all-pairs block grid: K(K+1)/2 cells ≈ 4×
    * the task budget, so the quadratic work lands evenly across the
    * cluster with a few waves per core.
    */
  def gridSide(spark: SparkSession): Int =
    math.max(2, math.ceil(math.sqrt(8.0 * parallelism(spark))).toInt)
}
