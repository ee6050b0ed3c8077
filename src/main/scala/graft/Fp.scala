package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic float aggregation.
  *
  * Double summation is order-dependent, and `round()` semantics differ
  * between engines at exact .xx5 boundaries — so oracle-compared
  * aggregates never sum raw doubles and never re-round them. Instead:
  * quantize each value to DECIMAL(27,6) (exact for any ≤6-dp source
  * value), sum exactly (order-independent), then cast back. Identical
  * doubles come out of both engines bit-for-bit.
  *
  * SQL mirrors: [[graft.Fp.sqlSum2]] / [[sqlSum6]] / [[sqlAvg]].
  */
object Fp {

  /** Exact sum quantized to 2 decimals (money-style outputs). */
  def dsum2(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("decimal(38,2)").cast("double")

  /** Exact sum at 6-decimal quantization. */
  def dsum6(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double")

  /** Deterministic mean: exact decimal sum, then one double division. */
  def davg(c: Column): Column = dsum6(c) / count(c)

  // round() (not a decimal cast): DuckDB's decimal→decimal downscale
  // cast truncates, but round() on an exact decimal rounds half away
  // from zero — matching Spark's HALF_UP decimal cast.
  def sqlSum2(x: String): String =
    s"CAST(round(sum(CAST(($x) AS DECIMAL(27,6))), 2) AS DOUBLE)"

  def sqlSum6(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(27,6))) AS DOUBLE)"

  def sqlAvg(x: String): String =
    s"(${sqlSum6(x)} / count($x))"
}
