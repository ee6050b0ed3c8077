package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2 G3).
  *
  * All reductions quantize each product term to DECIMAL(24,12) and sum
  * exactly, for the same reason as [[graft.Fp]]: double folds are
  * order-dependent and the DuckDB oracle computes the same reduction
  * relationally. 1e-12 quantization is far below embedding noise and
  * far above double ulps, so ranking behavior is unaffected.
  *
  * Everything is `functions._`/higher-order — no UDF, no
  * serialization; arrays stay in Tungsten format.
  */
object Vectors {

  private def qsum(terms: String): String =
    s"""cast(aggregate($terms, cast(0 as decimal(24,12)),
       |  (acc, v) -> cast(acc + v as decimal(24,12))) as double)""".stripMargin

  private def products(x: String, y: String): String =
    s"""zip_with($x, $y, (xv, yv) ->
       |  cast(cast(xv as double) * cast(yv as double) as decimal(24,12)))""".stripMargin

  /** Quantized-exact dot product of two float-array columns. */
  def dot(x: String, y: String): Column = expr(qsum(products(x, y)))

  /** Fast codegen'd dot ([[graft.plans.DotF32]]) — NOT decimal-
    * quantized; used as a prefilter so the exact decimal dot only
    * runs near the decision boundary (the double fold is within
    * ~1e-12 relative of the quantized value, so a 1e-6 margin is
    * conservative).
    */
  def dotFast(x: String, y: String): Column =
    graft.plans.VectorExpressions.dotF32(col(x), col(y))

  /** Squared L2 norm. */
  def normSq(x: String): Column = expr(qsum(products(x, x)))

  def l2Norm(x: String): Column = sqrt(normSq(x))

  /** Cosine similarity from precomputed squared norms. */
  def cosineFrom(dotCol: Column, normSqX: Column, normSqY: Column): Column =
    dotCol / (sqrt(normSqX) * sqrt(normSqY))

  /** DuckDB mirror: the same quantized dot, relationally, as a scalar
    * subquery over dimension indexes. `x`/`y` are list-typed SQL
    * expressions; dims is the dimensionality.
    */
  def sqlDot(x: String, y: String, dims: Int): String =
    s"""(SELECT CAST(sum(CAST(CAST($x[CAST(i AS INT)] AS DOUBLE)
       |  * CAST($y[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(24,12))) AS DOUBLE)
       |  FROM UNNEST(range(1, ${dims + 1})) u(i))""".stripMargin
}
