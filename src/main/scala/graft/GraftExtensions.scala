package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.DotF32

/** Session extensions: registers graft's native expressions into the
  * SQL function registry, so `spark.sql("SELECT dot_f32(a, b) ...")`
  * works on any cluster launched with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotF32(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotF32(exprs(0), exprs(1)), "built-in")
}
