package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §4):
  * a whole-stage-codegen dot product over `array<float>` columns.
  *
  * Spark's higher-order functions evaluate lambdas interpretively
  * (one closure dispatch per element); this generates a tight
  * primitive double loop instead — the shape the knn prefilter and
  * any 100 TB pairwise scan wants. Left-to-right summation order is
  * fixed, so results are stable across runs/partitionings (though
  * not decimal-quantized: oracle-compared outputs still go through
  * graft.sim.Vectors.dot).
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the codegen'd dot product. */
  def dotF32(x: Column, y: Column): Column =
    Bridge.column(DotF32(Bridge.expression(x), Bridge.expression(y)))
}
