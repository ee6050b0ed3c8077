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

/** All-k MinHash signature in one pass: for each of `numHashes` LCG
  * permutations `(a_k·x + b_k) mod p`, the minimum over the input
  * hash array. Replaces a nested transform/array_min lambda chain
  * (interpreted, boxed) with a primitive double loop — identical
  * integer arithmetic to the DuckDB oracle and the HOF formulation.
  */
case class MinHashSig(child: Expression, numHashes: Int, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)

  private def aK(k: Int): Long = (1103515245L * (k + 1) + 12345L) % p
  private def bK(k: Int): Long = (1103515245L * (k + 101) + 12345L) % p

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val a = aK(k); val b = bK(k)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * xs.getLong(i) + b) % p
        if (v < m) m = v
        i += 1
      }
      out(k) = m
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $xs.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $k = 0; $k < $numHashes; $k++) {
         |  long $a = (1103515245L * ($k + 1) + 12345L) % ${p}L;
         |  long $b = (1103515245L * ($k + 101) + 12345L) % ${p}L;
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($a * $xs.getLong($i) + $b) % ${p}L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$k] = $m;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for the codegen'd dot product. */
  def dotF32(x: Column, y: Column): Column =
    Bridge.column(DotF32(Bridge.expression(x), Bridge.expression(y)))

  def minhashSig(xs: Column, numHashes: Int, p: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(xs), numHashes, p))
}
