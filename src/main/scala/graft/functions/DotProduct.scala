package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product of two `array<double>` columns as one compact
  * codegen'd loop.
  *
  * Why not compose from built-ins: `aggregate(zip_with(...))` runs on
  * the interpreted higher-order path; literal expansion into
  * Σ element_at(v,j)·wⱼ generates thousands of bytecodes per plane —
  * past the JVM's HugeMethodLimit the method is never JIT-compiled
  * and runs interpreted (measured: a 16-plane LSH bucket column built
  * that way was ~20× slower at sf0.1 than this loop). A ~30-bytecode
  * loop body stays JIT-hot no matter how many planes call it. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"dot_product: length mismatch $n vs ${y.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        |final int $n = $x.numElements();
        |if ($y.numElements() != $n) {
        |  throw new IllegalArgumentException(
        |    "dot_product: length mismatch " + $n + " vs " + $y.numElements());
        |}
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += $x.getDouble($i) * $y.getDouble($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
