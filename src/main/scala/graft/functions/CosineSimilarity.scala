package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns in one fused pass (dot + both norms in a
  * single loop), with `doGenCode` emitting a primitive Java loop that
  * participates in whole-stage codegen.
  *
  * This is the preference-order-(b) custom operator of the build
  * brief: the composable form (`aggregate(zip_with(...))`) is
  * semantically identical but runs on Catalyst's *interpreted*
  * higher-order-function path and allocates an intermediate array per
  * row — measurable drag when a 100 TB scan evaluates millions of
  * similarity pairs per executor. Single-pass arithmetic is also the
  * formula the DuckDB oracle computes, keeping rankings aligned.
  *
  * Null semantics: null if either side is null (BinaryExpression
  * default); mismatched lengths raise, surfacing data corruption
  * instead of silently truncating.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"cosine_similarity: length mismatch $n vs ${y.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        |final int $n = $x.numElements();
        |if ($y.numElements() != $n) {
        |  throw new IllegalArgumentException(
        |    "cosine_similarity: length mismatch " + $n + " vs " + $y.numElements());
        |}
        |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double xv = $x.getDouble($i);
        |  final double yv = $y.getDouble($i);
        |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. Inputs must be array<double> (cast
    * upstream — [[graft.llm.Similarity]] casts float embeddings once
    * at load). */
  def apply(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpression(a), toExpression(b)))
}
