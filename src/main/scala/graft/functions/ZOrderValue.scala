package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit Z-order (Morton) value of two
  * key columns — bit-interleaves the low 32 bits of each so that
  * sorting by the result clusters rows that are close in BOTH
  * dimensions.
  *
  * This is the multi-dimensional data-clustering primitive: parquet
  * row-group min/max stats (and file-level pruning) only help when
  * the layout correlates with the predicate columns, and a linear
  * sort only clusters its leading column. Z-ordering the write makes
  * 2-D box predicates skip most row groups on EITHER column — the
  * standard lakehouse layout trick, here as a pure expression so the
  * write is just `repartitionByRange(zorder).sortWithinPartitions`.
  *
  * Bit-spreading uses the binary-magic-numbers scheme (public-domain
  * "Bit Twiddling Hacks" formulation): straight-line codegen, no
  * loops, no branches. Inputs are masked to their low 32 bits —
  * callers with wider domains range-compress first (the harness keys
  * are well inside 2³²).
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderValue.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave: bits of `a` at even positions, `b` at odd. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  /** Column-API entry point; inputs cast to long upstream. */
  def apply(a: Column, b: Column): Column =
    toColumn(ZOrderValue(toExpression(a), toExpression(b)))
}
