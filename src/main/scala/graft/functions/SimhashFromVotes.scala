package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: fold 16 lane-packed SimHash vote
  * counters (4×16-bit set-bit counts per long — see
  * [[graft.llm.Dedup.simhashPairs]]) plus the token count into the
  * 64-bit signature. Bit b is set iff a majority of token hashes set
  * it: `2·cnt_b > n`.
  *
  * Exists for codegen economy, not expressiveness: the equivalent
  * declarative form is a 64-term `when(...).otherwise(...)` OR-reduce
  * whose generated Java ran to hundreds of branches — one of the
  * largest single JIT-compilation bills in the benchmark (the bench
  * times every query cold, so Janino + C2 compile time IS query
  * time). This expression emits one 64-iteration loop instead; the
  * signature bits are identical.
  */
case class SimhashFromVotes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_votes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val packed = a.asInstanceOf[ArrayData]
    val n = b.asInstanceOf[Long]
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      val cnt = (packed.getLong(bit / 4) >>> ((bit % 4) * 16)) & 0xFFFFL
      if (2 * cnt > n) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (packed, n) => {
      val sig = ctx.freshName("sig")
      val bit = ctx.freshName("bit")
      val cnt = ctx.freshName("cnt")
      s"""
        |long $sig = 0L;
        |for (int $bit = 0; $bit < 64; $bit++) {
        |  final long $cnt = ($packed.getLong($bit / 4) >>> (($bit % 4) * 16)) & 0xFFFFL;
        |  if (2 * $cnt > $n) $sig |= 1L << $bit;
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SimhashFromVotes {
  /** Column-API entry point: `packed` is array<long> of 16 lane-packed
    * vote counters, `n` the per-doc token count. */
  def apply(packed: Column, n: Column): Column =
    toColumn(SimhashFromVotes(toExpression(packed), toExpression(n)))
}
