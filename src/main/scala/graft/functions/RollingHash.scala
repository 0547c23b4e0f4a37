package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling content hash over a string's UTF-8
  * bytes: h = Σ h·31 + bᵢ with wrapping long arithmetic — the
  * Karp-Rabin-style document fingerprint of the training-data
  * pipeline (byte-order sensitive, incremental, cheap).
  *
  * A custom expression because composable SQL can't do this under
  * ANSI mode (multiplication wraps by design, which `*` on BIGINT
  * rejects); inside our own `doGenCode` the Java semantics are
  * exactly the wrap we want, and the loop stays JIT-compact. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xFFL); i += 1 }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        |final byte[] $bytes = $s.getBytes();
        |long $h = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) {
        |  $h = $h * 31L + ($bytes[$i] & 0xFFL);
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def apply(c: Column): Column = toColumn(RollingHash(toExpression(c)))
}
