package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text-corpus pipeline runs before hashing/dedup, since the same
  * visible text can arrive composed (é) or decomposed (e + U+0301)
  * and byte-keyed operators (fingerprints, exact dedup, shuffle keys)
  * would treat the two as different documents.
  *
  * A custom expression because Spark exposes no Unicode normalizer as
  * a built-in function; the JDK's `java.text.Normalizer` is the
  * reference implementation, shared verbatim by eval and codegen via
  * [[NfcNormalize.norm]]. The generated code is a single static call,
  * so the expression stays inside whole-stage codegen (no UDF serde,
  * no fallback to interpreted projection).
  *
  * ASCII fast path: NFC can only change code points ≥ U+00C0, and
  * UTF8String knows its byte length vs its code-point count — when
  * all bytes are ASCII the input object is returned unchanged (no
  * String materialization, no re-encode), which at 100 TB is the
  * overwhelmingly common branch. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.norm($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column = toColumn(NfcNormalize(toExpression(c)))

  /** Static normalization kernel, called from both interpreted eval
    * and generated code. */
  def norm(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s // pure-ASCII: NFC is the identity
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}
