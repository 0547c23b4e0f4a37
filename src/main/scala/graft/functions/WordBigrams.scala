package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static bigram builder shared by eval and codegen — see
  * [[WordBigrams]]. */
object WordBigramBuilder {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)

  /** "tokᵢ tokᵢ₊₁" strings for consecutive whitespace-delimited
    * tokens, in one pass over the UTF-8 bytes (same tokenizer as
    * [[ShingleHasher]]: ASCII whitespace runs ≡ Java regex `\s+`,
    * multibyte-safe). Each bigram is a single byte-copy into a fresh
    * UTF8String; < 2 tokens ⇒ empty array. */
  def compute(text: UTF8String): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    var out = new Array[UTF8String](math.max(8, len / 8))
    var outLen = 0
    var prevStart = -1
    var prevLen = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(Platform.getByte(base, off + i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(Platform.getByte(base, off + i))) i += 1
        val tokLen = i - start
        if (prevStart >= 0) {
          val bytes = new Array[Byte](prevLen + 1 + tokLen)
          Platform.copyMemory(base, off + prevStart,
            bytes, Platform.BYTE_ARRAY_OFFSET, prevLen)
          bytes(prevLen) = ' '
          Platform.copyMemory(base, off + start,
            bytes, Platform.BYTE_ARRAY_OFFSET + prevLen + 1, tokLen)
          if (outLen == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(outLen) = UTF8String.fromBytes(bytes)
          outLen += 1
        }
        prevStart = start
        prevLen = tokLen
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen).asInstanceOf[Array[Any]])
  }
}

/** Native Catalyst expression: consecutive word-bigram strings of a
  * text column in one fused byte pass.
  *
  * The declarative form (`transform(sequence(0, n−2), i =>
  * concat(element_at(tok, i+1), ' ', element_at(tok, i+2)))`) runs
  * on the interpreted higher-order-function path: one lambda
  * interpretation + two array probes per bigram — the whole cost of
  * `q_bigram_topk` at sf0.1 was that interpreter loop over ~10⁶
  * bigrams. Output strings are identical (pinned in CurationSpec? —
  * DedupSpec hosts the tokenizer-equivalence tests), so the DuckDB
  * oracle is untouched.
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  override def nullSafeEval(t: Any): Any =
    WordBigramBuilder.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordBigramBuilder.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordBigrams {
  def apply(text: Column): Column = toColumn(WordBigrams(toExpression(text)))
}
