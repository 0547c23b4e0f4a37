package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass shingle hasher — see [[ShingleHashes]].
  *
  * A lone top-level object so scalac emits a static-forwarder mirror
  * class: generated whole-stage-codegen Java can call
  * `graft.functions.ShingleHasher.compute(text, n)` directly.
  */
object ShingleHasher {

  private val Seed = 42L

  /** ASCII whitespace, byte-wise — exactly Java regex `\s` =
    * `[ \t\n\f\r]` (UTF-8 continuation bytes are ≥ 0x80, so a
    * byte-level scan is multibyte-safe). */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)

  /** Mix the current n-token window (ring buffer, oldest at `start`)
    * into one order-sensitive 64-bit shingle hash by chaining
    * `XXH64.hashLong` — collision-free-in-practice identity for the
    * word n-gram, built from n long-mixes instead of re-hashing the
    * shingle's concatenated bytes. */
  private def combine(ring: Array[Long], start: Int, cnt: Int, n: Int): Long = {
    var h = Seed
    var k = 0
    while (k < cnt) {
      h = XXH64.hashLong(ring((start + k) % n), h)
      k += 1
    }
    h
  }

  /** Distinct 64-bit word-n-gram shingle hashes of `text` in ONE pass
    * over its UTF-8 bytes: tokenize on whitespace runs (leading /
    * trailing whitespace falls out), hash each token zero-copy with
    * `XXH64.hashUnsafeBytes`, keep a ring of the last n token hashes,
    * emit one combined hash per window position, then sort-dedupe.
    * Docs with < n tokens degrade to one whole-doc shingle (hash of
    * all token hashes in order), mirroring the string form's
    * `concat_ws(" ", tok)` fallback; empty/all-whitespace docs emit
    * the empty-token hash so they still carry set semantics. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val ring = new Array[Long](n)
    var tokens = 0
    var out = new Array[Long](math.max(16, len / 8))
    var outLen = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(Platform.getByte(base, off + i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(Platform.getByte(base, off + i))) i += 1
        ring(tokens % n) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        tokens += 1
        if (tokens >= n) {
          if (outLen == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(outLen) = combine(ring, tokens % n, n, n)
          outLen += 1
        }
      }
    }
    if (tokens == 0) {
      out(0) = XXH64.hashLong(XXH64.hashUnsafeBytes(base, off, 0, Seed), Seed)
      outLen = 1
    } else if (tokens < n) {
      out(0) = combine(ring, 0, tokens, n)
      outLen = 1
    }
    java.util.Arrays.sort(out, 0, outLen)
    var uniq = 0
    var j = 0
    while (j < outLen) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, uniq))
  }

  /** POSITIONAL variant of [[compute]]: one hash per window position,
    * in token order, NO sort-dedupe — element i is the identity of
    * the n-gram starting at token i, so `posexplode` over it yields
    * (position, gram-hash) directly. Docs with < n tokens emit an
    * EMPTY array (a positional gram is undefined there — matches the
    * span detector's CASE guard, not [[compute]]'s whole-doc
    * fallback). Same one-pass zero-copy tokenization. */
  def computeOrdered(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    val ring = new Array[Long](n)
    var tokens = 0
    var out = new Array[Long](math.max(16, len / 8))
    var outLen = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(Platform.getByte(base, off + i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(Platform.getByte(base, off + i))) i += 1
        ring(tokens % n) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        tokens += 1
        if (tokens >= n) {
          if (outLen == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(outLen) = combine(ring, tokens % n, n, n)
          outLen += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Native Catalyst expression: distinct 64-bit hashes of the word
  * n-gram shingle set of a string column — the MinHash front-end
  * ([[graft.llm.Dedup.minhashPairs]]).
  *
  * Exists because the declarative form
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text), ...))))`) runs on Catalyst's higher-order-
  * function path — CodegenFallback, per-element lambda interpretation
  * — and materializes every 5-gram as a STRING before hashing it:
  * ~5× the corpus bytes allocated, copied, and hashed per pass. This
  * expression hashes each token once, zero-copy, and derives window
  * hashes from token hashes (n long-mixes per shingle), staying
  * inside whole-stage codegen via a single static call. Under a
  * collision-free hash the output is the same shingle SET identity —
  * Jaccard over these hashes ≡ Jaccard over shingle strings (pinned
  * in DedupSpec against the string form).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHasher.compute(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHasher.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column-API entry point: word n-gram shingle hash set of `text`. */
  def apply(text: Column, n: Int): Column =
    toColumn(ShingleHashes(toExpression(text), n))
}

/** Positional sibling of [[ShingleHashes]]: element i is the 64-bit
  * identity of the word n-gram STARTING AT TOKEN i (no dedupe, no
  * sort), so `posexplode` yields (position, gram) pairs for
  * alignment-diagonal span detection without the interpreted
  * higher-order transform (ArrayTransform is CodegenFallback — it
  * cost the span detector most of its runtime). < n tokens ⇒ empty
  * array. */
case class ShingleHashesOrdered(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_ordered"

  override def nullSafeEval(t: Any): Any =
    ShingleHasher.computeOrdered(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHasher.computeOrdered($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesOrdered {
  /** Column-API entry point: positional word n-gram hashes of `text`. */
  def apply(text: Column, n: Int): Column =
    toColumn(ShingleHashesOrdered(toExpression(text), n))
}
