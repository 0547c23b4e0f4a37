package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Typed imperative aggregate computing the upper-triangle Gram
  * matrix XᵀX of a quantized-vector column in ONE buffer: a flat
  * long[d(d+1)/2 + 1] where slot 0 counts rows and slot
  * 1 + i·(2d−i+1)/2 + (j−i) accumulates Σ qᵢ·qⱼ.
  *
  * Why imperative instead of the nested-transform + explode form:
  * the declarative plan materializes d(d+1)/2 struct rows PER VECTOR
  * (10.4M rows at sf0.1) just to re-collapse them in the aggregate —
  * correct, join-free, but the intermediate dominates wall-clock.
  * Here the outer product never leaves a tight primitive loop over
  * the row's own array, the buffer map-side combines through
  * ObjectHashAggregate, and the shuffle carries ONE fixed-size
  * triangle per task. Same output, bit for bit (GraphSpec pins
  * agg ≡ explode form).
  *
  * Input contract: NULL vectors are skipped (standard SQL aggregate
  * null semantics); a vector of the WRONG LENGTH or with a NULL
  * coordinate throws — silently excluding it would skew `n` and the
  * sums relative to the explode/self-join formulation, the kind of
  * divergence that must fail loudly, not hash-mismatch downstream.
  *
  * Dimension envelope: the buffer is one flat long[d(d+1)/2 + 1] per
  * aggregation state — 2 081 longs (~16 KB) at d=64, 32 897 (~263 KB)
  * at d=256 (map-side combine still holds; pinned in GramAggSpec).
  * Beyond ~1k dims the triangle crosses ~4 MB/state — switch to
  * [[BlockedGram.gram]], which computes the same triangle in bs×bs
  * [[CrossGramAgg]] rectangles with bounded state at any d
  * (bit-equivalence pinned in GramAggSpec). */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dim * (dim + 1) / 2

  // static schema check: when the array type guarantees non-null
  // elements the per-row null scan is skipped entirely
  private lazy val mayHaveNullElements = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("s", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](cells + 1)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"gram_agg: vector of length ${arr.numElements()} in a dim=$dim aggregate" +
            " — ragged input would silently skew n and the sums")
      if (mayHaveNullElements) {
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i))
            throw new IllegalArgumentException(
              s"gram_agg: null coordinate at index $i (dim=$dim)")
          i += 1
        }
      }
      buf(0) += 1L
      val q = arr.toLongArray()
      var i = 0
      var idx = 1
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) {
          buf(idx) += qi * q(j)
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var i = 0
    var idx = 1
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(idx - 1) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buf(0), buf(idx)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((cells + 1) * 8)
    var i = 0
    while (i <= cells) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object GramAgg {
  /** Column-API entry point: aggregate an `array<bigint>` quantized
    * vector column of length `dim` into the upper-triangle Gram cells
    * `array<struct<i,j,n,s>>`. */
  def apply(v: Column, dim: Int): Column =
    toColumn(new GramAgg(toExpression(v), dim).toAggregateExpression())
}
