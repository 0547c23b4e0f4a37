package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Typed imperative aggregate computing a full MinHash signature in
  * one buffer: element i holds min over rows of gᵢ = h1 XOR
  * rotl(h2, i) — the same XOR-rotate family as the column-per-hash
  * formulation (`min(h1 ^ rotl(h2, i)) for i < hashes`), bit for bit.
  *
  * Why an imperative aggregate instead of 64 `min(...)` columns: the
  * declarative form generates one enormous whole-stage-codegen class
  * (64 aggregate buffers × the shift/xor expression each), and Janino
  * compilation of that class costs more wall-clock than the actual
  * 100 TB-relevant work at harness scale. This is the one place the
  * build plan (SURVEY.md §7.4) budgeted typed-aggregate machinery:
  * per-row work is a tight 64-iteration primitive loop, the buffer is
  * a plain long[64], partial aggregation (map-side combine) works
  * through ObjectHashAggregate, and the shuffle still carries one
  * fixed-size signature per doc.
  *
  * Null inputs are ignored (xxhash64 upstream never produces them;
  * defensive anyway).
  */
case class MinHashAgg(
    h1: Expression,
    h2: Expression,
    hashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(hashes)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val a = h1.eval(row)
    val b = h2.eval(row)
    if (a != null && b != null) {
      val x = a.asInstanceOf[Long]
      val y = b.asInstanceOf[Long]
      var i = 0
      while (i < hashes) {
        // identical to the declarative rotl: shifts are mod-64, so
        // i=0 degenerates to y itself on both paths
        val g = x ^ java.lang.Long.rotateLeft(y, i)
        if (g < buf(i)) buf(i) = g
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < hashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(hashes * 8)
    var i = 0
    while (i < hashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(hashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object MinHashAgg {
  /** Column-API entry point: aggregate two long hash columns into an
    * array<bigint> signature of length `hashes`. */
  def apply(h1: Column, h2: Column, hashes: Int): Column =
    toColumn(new MinHashAgg(toExpression(h1), toExpression(h2), hashes)
      .toAggregateExpression())
}
