package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Count-min sketch: the MERGEABLE frequency sketch (the member of
  * the sketch family for point-frequency queries, next to HLL =
  * distinct, Misra–Gries = heavy hitters, q-digest = rank). d = 4
  * rows × w = 256 columns of BIGINT counters; each input adds 1 to
  * one cell per row (bucket hᵢ(x)); the estimate for a key is the MIN
  * over its d cells — it can NEVER undercount (every occurrence of
  * the key landed in all d of its cells), and overcounts only by
  * colliding mass: E[overshoot] ≤ N/w per row, so the min over 4
  * rows overshoots more than εN with probability ≤ (1/(εw))⁴.
  *
  * Merge is element-wise ADDITION — the property that makes the
  * sketch distributable through partial aggregation (any merge tree
  * yields the identical 1024 counters, order-free BIGINT sums). The
  * conservative-update variant tightens point estimates but its
  * max-based update is NOT associative under merge, so the
  * distributed form is the textbook additive one (documented
  * trade-off, same reasoning as q-digest's bound-not-bytes contract —
  * except here the bytes ARE deterministic too).
  *
  * Hash: two Lehmer/MINSTD steps over (x mod 127773) with a per-row
  * salt — the repo's derandomized-coin spelling ([[graft.llm.Events]]
  * bootstrap), chosen so the ENTIRE sketch is recomputable as a
  * DuckDB GROUP BY and the driver hash pins every counter.
  *
  * Buffer: one flat long[1024] (8 KB), map-side combinable through
  * ObjectHashAggregate like the repo's other typed aggregates. */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMinAgg.{Depth, Width, bucket}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < Depth) {
        buf(i * Width + bucket(x, i)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object CountMinAgg {
  val Depth = 4
  val Width = 256

  /** Row-i bucket of key x — MUST stay textually parallel to the
    * oracle SQL spelling (two MINSTD steps, per-row salt, mod 256);
    * nonnegative throughout for x ≥ 0, every intermediate < 2⁶³. */
  def bucket(x: Long, i: Int): Int =
    (((16807L * ((16807L * ((x % 127773L) * (31L + i * 2L) + i * 7L + 3L))
      % 2147483647L)) % 2147483647L) % Width).toInt

  /** Point estimate from a collected sketch: min over the d cells. */
  def estimate(cells: IndexedSeq[Long], key: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val c = cells(i * Width + bucket(key, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Column-API entry: sketch a long column. Output: array<bigint>
    * of the d·w counters, row-major. */
  def build(value: Column): Column =
    toColumn(new CountMinAgg(toExpression(value)).toAggregateExpression())
}
