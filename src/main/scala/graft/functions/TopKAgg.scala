package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k buffer: entries sorted best-first, "better" =
  * higher sort_key, ties to the lower id (a total order, so results
  * are deterministic). */
final class TopKBuffer(val k: Int) {
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def better(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
    ka > kb || (ka == kb && ia < ib)

  def insert(key: Long, id: Long): Unit = {
    if (size == k && !better(key, id, keys(k - 1), ids(k - 1))) return
    var pos = if (size == k) k - 1 else size
    if (size < k) size += 1
    while (pos > 0 && better(key, id, keys(pos - 1), ids(pos - 1))) {
      keys(pos) = keys(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    keys(pos) = key; ids(pos) = id
  }
}

/** Typed imperative aggregate: top-k (sort_key, id) pairs per group,
  * as `array<struct<sort_key bigint, id bigint>>` ordered best-first
  * (sort_key desc, id asc tiebreak).
  *
  * This is the GROUPED TakeOrderedAndProject Spark lacks: the
  * standard formulation (`row_number() OVER (PARTITION BY k ORDER BY
  * v DESC) <= K`) shuffles EVERY row to its key's partition and
  * fully sorts each partition — at 100 TB the shuffle is the corpus.
  * A bounded per-group buffer is map-side combinable through
  * ObjectHashAggregate: each task keeps ≤ k rows per key, the
  * shuffle carries ≤ k·tasks rows per key, and nothing is ever
  * globally sorted. Same plan-shape argument as the per-partition
  * heaps TakeOrderedAndProject uses for the global top-k.
  *
  * Null sort keys / ids are skipped (SQL aggregate convention).
  */
case class TopKAgg(
    sortKey: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(sortKey, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sort_key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, row: InternalRow): TopKBuffer = {
    val a = sortKey.eval(row)
    val b = id.eval(row)
    if (a != null && b != null)
      buf.insert(a.asInstanceOf[Long], b.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b2.size) { b1.insert(b2.keys(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      new GenericInternalRow(Array[Any](buf.keys(i), buf.ids(i)))
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    // entries arrive best-first and insert preserves order — linear
    while (i < n) { buf.insert(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column-API entry point: top-k rows per group by `sortKey` desc
    * (ties → lower `id`), as an array of (sort_key, id) structs. */
  def apply(sortKey: Column, id: Column, k: Int): Column =
    toColumn(new TopKAgg(toExpression(sortKey), toExpression(id), k)
      .toAggregateExpression())
}
