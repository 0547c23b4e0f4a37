package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Hand-rolled HyperLogLog register sketch as a typed imperative
  * aggregate — the repo-owned counterpart to the DataSketches wrapper
  * in `q_sketch_merge`, built so the SKETCH ITSELF is a first-class
  * mergeable value the engine controls: per-shard register arrays
  * materialize once (map-side combinable, the buffer is a plain
  * byte[2^p]), persist as ordinary `array<int>` columns, and any later
  * shard combination is answered by [[HllUnionAgg]] (element-wise max)
  * plus a fully declarative estimator — no rescan, no opaque binary
  * blob, no library dependency. This is the incremental pattern
  * (dedup signature stores, IVF centroid memos) applied to
  * cardinality: COUNT(DISTINCT) over any union of day-partitions
  * becomes bytes-per-shard work.
  *
  * Standard Flajolet–Fuss–Gandouet–Meunier layout over a 64-bit hash
  * (cf. the HLL paper and Spark's own `HyperLogLogPlusPlusHelper`,
  * reimplemented independently): bucket = top p bits, rank = leading
  * zeros of the remaining 64−p bits + 1 (the p low zero bits shifted
  * in by `h << p` can never win — set bits of the remainder land in
  * positions p..63, so rank ≤ 64−p naturally). Registers hold the max
  * rank seen; max is associative/commutative/idempotent, which is
  * what makes build-merge and union-merge give IDENTICAL registers to
  * a single global build — SketchesSpec pins that equality exactly,
  * not approximately.
  *
  * Determinism: the hash input is `xxhash64` (seeded, engine-fixed),
  * the registers are integer state, and the estimator below performs
  * a fixed chain of IEEE ops on exact integers — same value on every
  * run and every partitioning. Null hashes are skipped so the sketch
  * agrees with COUNT(DISTINCT)'s null-ignoring contract.
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 18, s"p=$p out of the sane HLL range [4,18]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p
      // w == 0 → all 64−p remainder bits zero → max rank 64−p+1
      val rank = if (w == 0L) 64 - p + 1
                 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Union-merge of already-built register arrays: element-wise max.
  * Input is the `array<int>` a [[HllAgg]] emitted; output is the same
  * shape, so unions nest (day → month → year rollups merge the merged). */
case class HllUnionAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_union_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == m,
        s"register width ${arr.numElements()} != expected $m — sketches built with different p")
      var i = 0
      while (i < m) {
        val r = arr.getInt(i)
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object HllAgg {
  /** Build a 2^p-register sketch from a long hash column (null hashes
    * skipped, matching COUNT(DISTINCT)). */
  def build(hash: Column, p: Int): Column =
    toColumn(new HllAgg(toExpression(hash), p).toAggregateExpression())

  /** Union-merge already-built register arrays (element-wise max). */
  def union(registers: Column, p: Int): Column =
    toColumn(new HllUnionAgg(toExpression(registers), 1 << p)
      .toAggregateExpression())

  /** Declarative HLL estimator over a register array column — the
    * standard raw estimate α_m·m²/Σ2^(−M_j) with the small-range
    * linear-counting correction (E ≤ 2.5m and empty registers exist →
    * m·ln(m/V)). Runs on the grouped sketch frame (shard-count rows),
    * entirely in `functions._` — 0.5^r is an exact power of two and
    * the sum order over the array is fixed, so the estimate is
    * bit-deterministic. */
  def estimate(registers: Column, p: Int): Column = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val sumInv = aggregate(
      transform(registers, r => pow(lit(0.5), r)),
      lit(0.0), (acc, x) => acc + x)
    val zeros = size(filter(registers, r => r === 0))
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / sumInv
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Published standard error of the estimator: 1.04/√m. */
  def stdError(p: Int): Double = 1.04 / math.sqrt((1 << p).toDouble)
}
