package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Rectangular cross-Gram aggregate: Σ aᵢ·bⱼ over every (i, j) of two
  * length-`dim` quantized vectors, in one flat long[dim² + 1] buffer
  * (slot 0 counts rows). The building block of [[BlockedGram]], which
  * lifts [[GramAgg]]'s ~1k-dimension envelope: a d-dim Gram matrix
  * decomposes into (d/bs)² rectangular BLOCKS, each a cross-Gram of
  * two length-bs slices, so aggregation state is bs²+1 longs per block
  * group no matter how large d grows.
  *
  * Same input contract as [[GramAgg]]: a NULL vector (either side) is
  * skipped; a wrong-length or null-coordinate vector throws — silent
  * exclusion would skew `n` against the unblocked formulation. */
case class CrossGramAgg(
    a: Expression,
    b: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dim * dim

  private lazy val mayHaveNullElements = Seq(a, b).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("s", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cross_gram_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](cells + 1)

  private def checked(v: Any, side: String): Array[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"cross_gram_agg: $side vector of length ${arr.numElements()} in a dim=$dim" +
          " aggregate — ragged input would silently skew n and the sums")
    if (mayHaveNullElements) {
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"cross_gram_agg: null coordinate at index $i of $side vector (dim=$dim)")
        i += 1
      }
    }
    arr.toLongArray()
  }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val av = a.eval(row)
    val bv = b.eval(row)
    if (av != null && bv != null) {
      val qa = checked(av, "left")
      val qb = checked(bv, "right")
      buf(0) += 1L
      var i = 0
      var idx = 1
      while (i < dim) {
        val ai = qa(i)
        var j = 0
        while (j < dim) {
          buf(idx) += ai * qb(j)
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
      var j = 0
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CrossGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CrossGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
}

object CrossGramAgg {
  def apply(a: Column, b: Column, dim: Int): Column =
    toColumn(new CrossGramAgg(toExpression(a), toExpression(b), dim)
      .toAggregateExpression())
}

/** Blocked Gram matrix XᵀX for dimensions beyond [[GramAgg]]'s ~1k
  * envelope (its monolithic triangle buffer crosses ~4 MB/state
  * there; at d=4096 it would be 67 MB). Decomposition: split each
  * vector into d/bs contiguous slices; every Gram cell (i, j) with
  * i ≤ j lives in exactly one block pair (bi, bj) = (i div bs,
  * j div bs) with bi ≤ bj, so the full triangle is the union of
  * (d/bs)(d/bs+1)/2 independent [[CrossGramAgg]] rectangles keyed by
  * (bi, bj) — a plain groupBy whose aggregation state is bs²+1 longs
  * (bs=256 → ~524 KB) regardless of d.
  *
  * Cost shape: each vector explodes into B(B+1)/2 pair rows of 2·bs
  * values (≈ (B+1)× the vector's own volume, B = d/bs) before the
  * map-side combine collapses them — the price of bounded state.
  * Shuffle carries one rectangle per (block pair × map task), exactly
  * like [[GramAgg]]'s one-triangle-per-task but sliced. Output is
  * bit-identical to `GramAgg(v, d)` (pinned in GramAggSpec at d=256
  * against the monolithic form). */
object BlockedGram {

  /** Upper-triangle Gram cells (i, j, n, s) of the length-`d`
    * `array<bigint>` column `v`, computed in bs×bs blocks. */
  def gram(df: DataFrame, v: Column, d: Int, bs: Int): DataFrame = {
    require(d % bs == 0, s"dim $d not divisible by block size $bs")
    val nB = d / bs
    val pairs = for (bi <- 0 until nB; bj <- bi until nB) yield (bi, bj)
    val pairRows = df.select(explode(array(pairs.map { case (bi, bj) =>
      struct(lit(bi).as("bi"), lit(bj).as("bj"),
        slice(v, bi * bs + 1, bs).as("va"),
        slice(v, bj * bs + 1, bs).as("vb"))
    }: _*)).as("p")).select("p.*")
    pairRows.groupBy("bi", "bj")
      .agg(CrossGramAgg(col("va"), col("vb"), bs).as("g"))
      .select(col("bi"), col("bj"), explode(col("g")).as("c"))
      .select((col("bi") * bs + col("c.i")).as("i"),
        (col("bj") * bs + col("c.j")).as("j"),
        col("c.n").as("n"), col("c.s").as("s"))
      // diagonal blocks compute their full bs×bs rectangle; the global
      // triangle keeps only i ≤ j (off-diagonal blocks satisfy it by
      // construction: bi < bj ⇒ i < j for every cell)
      .filter(col("i") <= col("j"))
  }
}
