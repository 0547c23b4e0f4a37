package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Q-digest: a MERGEABLE quantile sketch over a bounded integer
  * universe [0, 2^L) with a DETERMINISTIC worst-case rank-error
  * guarantee — the member of the sketch family (HLL = distinct,
  * CMS/Misra–Gries = frequency, q-digest = rank) whose bound is not
  * probabilistic. KLL/t-digest trade that for generality; here the
  * values are integer cents/counts (bounded universe is the common
  * case for money and token-length columns), so q-digest's hard
  * guarantee |rank(estimate) − target| ≤ n·L/k is the better
  * contract: it can ride into a driver-hashed boolean that must
  * NEVER flip, under any partitioning or merge order.
  *
  * Structure (Shrivastava et al., SenSys'04): counts on nodes of the
  * dyadic tree over the universe (node id 1 = root, children 2i,
  * 2i+1, leaves at depth L hold exact values). COMPRESS folds any
  * (node, sibling, parent) triple with combined count < n/k into the
  * parent — coarser ranges only keep mass that is individually
  * small, which is where the error bound comes from: a rank query
  * walks nodes in right-endpoint order and at most L ancestors per
  * path each contribute < n/k misplaced mass.
  *
  * MERGE adds count maps and recompresses — associative in the
  * bound: any merge tree yields a digest whose size stays O(k·L/...)
  * ≈ 3k and whose error stays ≤ n·L/k for the COMBINED n. Exact node
  * contents may differ by merge order (the bound, not the bytes, is
  * the contract — output columns built from this sketch must be
  * exact-side values plus bound booleans, the repo's approximate-op
  * evidence rule).
  *
  * Buffer: unboxed open-addressing map (node id → count) + total n;
  * compression runs when
  * the map outgrows 6k entries and once at eval, keeping state
  * ≈ 16 B × 3k ≈ 50 KB at k = 1024 — map-side combinable through
  * ObjectHashAggregate like the repo's other typed aggregates. */
case class QDigestAgg(
    child: Expression,
    universeBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestAgg.Buffer] {
  require(universeBits >= 1 && universeBits <= 40, s"universeBits=$universeBits")
  require(k >= 16, s"k=$k too small")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "qdigest_agg"

  override def createAggregationBuffer(): QDigestAgg.Buffer =
    new QDigestAgg.Buffer(new LongLongOpenMap(), 0L)

  override def update(buf: QDigestAgg.Buffer, row: InternalRow): QDigestAgg.Buffer = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0 && x < (1L << universeBits),
        s"qdigest value $x outside [0, 2^$universeBits)")
      buf.nodes.addTo((1L << universeBits) + x, 1L)
      buf.n += 1L
      maybeCompress(buf)
    }
    buf
  }

  override def merge(b1: QDigestAgg.Buffer, b2: QDigestAgg.Buffer): QDigestAgg.Buffer = {
    b2.nodes.foreach((id, c) => b1.nodes.addTo(id, c))
    b1.n += b2.n
    maybeCompress(b1)
    b1
  }

  /** Amortized compaction: a compress pass scans every node × every
    * depth, so invoking it per row once the map passes a fixed size
    * is quadratic EXACTLY when thresholds are too small to fold
    * anything (early in a partition, n/k < 2). Instead the next
    * attempt is scheduled at double the size a failed pass left
    * behind — total compress work stays O(size) amortized, and the
    * map is still driven back toward 3k whenever mass makes folding
    * possible. */
  private def maybeCompress(buf: QDigestAgg.Buffer): Unit =
    if (buf.nodes.size > 6 * k && buf.nodes.size >= buf.nextCompactAt) {
      QDigestAgg.compress(buf, k, universeBits)
      buf.nextCompactAt =
        if (buf.nodes.size > 3 * k) buf.nodes.size.toLong * 2 else 0L
    }

  override def eval(buf: QDigestAgg.Buffer): Any = QDigestAgg.evalDigest(buf, k, universeBits)

  override def serialize(buf: QDigestAgg.Buffer): Array[Byte] =
    QDigestAgg.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): QDigestAgg.Buffer =
    QDigestAgg.deserializeBuffer(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object QDigestAgg {

  /** `nextCompactAt` is transient scheduling state (not serialized):
    * the map size at which the next compress attempt is worthwhile —
    * see `maybeCompress`. */
  final class Buffer(val nodes: LongLongOpenMap, var n: Long,
      var nextCompactAt: Long = 0L)

  /** Final compress + emit entries sorted by node id (deterministic
    * regardless of map iteration order). Shared by both aggregates. */
  private[functions] def evalDigest(buf: Buffer, k: Int, bits: Int): Any = {
    compress(buf, k, bits)
    val ids = buf.nodes.keysArray()
    java.util.Arrays.sort(ids)
    val entries = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      entries(i) = new GenericInternalRow(
        Array[Any](ids(i), buf.nodes.getOrElse(ids(i), 0L)))
      i += 1
    }
    new GenericArrayData(entries)
  }

  private[functions] def serializeBuffer(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 16 * buf.nodes.size)
    bb.putLong(buf.n)
    bb.putLong(buf.nodes.size.toLong)
    buf.nodes.foreach { (id, c) => bb.putLong(id); bb.putLong(c) }
    bb.array()
  }

  private[functions] def deserializeBuffer(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val sz = bb.getLong().toInt
    val m = new LongLongOpenMap(sz * 2)
    var i = 0
    while (i < sz) { m.put(bb.getLong(), bb.getLong()); i += 1 }
    new Buffer(m, n)
  }

  /** Fold every (node, sibling, parent) triple with combined count
    * < ⌊n/k⌋ into the parent, bottom-up, to the SAME fixpoint as
    * repeated full sweeps.
    *
    * Sweep = sort the live ids DESCENDING and walk once: ids sort
    * deeper-first (parent = id >> 1 < id), so each node sees its
    * subtree already folded. Follow-up sweeps need only the triples
    * whose combined count could have CHANGED since their exam. A
    * triple (a, sib, par) receives mass only through its own fold
    * (into par) and loses mass only when a member is folded away;
    * a and sib can be removed only by this triple itself, and
    * deeper-first order means growth of a/sib happens before the
    * exam. So after a sweep exactly two kinds of triples are live
    * candidates: those of parents CREATED by a fold (never
    * examined), and those whose PARENT was folded away later in the
    * sweep (combined count dropped by the parent's mass — the case a
    * created-parents-only rescan missed: thr 10 with counts a=3,
    * sib=3, par=5 fails at 11, then par's own triple folds par away
    * and a+sib=6 is foldable). Follow-up sweeps therefore walk the
    * created parents PLUS the children pairs of every removed node —
    * a few hundred ids — instead of re-sorting the full key set per
    * pass (the pre-r17 fixpoint re-sorted all ~590k live ids up to
    * tree-depth times per compress call, which dominated the sketch
    * build); the fold set, and hence the digest, equals the full
    * fixpoint's, and the eval-time size bound ≈ 3k holds again. */
  private[functions] def compress(buf: Buffer, k: Int, bits: Int): Unit = {
    val thr = buf.n / k
    if (thr <= 1) return // every positive count ≥ 1 survives c < 1; thr 1 folds only empties
    val leafFloor = 1L << bits // ids ≥ this are leaves: no children to requeue
    var ids = buf.nodes.keysArray()
    while (ids.length > 0) {
      java.util.Arrays.sort(ids)
      var pending: Array[Long] = new Array[Long](16)
      var nPending = 0
      def enqueue(id: Long): Unit = {
        if (nPending == pending.length)
          pending = java.util.Arrays.copyOf(pending, pending.length * 2)
        pending(nPending) = id
        nPending += 1
      }
      var i = ids.length - 1
      while (i >= 0) {
        val id = ids(i)
        if (id > 1 && buf.nodes.contains(id)) {
          val a = id & ~1L
          val sib = a | 1L
          val par = a >>> 1
          val c = buf.nodes.getOrElse(a, 0L) + buf.nodes.getOrElse(sib, 0L) +
            buf.nodes.getOrElse(par, 0L)
          if (c < thr) {
            val parExisted = buf.nodes.contains(par)
            // removed INTERNAL nodes may leave live children whose
            // failed triples just lost this node's mass — requeue
            // them (leaves — the overwhelming majority of folds —
            // have no children to probe)
            if (buf.nodes.remove(a) && a < leafFloor) {
              if (buf.nodes.contains(2 * a)) enqueue(2 * a)
              if (buf.nodes.contains(2 * a + 1)) enqueue(2 * a + 1)
            }
            if (buf.nodes.remove(sib) && sib < leafFloor) {
              if (buf.nodes.contains(2 * sib)) enqueue(2 * sib)
              if (buf.nodes.contains(2 * sib + 1)) enqueue(2 * sib + 1)
            }
            if (c > 0) {
              buf.nodes.put(par, c)
              if (!parExisted) enqueue(par)
            } else buf.nodes.remove(par)
          }
        }
        i -= 1
      }
      ids = java.util.Arrays.copyOf(pending, nPending)
    }
  }

  /** Rank query over a collected digest: walk nodes in ascending
    * right-endpoint order (narrower range first on ties), accumulate
    * counts, return the first right endpoint whose cumulative count
    * reaches `targetRank`. Guarantee: the true rank of the returned
    * value differs from targetRank by at most n·bits/k. */
  def quantile(entries: Seq[(Long, Long)], bits: Int, targetRank: Long): Long = {
    require(entries.nonEmpty, "empty digest")
    val spans = entries.map { case (id, c) =>
      val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
      val width = 1L << (bits - depth)
      val left = (id - (1L << depth)) * width
      (left + width - 1, left, c)
    }.sortBy { case (r, l, _) => (r, -l) }
    var cum = 0L
    spans.foreach { case (r, _, c) =>
      cum += c
      if (cum >= targetRank) return r
    }
    spans.last._1
  }

  /** Column-API entry: sketch a long column with values in
    * [0, 2^universeBits). Output: array<struct<id,cnt>>. */
  def build(value: Column, universeBits: Int, k: Int): Column =
    toColumn(new QDigestAgg(toExpression(value), universeBits, k)
      .toAggregateExpression())

  /** Column-API entry: UNION already-built digests (the second level
    * of a sketch store — per-shard digests persisted, combined at
    * query time without touching raw data). */
  def union(digest: Column, universeBits: Int, k: Int): Column =
    toColumn(new QDigestUnionAgg(toExpression(digest), universeBits, k)
      .toAggregateExpression())
}

/** Second-level q-digest aggregate: each INPUT ROW is itself a
  * digest (`array<struct<id,cnt>>`, [[QDigestAgg]]'s output), and the
  * aggregate unions them — count maps add, then recompress. This is
  * what makes the q-digest a sketch-STORE citizen like
  * [[HllUnionAgg]]: per-day/per-shard digests persist once, and any
  * grouping of shards answers quantile queries without a raw-data
  * pass. Error composes to the standard mergeability bound: each
  * input carries ≤ nᵢ·L/k misplaced mass and the union's own
  * compression adds ≤ n·L/k, so rank estimates from the combined
  * digest are audited against 2·n·L/k. */
case class QDigestUnionAgg(
    child: Expression,
    universeBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestAgg.Buffer] {
  require(universeBits >= 1 && universeBits <= 40, s"universeBits=$universeBits")
  require(k >= 16, s"k=$k too small")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "qdigest_union_agg"

  override def createAggregationBuffer(): QDigestAgg.Buffer =
    new QDigestAgg.Buffer(new LongLongOpenMap(), 0L)

  override def update(buf: QDigestAgg.Buffer, row: InternalRow): QDigestAgg.Buffer = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val e = arr.getStruct(i, 2)
        val id = e.getLong(0)
        // dyadic-tree node ids live in [1, 2^(L+1)); the buffer map
        // reserves 0 and Long.MinValue as slot sentinels, so a
        // malformed input digest must fail loudly instead of silently
        // dropping its count into an invisible slot
        require(id >= 1 && id < (2L << universeBits),
          s"qdigest union input carries node id $id outside " +
            s"[1, 2^${universeBits + 1}) — not a q-digest over this universe")
        buf.nodes.addTo(id, e.getLong(1))
        buf.n += e.getLong(1)
        i += 1
      }
      maybeCompress(buf)
    }
    buf
  }

  override def merge(b1: QDigestAgg.Buffer, b2: QDigestAgg.Buffer): QDigestAgg.Buffer = {
    b2.nodes.foreach((id, c) => b1.nodes.addTo(id, c))
    b1.n += b2.n
    maybeCompress(b1)
    b1
  }

  private def maybeCompress(buf: QDigestAgg.Buffer): Unit =
    if (buf.nodes.size > 6 * k && buf.nodes.size >= buf.nextCompactAt) {
      QDigestAgg.compress(buf, k, universeBits)
      buf.nextCompactAt =
        if (buf.nodes.size > 3 * k) buf.nodes.size.toLong * 2 else 0L
    }

  override def eval(buf: QDigestAgg.Buffer): Any = QDigestAgg.evalDigest(buf, k, universeBits)

  override def serialize(buf: QDigestAgg.Buffer): Array[Byte] =
    QDigestAgg.serializeBuffer(buf)

  override def deserialize(bytes: Array[Byte]): QDigestAgg.Buffer =
    QDigestAgg.deserializeBuffer(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
