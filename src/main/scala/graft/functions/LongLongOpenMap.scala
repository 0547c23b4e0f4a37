package graft.functions

/** Minimal unboxed open-addressing Long→Long hash map for typed
  * aggregate buffers ([[QDigestAgg]]): two parallel long arrays,
  * linear probing, power-of-two capacity.
  *
  * Exists because `scala.collection.mutable.LongMap[Long]` boxes its
  * VALUES (the class is specialized on keys only) — on a sketch build
  * over a mostly-distinct 600k-value column the per-row
  * `getOrElse` + `update` pair allocated a `java.lang.Long` per call
  * and double-probed, which made the aggregate's update path the
  * single most expensive stage of both q-digest queries.
  *
  * Contract: keys must be ≥ 1 (dyadic-tree node ids are; 0 marks an
  * empty slot, Long.MinValue a tombstone). Not thread-safe — each
  * aggregation buffer is single-threaded by Spark's contract.
  */
private[functions] final class LongLongOpenMap(initialCapacity: Int = 16) {
  private var cap = {
    var c = 16
    while (c < initialCapacity) c <<= 1
    c
  }
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var live = 0      // entries with a real key
  private var used = 0      // live + tombstones (drives rehash)

  private val Empty = 0L
  private val Tomb = Long.MinValue

  def size: Int = live

  private def idx(key: Long): Int = {
    // 64-bit mix (splitmix64 finalizer) — node ids are near-sequential
    var h = key
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & mask
  }

  /** Slot of `key`, or the first insertable slot (empty or tombstone)
    * on its probe path if absent (negative encoding -(slot+1)). */
  private def find(key: Long): Int = {
    var i = idx(key)
    var insertAt = -1
    while (true) {
      val k = keys(i)
      if (k == key) return i
      if (k == Empty) return -( (if (insertAt >= 0) insertAt else i) + 1)
      if (k == Tomb && insertAt < 0) insertAt = i
      i = (i + 1) & mask
    }
    throw new IllegalStateException("unreachable")
  }

  def contains(key: Long): Boolean = find(key) >= 0

  def getOrElse(key: Long, default: Long): Long = {
    val s = find(key)
    if (s >= 0) vals(s) else default
  }

  def put(key: Long, value: Long): Unit = {
    val s = find(key)
    if (s >= 0) vals(s) = value
    else insertAt(-s - 1, key, value)
  }

  /** value(key) += delta, inserting at delta if absent — the per-row
    * hot path: one probe, no boxing. */
  def addTo(key: Long, delta: Long): Unit = {
    val s = find(key)
    if (s >= 0) vals(s) += delta
    else insertAt(-s - 1, key, delta)
  }

  /** Remove `key`; true iff it was present. */
  def remove(key: Long): Boolean = {
    val s = find(key)
    if (s >= 0) { keys(s) = Tomb; live -= 1; true } else false
  }

  private def insertAt(slot: Int, key: Long, value: Long): Unit = {
    if (keys(slot) == Empty) used += 1
    keys(slot) = key; vals(slot) = value; live += 1
    if (used * 10 >= cap * 6) rehash()
  }

  private def rehash(): Unit = {
    val oldKeys = keys; val oldVals = vals; val oldCap = cap
    // grow only when genuinely loaded; a tombstone-heavy table
    // rehashes at the same capacity to reclaim the probe paths
    if (live * 10 >= cap * 4) { cap <<= 1; mask = cap - 1 }
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    live = 0; used = 0
    var i = 0
    while (i < oldCap) {
      val k = oldKeys(i)
      if (k != Empty && k != Tomb) {
        var j = idx(k)
        while (keys(j) != Empty) j = (j + 1) & mask
        keys(j) = k; vals(j) = oldVals(i); live += 1; used += 1
      }
      i += 1
    }
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      val k = keys(i)
      if (k != Empty && k != Tomb) f(k, vals(i))
      i += 1
    }
  }

  def keysArray(): Array[Long] = {
    val out = new Array[Long](live)
    var i = 0; var o = 0
    while (i < cap) {
      val k = keys(i)
      if (k != Empty && k != Tomb) { out(o) = k; o += 1 }
      i += 1
    }
    out
  }
}
