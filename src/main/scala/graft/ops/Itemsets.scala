package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Frequent-itemset mining (a-priori, 1/2/3-itemsets) over per-order
  * brand baskets — the market-basket classic, shaped for a 100 TB
  * fact table.
  *
  * The scale design is the whole point: candidate pairs/triples are
  * generated IN-ROW from each basket's sorted distinct-item array
  * (higher-order `transform`/`slice` — no self-join ever touches the
  * fact table), so support counting is a plain map-side-combinable
  * groupBy over at most C(|basket|,k) generated rows per basket.
  * The DuckDB oracle states the same semantics as the textbook
  * k-way self-join on the basket table — the quadratic/cubic plan a
  * naive engine would run and the one you could NOT afford at scale.
  *
  * A-priori pruning is real, not decorative: each basket array is
  * intersected with the broadcast frequent-item set at the matching
  * downstream threshold BEFORE pair/triple generation (downward
  * closure makes the prune lossless — any k-itemset meeting support
  * s has every member meeting s). The frequent-1 collect is
  * domain-bounded (≤25 brands) like the repo's other broadcast memos.
  *
  * Support thresholds are integer-exact cross-multiplications
  * (`support·100 ≥ n_baskets` = 1% for k≤2, `·500` = 2‰ for k=3) —
  * no division, hash-identical on both engines. Basket building is
  * ONE shuffle: lineitem ⋈ broadcast(part-dim) → groupBy(orderkey)
  * with `collect_set` deduping in the aggregate. */
object Itemsets {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val big = lit(100000) // slice length bound > any basket size

  private val basketStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Staged BRAND-BASKET STORE `(l_orderkey, items)` — the shared
    * input all three itemset-family queries build identically
    * (lineitem ⋈ broadcast(part) → per-order sorted distinct brand
    * array): one corpus-wide shuffle computed once per application
    * and parquet-staged, the same device as
    * [[graft.ops.Graph.coPairs]]. `sort_array(collect_set(...))` is
    * deterministic and `array<string>` round-trips parquet exactly,
    * so store vs inline is value-identical. The incremental query
    * filters the store by orderkey — baskets are per-order, so
    * filtering staged baskets equals basket-building filtered rows.
    * Same staleness contract as [[graft.Staging]]. */
  def brandBaskets(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Staging.dir(s,
      "graft_baskets_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val lock = basketStoreLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!graft.Staging.ready(s, path)) {
        val part = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("p_brand"))).as("items"))
          .write.mode("overwrite").parquet(path)
      }
    }
    s.read.parquet(path)
  }

  /** All ordered (a<b) in-row pairs of a sorted array column. */
  private[graft] def pairsOf(items: Column): Column =
    flatten(transform(items, (x, i) =>
      transform(slice(items, i + 2, big), y =>
        struct(x.as("i1"), y.as("i2")))))

  /** All ordered (a<b<c) in-row triples of a sorted array column. */
  private[graft] def triplesOf(items: Column): Column =
    flatten(transform(items, (x, i) =>
      flatten(transform(slice(items, i + 2, big), (y, j0) =>
        transform(slice(items, i + j0 + 3, big), z =>
          struct(x.as("i1"), y.as("i2"), z.as("i3")))))))

  val frequentItemsets: Q = Q(
    "q_itemsets",
    (s, dir) => {
      val baskets = brandBaskets(s, dir)
        .persist() // read thrice: n, freq-1, candidate gen
      val nb = baskets.count()
      val sup1 = baskets
        .select(explode(col("items")).as("item"))
        .groupBy("item").agg(count(lit(1)).as("support"))
        .persist()
      // lossless a-priori prunes: members of any ≥1% pair are ≥1%
      // items; members of any ≥2‰ triple are ≥2‰ items
      val f1pct = sup1.filter(col("support") * 100 >= nb)
        .agg(sort_array(collect_set(col("item")))).head().getSeq[String](0)
      val f2pm = sup1.filter(col("support") * 500 >= nb)
        .agg(sort_array(collect_set(col("item")))).head().getSeq[String](0)
      val one = sup1.filter(col("support") * 100 >= nb)
        .select(lit(1).as("k"), col("item").as("item1"),
          lit(null).cast("string").as("item2"),
          lit(null).cast("string").as("item3"), col("support"))
      val two = baskets
        .select(explode(pairsOf(array_intersect(col("items"),
          typedlit(f1pct)))).as("p"))
        .groupBy(col("p.i1"), col("p.i2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") * 100 >= nb)
        .select(lit(2).as("k"), col("i1").as("item1"), col("i2").as("item2"),
          lit(null).cast("string").as("item3"), col("support"))
      val three = baskets
        .select(explode(triplesOf(array_intersect(col("items"),
          typedlit(f2pm)))).as("p"))
        .groupBy(col("p.i1"), col("p.i2"), col("p.i3"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") * 500 >= nb)
        .select(lit(3).as("k"), col("i1").as("item1"), col("i2").as("item2"),
          col("i3").as("item3"), col("support"))
      one.unionByName(two).unionByName(three)
        .orderBy(col("k"), col("item1"), col("item2"), col("item3"))
    },
    Some("""
      WITH basket AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS bid, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      n AS MATERIALIZED (SELECT count(DISTINCT bid) AS nb FROM basket),
      s1 AS MATERIALIZED (SELECT item, count(*) AS support FROM basket GROUP BY item),
      s2 AS MATERIALIZED (SELECT b1.item AS item1, b2.item AS item2, count(*) AS support
             FROM basket b1 JOIN basket b2
               ON b1.bid = b2.bid AND b1.item < b2.item
             GROUP BY 1, 2),
      s3 AS MATERIALIZED (SELECT b1.item AS item1, b2.item AS item2, b3.item AS item3,
                    count(*) AS support
             FROM basket b1
             JOIN basket b2 ON b1.bid = b2.bid AND b1.item < b2.item
             JOIN basket b3 ON b1.bid = b3.bid AND b2.item < b3.item
             GROUP BY 1, 2, 3)
      SELECT 1 AS k, item AS item1, CAST(NULL AS VARCHAR) AS item2,
             CAST(NULL AS VARCHAR) AS item3, CAST(support AS BIGINT) AS support
      FROM s1, n WHERE support * 100 >= nb
      UNION ALL
      SELECT 2, item1, item2, CAST(NULL AS VARCHAR), CAST(support AS BIGINT)
      FROM s2, n WHERE support * 100 >= nb
      UNION ALL
      SELECT 3, item1, item2, item3, CAST(support AS BIGINT)
      FROM s3, n WHERE support * 500 >= nb
      ORDER BY k, item1, item2, item3"""))

  /** Per-basket candidate counts for k = 0/1/2/3 in one frame — the
    * k=0 row carries the basket count so the whole state is ONE
    * domain-bounded table (≤ 1 + 25 + C(25,2) + C(25,3) rows,
    * independent of corpus size). */
  private def countsOf(baskets: DataFrame): DataFrame = {
    val zero = baskets.agg(count(lit(1)).as("support"))
      .select(lit(0).as("k"), lit(null).cast("string").as("item1"),
        lit(null).cast("string").as("item2"),
        lit(null).cast("string").as("item3"), col("support"))
    val one = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("support"))
      .select(lit(1).as("k"), col("item").as("item1"),
        lit(null).cast("string").as("item2"),
        lit(null).cast("string").as("item3"), col("support"))
    val two = baskets.select(explode(pairsOf(col("items"))).as("p"))
      .groupBy(col("p.i1"), col("p.i2")).agg(count(lit(1)).as("support"))
      .select(lit(2).as("k"), col("i1").as("item1"), col("i2").as("item2"),
        lit(null).cast("string").as("item3"), col("support"))
    val three = baskets.select(explode(triplesOf(col("items"))).as("p"))
      .groupBy(col("p.i1"), col("p.i2"), col("p.i3"))
      .agg(count(lit(1)).as("support"))
      .select(lit(3).as("k"), col("i1").as("item1"), col("i2").as("item2"),
        col("i3").as("item3"), col("support"))
    zero.unionByName(one).unionByName(two).unionByName(three)
  }

  /** INCREMENTAL itemset maintenance — the additive-state observation
    * applied to market baskets: itemset supports are plain sums over
    * DISJOINT basket sets, and the full support table is bounded by
    * the ITEM domain (C(25,3)+C(25,2)+26 rows here), not the corpus —
    * so a standing support table absorbs a delta batch of orders by
    * basket-building ONLY the delta and adding counts. No history
    * rescan, ever; at 100 TB the daily cost is one delta scan plus a
    * merge of two itemset-domain-sized tables.
    *
    * The incremental path deliberately counts ALL in-row candidates
    * (no a-priori prune): the prune depends on GLOBAL supports, which
    * shift as deltas land, so a pruned state could under-count an
    * itemset that later crosses the threshold. Thresholds apply at
    * READ time against the merged table — that is what keeps
    * incremental ≡ recompute exact, which the oracle (the same full
    * recompute as [[frequentItemsets]]) pins by hash.
    *
    * Batch boundary: orders with o_orderkey above the max−range/8 cut
    * are "today's delta", the rest is settled history staged to
    * parquet — the same genuine persisted-state round trip as
    * `q_incremental_rollup`. */
  val itemsetsIncremental: Q = Q(
    "q_itemsets_incremental",
    (s, dir) => {
      // the staged basket store replaces both basket builds; the cut
      // is the same min/max arithmetic (every lineitem order has a
      // basket row, so the orderkey extremes are preserved)
      val baskets = brandBaskets(s, dir)
      val cut = baskets.agg(expr(
        "max(l_orderkey) - (max(l_orderkey) - min(l_orderkey) + 1) div 8").as("c"))
        .head().getLong(0)
      val stateDir = graft.Staging.dir(s, "graft_itemset_state")
      countsOf(baskets.filter(col("l_orderkey") <= cut))
        .write.mode("overwrite").parquet(stateDir)
      val merged = s.read.parquet(stateDir)
        .unionByName(countsOf(baskets.filter(col("l_orderkey") > cut)))
        .groupBy("k", "item1", "item2", "item3")
        .agg(sum(col("support")).as("support"))
        .persist()
      val nb = merged.filter(col("k") === 0).agg(sum(col("support")))
        .head().getLong(0)
      merged.filter(
          (col("k") === 1 && col("support") * 100 >= nb) ||
          (col("k") === 2 && col("support") * 100 >= nb) ||
          (col("k") === 3 && col("support") * 500 >= nb))
        .orderBy(col("k"), col("item1"), col("item2"), col("item3"))
    },
    // oracle = the FULL recompute: incremental state must be invisible
    frequentItemsets.oracle)

  /** Sequential-pattern user support — for every ordered type pair
    * (a, b), how many USERS contain "a then b" as a SUBSEQUENCE of
    * their event stream (GSP/SPM semantics: any a-occurrence strictly
    * before any b-occurrence — not the consecutive-bigram occurrence
    * counts `q_event_transitions` reports).
    *
    * The containment test collapses to two order statistics: a user
    * contains a→b iff first_pos(a) < last_pos(b) (an a before the
    * final b), which also handles a = b (needs ≥2 occurrences). So
    * the plan is: one per-user position window (the same
    * (ts, event_id) total order every sequence query here uses), a
    * groupBy to |users|×|types| first/last rows, and a user-keyed
    * self-join whose per-user fan-out is bounded by |types|² ≤ 625 —
    * corpus-size-independent after the first aggregate, the shape
    * that survives 100 TB of events. Support thresholds stay exact:
    * permille = 1000·n_users div total_users, BIGINT both sides. */
  /** Core of [[seqContains]] over any (user_id, ts, event_id,
    * event_type) frame — factored so the spec can brute-force-check
    * subsequence containment on synthetic streams. */
  private[graft] def seqContainsOf(ev0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = ev0.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val pos = ev.withColumn("rn", row_number().over(byUser))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("rn")).as("fp"), max(col("rn")).as("lp"))
      .persist() // both sides of the user-keyed pair join
    val nUsers = pos.select(col("user_id")).distinct().count()
    pos.select(col("user_id"), col("event_type").as("g1"), col("fp"))
      .join(pos.select(col("user_id"), col("event_type").as("g2"), col("lp")),
        Seq("user_id"))
      .filter(col("fp") < col("lp"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n_users"))
      .withColumn("support_permille",
        expr(s"1000 * n_users div ${nUsers}L"))
      .orderBy("g1", "g2")
  }

  val seqContains: Q = Q(
    "q_seq_contains",
    (s, dir) => seqContainsOf(t(s, dir, "events")),
    Some("""
      WITH ev AS MATERIALIZED (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS rn
        FROM events WHERE user_id IS NOT NULL),
      pos AS MATERIALIZED (
        SELECT user_id, event_type,
               CAST(min(rn) AS BIGINT) AS fp, CAST(max(rn) AS BIGINT) AS lp
        FROM ev GROUP BY user_id, event_type),
      n AS MATERIALIZED (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM pos)
      SELECT a.event_type AS g1, b.event_type AS g2,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(1000 * count(*) // max(nu) AS BIGINT) AS support_permille
      FROM pos a
      JOIN pos b ON a.user_id = b.user_id
      CROSS JOIN n
      WHERE a.fp < b.lp
      GROUP BY a.event_type, b.event_type
      ORDER BY g1, g2"""))

  /** ASSOCIATION RULES from the frequent pairs — the step
    * [[frequentItemsets]] stops short of: supports say which sets
    * co-occur, rules say which DIRECTION carries signal. For every
    * frequent pair {a,b} (≥ 1% support), both directed rules with
    *
    *  - confidence(a→b) = P(b|a), exact integer permille
    *    (1000·s_ab div s_a);
    *  - lift = P(ab)/(P(a)P(b)) and leverage = P(ab) − P(a)P(b),
    *    each ONE fixed-order double chain over the exact BIGINT
    *    supports (the [[graft.llm.TextStats]] zipf recipe — the
    *    moments stay integers, only the final ratio is IEEE), so the
    *    values hash identically at any corpus size where the raw
    *    products would overflow BIGINT.
    *
    * Scale shape: supports come from the same basket-keyed aggregates
    * as the itemsets query (pair blow-up bounded by basket size);
    * the rule join is ITEM-DOMAIN sized (frequent pairs × 2). */
  val assocRules: Q = Q(
    "q_assoc_rules",
    (s, dir) => {
      val baskets = brandBaskets(s, dir)
        .persist()
      val nbF = baskets.agg(count(lit(1)).as("nb"))
      val s1 = baskets.select(explode(col("items")).as("item"))
        .groupBy("item").agg(count(lit(1)).as("s"))
      val s2 = baskets.select(explode(pairsOf(col("items"))).as("p"))
        .groupBy(col("p.i1"), col("p.i2"))
        .agg(count(lit(1)).as("s_ab"))
        .crossJoin(broadcast(nbF))
        .filter(col("s_ab") * 100 >= col("nb"))
      val directed = s2.select(col("i1").as("ante"), col("i2").as("cons"),
          col("s_ab"), col("nb"))
        .unionByName(s2.select(col("i2").as("ante"), col("i1").as("cons"),
          col("s_ab"), col("nb")))
      val out = directed
        .join(broadcast(s1.select(col("item").as("ante"), col("s").as("s_a"))),
          Seq("ante"))
        .join(broadcast(s1.select(col("item").as("cons"), col("s").as("s_b"))),
          Seq("cons"))
        .select(col("ante"), col("cons"), col("s_ab"),
          expr("(1000 * s_ab) div s_a").as("conf_permille"),
          expr("cast(round(1e6 * (cast(s_ab as double) * cast(nb as double))" +
            " / (cast(s_a as double) * cast(s_b as double))) as bigint)")
            .as("lift_micro"),
          expr("cast(round(1e6 * (cast(s_ab as double) / cast(nb as double)" +
            " - (cast(s_a as double) / cast(nb as double))" +
            " * (cast(s_b as double) / cast(nb as double)))) as bigint)")
            .as("leverage_micro"))
        .orderBy("ante", "cons")
      // rule table is support-thresholded but corpus-dependent:
      // materialize distributed (no driver round-trip) before
      // releasing the basket cache; (ante, cons) is a unique key so
      // the range sort already in `out` is deterministic
      val mat = graft.CacheHandles.sealOutput(out)
      baskets.unpersist()
      mat
    },
    Some("""
      WITH basket AS (
        SELECT DISTINCT l_orderkey AS bid, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      n AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS nb FROM basket),
      s1 AS (SELECT item, CAST(count(*) AS BIGINT) AS s
             FROM basket GROUP BY item),
      s2 AS (SELECT b1.item AS i1, b2.item AS i2,
                    CAST(count(*) AS BIGINT) AS s_ab
             FROM basket b1 JOIN basket b2
               ON b1.bid = b2.bid AND b1.item < b2.item
             GROUP BY 1, 2),
      freq AS (SELECT i1, i2, s_ab, nb FROM s2 CROSS JOIN n
               WHERE s_ab * 100 >= nb),
      directed AS (
        SELECT i1 AS ante, i2 AS cons, s_ab, nb FROM freq
        UNION ALL
        SELECT i2 AS ante, i1 AS cons, s_ab, nb FROM freq)
      SELECT d.ante, d.cons, d.s_ab,
             (1000 * d.s_ab) // a.s AS conf_permille,
             CAST(round(1e6 * (cast(d.s_ab as double) * cast(d.nb as double))
               / (cast(a.s as double) * cast(b.s as double))) AS BIGINT)
               AS lift_micro,
             CAST(round(1e6 * (cast(d.s_ab as double) / cast(d.nb as double)
               - (cast(a.s as double) / cast(d.nb as double))
               * (cast(b.s as double) / cast(d.nb as double)))) AS BIGINT)
               AS leverage_micro
      FROM directed d
      JOIN s1 a ON a.item = d.ante
      JOIN s1 b ON b.item = d.cons
      ORDER BY d.ante, d.cons"""))

  val all: Seq[Q] = Seq(frequentItemsets, itemsetsIncremental, seqContains,
    assocRules)
}
