package graft

import org.apache.spark.sql.functions._
import graft.ops.Itemsets

/** Frequent-itemset mining: in-row candidate generation must equal
  * the combinatorial definition, the a-priori prune must be lossless,
  * and the declared query must satisfy downward closure. */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  test("pairsOf / triplesOf enumerate exactly the sorted combinations") {
    val df = Seq(Seq("a", "b", "c", "d")).toDF("items")
    val pairs = df.select(explode(Itemsets.pairsOf(col("items"))).as("p"))
      .select(col("p.i1"), col("p.i2")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a","b"), ("a","c"), ("a","d"),
      ("b","c"), ("b","d"), ("c","d")))
    val triples = df.select(explode(Itemsets.triplesOf(col("items"))).as("p"))
      .select(col("p.i1"), col("p.i2"), col("p.i3")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(triples == Set(("a","b","c"), ("a","b","d"),
      ("a","c","d"), ("b","c","d")))
    // degenerate baskets produce nothing, not errors
    val small = Seq(Seq("x"), Seq.empty[String]).toDF("items")
    assert(small.select(explode(Itemsets.pairsOf(col("items")))).count() == 0)
    assert(small.select(explode(Itemsets.triplesOf(col("items")))).count() == 0)
  }

  test("support counts match a brute-force reference on synthetic baskets") {
    // 40 baskets over 6 items, deterministic membership rule
    val baskets: Seq[Seq[String]] = (0 until 40).map { b =>
      (0 until 6).filter(i => (b * 7 + i * i + b * i) % 3 != 0)
        .map(i => s"it$i")
    }
    val df = baskets.map(Tuple1(_)).toDF("items")
      .select(sort_array(col("items")).as("items"))
    val got = df.select(explode(Itemsets.pairsOf(col("items"))).as("p"))
      .groupBy(col("p.i1"), col("p.i2")).agg(count(lit(1)).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = baskets.flatMap(b => b.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
    val got3 = df.select(explode(Itemsets.triplesOf(col("items"))).as("p"))
      .groupBy(col("p.i1"), col("p.i2"), col("p.i3")).agg(count(lit(1)).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val want3 = baskets
      .flatMap(b => b.sorted.combinations(3).map(c => (c(0), c(1), c(2))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got3 == want3)
  }

  test("incremental maintenance is indistinguishable from the full recompute") {
    val full = Itemsets.frequentItemsets.fn(spark, sf001).collect().toSeq
    val inc = Itemsets.itemsetsIncremental.fn(spark, sf001).collect().toSeq
    assert(full.nonEmpty)
    assert(inc == full,
      s"incremental diverged: ${inc.size} rows vs ${full.size}")
  }

  test("seq_contains matches brute-force subsequence containment") {
    // 30 users with deterministic pseudo-random streams over 4 types
    val types = Array("a", "b", "c", "d")
    val streams: Map[Long, Seq[String]] = (0L until 30L).map { u =>
      u -> (0 until ((u % 6) + 1).toInt)
        .map(i => types(((u * 13 + i * 7 + i * i) % 4).toInt))
    }.toMap
    val rows = streams.toSeq.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (ty, i) =>
        (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
          u * 100 + i, ty)
      }
    }
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = Itemsets.seqContainsOf(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute force: user contains a→b iff some a strictly precedes some b
    val want = (for {
      g1 <- types; g2 <- types
      n = streams.values.count(sq =>
        sq.zipWithIndex.exists { case (x, i) =>
          x == g1 && sq.drop(i + 1).contains(g2) })
      if n > 0
    } yield (g1, g2) -> n.toLong).toMap
    assert(got == want)
  }

  test("declared query: downward closure holds on sf0.001") {
    val rows = Itemsets.frequentItemsets.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val sup = rows.filter(_.getInt(0) == 1)
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    // every frequent pair's support ≤ each member's 1-item support
    // (members of a ≥1% pair are themselves ≥1%, so present in sup)
    val pairs = rows.filter(_.getInt(0) == 2)
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val s = r.getLong(4)
      assert(sup.contains(r.getString(1)) && sup.contains(r.getString(2)),
        s"a-priori member missing from frequent 1-itemsets: $r")
      assert(s <= sup(r.getString(1)) && s <= sup(r.getString(2)),
        s"downward closure violated: $r")
    }
  }

  test("association rules: hand baskets give exact confidence, lift and leverage") {
    val rows = ops.Itemsets.assocRules.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // both directions of every frequent pair are present with the SAME
    // support and the confidence identity conf(a->b)*s_a == 1000*s_ab
    // (up to div truncation) holds
    val byPair = rows.groupBy(r => Set(r._1, r._2))
    byPair.foreach { case (pair, rs) =>
      assert(rs.length == 2, s"$pair must emit both directions")
      assert(rs.map(_._3).distinct.length == 1, s"$pair support differs")
      // lift is symmetric: identical in both directions
      assert(rs.map(_._5).distinct.length == 1, s"$pair lift differs")
      assert(rs.map(_._6).distinct.length == 1, s"$pair leverage differs")
    }
    // sanity: confidence is a permille, lift positive
    rows.foreach { r =>
      assert(r._4 >= 0 && r._4 <= 1000, s"conf out of range: $r")
      assert(r._5 > 0, s"lift must be positive: $r")
    }
  }
}
