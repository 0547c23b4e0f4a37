package graft

import org.apache.spark.sql.functions._
import graft.llm.TextRank

/** TextRank construction semantics beyond the unrolled-CTE hash. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("star corpus: the hub word outranks every leaf; isolated words drop out") {
    // "hub x" sentences: hub is adjacent to 4 distinct leaves, each
    // leaf only to hub -> star graph, hub must dominate. "solo solo"
    // never neighbors a DIFFERENT word -> no vertex at all.
    val docs = Seq(
      (1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "hub delta"), (5L, "solo solo")
    ).toDF("doc_id", "text")
    val got = TextRank.textRank(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 5, s"4 leaves + hub, no solo: $got")
    assert(!got.contains("solo"))
    val leaves = Seq("alpha", "beta", "gamma", "delta").map(got)
    assert(leaves.distinct.size == 1, "leaves are symmetric")
    assert(got("hub") > leaves.head, "hub outranks leaves")
  }

  test("centrality beats raw frequency: a bridging word outranks a repeated one") {
    // "noise" appears 6 times but always next to the same partner;
    // "bridge" appears 3 times connecting three separate word pairs.
    val docs = Seq(
      (1L, "noise buddy noise buddy noise buddy noise buddy noise buddy noise buddy"),
      (2L, "one bridge two"), (3L, "three bridge four"),
      (4L, "five bridge six")
    ).toDF("doc_id", "text")
    val got = TextRank.textRank(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("bridge") > got("noise"),
      s"bridge ${got("bridge")} must outrank noise ${got("noise")}")
  }

  test("edges are distinct-unweighted and undirected: repeats don't change ranks") {
    // same adjacency stated once vs stated 5 times -> identical ranks
    val once = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val many = Seq((1L, "a b a b a b"), (2L, "b c b c"), (3L, "c b"))
      .toDF("doc_id", "text")
    val r1 = TextRank.textRank(once).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = TextRank.textRank(many).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r2, s"$r1 vs $r2")
  }
}
