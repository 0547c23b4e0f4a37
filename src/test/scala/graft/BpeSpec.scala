package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Distributed BPE training must equal a sequential reference trainer
  * exactly: same word counts in, same ordered merge list out. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: greedy left-to-right merge application,
    * argmax by (count desc, left asc, right asc). */
  private def refMerges(wordCounts: Map[String, Long],
      k: Int): Seq[(String, String, Long)] = {
    var tbl: Map[Vector[String], Long] =
      wordCounts.groupMapReduce { case (w, _) => w.toVector.map(_.toString) }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val ((l, r), pc) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, pc))
        tbl = tbl.groupMapReduce { case (syms, _) => applyRef(syms, l, r) }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def applyRef(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
      else acc :+ s
    }

  test("distributed merges equal the sequential reference on the corpus") {
    val docs = Tables.load(spark, sf001, "documents").select("doc_id", "text")
    val wordCounts = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(rr => rr.getString(0) -> rr.getLong(1)).toMap
    val got = Bpe.trainMerges(docs, k = 8)
    val want = refMerges(wordCounts, k = 8)
    assert(got == want, s"distributed $got != reference $want")
  }

  test("merge application is greedy left-to-right without overlap") {
    val df = Seq((Seq("a", "a", "a", "a"), 1L), (Seq("a", "a", "a"), 1L),
      (Seq("b", "a", "a"), 1L), (Seq("a"), 1L))
      .toDF("syms", "cnt")
    val out = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "aa"), List("aa", "a"),
      List("b", "aa"), List("a")))
  }

  test("training is deterministic run to run") {
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").limit(100)
    assert(Bpe.trainMerges(docs, k = 5) == Bpe.trainMerges(docs, k = 5))
  }

  test("declared query: 8 distinct positively-supported merges, ranked") {
    val rows = Bpe.bpeMerges.fn(spark, sf001).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(rows.map(rr => (rr.getString(1), rr.getString(2))).distinct.length == 8)
    assert(rows.forall(_.getLong(3) > 0))
    // each merged symbol is the concatenation of its parts — and later
    // merges may build on earlier ones (that is what BPE is for)
    rows.foreach(rr => assert((rr.getString(1) + rr.getString(2)).nonEmpty))
  }
}
