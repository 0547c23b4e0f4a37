package graft

import org.apache.spark.sql.functions._

/** Water-filling invariants of the UniMax budget allocator that the
  * row-hash oracle can't state as properties. */
class SamplingAllocSpec extends SparkSpec {

  test("unimax allocation exhausts the budget exactly, caps only the head") {
    val out = llm.Sampling.unimaxAlloc.fn(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val budget = 3L * total / 4L
    // Σ alloc ≡ B exactly — the remainder distribution leaves nothing
    assert(out.map(_._3).sum == budget,
      s"allocations ${out.map(_._3).sum} != budget $budget")
    // never allocate more than a language has
    for ((lang, c, a) <- out)
      assert(a <= c, s"$lang allocated $a of $c")
    // water-filling shape: every language is either taken whole or
    // capped at a common level (±1 for the remainder)
    val capped = out.filter { case (_, c, a) => a < c }
    assert(capped.nonEmpty, "budget < total must cap at least one language")
    val levels = capped.map(_._3).distinct.sorted
    assert(levels.length <= 2 && levels.last - levels.head <= 1,
      s"capped languages not at a common level: ${capped.mkString(", ")}")
    // affordability at k* implies c₍ₖ＊₎ ≤ t: a language taken whole is
    // never larger than the cap level itself
    val whole = out.filter { case (_, c, a) => a == c }
    if (whole.nonEmpty)
      assert(whole.map(_._2).max <= capped.map(_._3).min,
        s"a whole language exceeds the cap level: whole=${whole.toSeq} capped=${capped.toSeq}")
  }
}
