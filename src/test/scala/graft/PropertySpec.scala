package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Recency

/** ScalaCheck property tests (SURVEY.md §5 item 3). Scalar-level
  * properties run through Spark expressions on driver-built frames;
  * frame-level properties (filter ⊆ input, topK ≡ sort.take) run on
  * small random frames. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("recency ladder is total and monotone non-increasing (property)") {
    import spark.implicits._
    val days = Gen.chooseNum(-5, 10000)
    check(forAll(days, days) { (a, b) =>
      val Seq(sa, sb) = Seq(a, b).map { d =>
        Seq(Tuple1(d)).toDF("d")
          .select(Recency.score(col("d"), Seq(1, 3, 5, 7))).collect().head.getInt(0)
      }
      (sa >= 1 && sa <= 5) && (a > b || sa >= sb)
    })
  }

  test("trim and upper are idempotent through Spark expressions (property)") {
    import spark.implicits._
    check(forAll(Gen.asciiPrintableStr) { s =>
      val r = Seq(Tuple1(s)).toDF("s")
        .select(trim(col("s")).as("t"), upper(col("s")).as("u"),
          trim(trim(col("s"))).as("tt"), upper(upper(col("s"))).as("uu"))
        .collect().head
      r.getString(0) == r.getString(2) && r.getString(1) == r.getString(3)
    })
  }

  test("filter output is a subset of input; filter+complement partition it (property)") {
    import spark.implicits._
    val xs = Gen.listOfN(40, Gen.chooseNum(-100, 100))
    check(forAll(xs) { l =>
      val df = l.zipWithIndex.toDF("v", "id")
      val kept = df.filter(col("v") > 0).select("id").as[Int].collect().toSet
      val dropped = df.filter(!(col("v") > 0)).select("id").as[Int].collect().toSet
      kept.subsetOf(l.indices.toSet) &&
        (kept ++ dropped) == l.indices.toSet && (kept & dropped).isEmpty
    })
  }

  test("orderBy.limit(k) equals global sort take(k) (property)") {
    import spark.implicits._
    val xs = Gen.listOfN(50, Gen.chooseNum(-1000, 1000))
    check(forAll(xs) { l =>
      val df = l.zipWithIndex.toDF("v", "id")
      val topk = df.orderBy(col("v").desc, col("id").asc).limit(7)
        .select("v", "id").as[(Int, Int)].collect().toSeq
      val want = l.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(7)
      topk == want
    })
  }

  test("upsertLatest == last-writer-wins map semantics (property)") {
    import spark.implicits._
    // keys collide across base/delta; versions collide within a key so
    // the window tiebreak path is exercised only where the contract
    // (unique key+version) holds — generate unique versions per key
    val rows = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(-50L, 50L)))
    check(forAll(rows, rows) { (b, d) =>
      def dedupe(l: List[(Long, Long)], vOff: Long) =
        l.distinctBy(_._1).map { case (k, x) => (k, vOff, x) }
      val base = dedupe(b, 0L)
      val delta = dedupe(d, 1L)
      val got = graft.ops.Merge.upsertLatest(
          base.toDF("k", "version", "x"), delta.toDF("k", "version", "x"),
          Seq("k"), "version")
        .select("k", "version", "x").as[(Long, Long, Long)].collect().toSet
      val want = (base.map(r => r._1 -> r) ++ delta.map(r => r._1 -> r)).toMap.values.toSet
      got == want
    })
  }

  test("suffix-blocked fuzzy join recovers every corruption outside the block key (property)") {
    import spark.implicits._
    // names = random 8-char prefix + unique 3-digit suffix; corrupt one
    // prefix char (never the suffix) — the blocked join's recall
    // contract: any ≤2-edit corruption that leaves the block intact is
    // always recovered, and every reported pair satisfies both the
    // block equality and the distance bound
    val prefixes = Gen.listOfN(12, Gen.stringOfN(8, Gen.oneOf('a', 'b')))
    val posGen = Gen.chooseNum(0, 7)
    check(forAll(prefixes, posGen, Gen.oneOf('x', 'y')) { (ps, pos, c) =>
      val clean = ps.zipWithIndex.map { case (p, i) => (i.toLong, f"$p%s${i}%03d") }
      val dirty = clean.map { case (i, n) =>
        (i, n.updated(pos, if (n(pos) == c) 'z' else c))
      }
      val got = dirty.toDF("d_id", "d_name")
        .join(clean.toDF("k_id", "k_name"),
          substring(col("d_name"), -3, 3) === substring(col("k_name"), -3, 3) &&
            levenshtein(col("d_name"), col("k_name")) <= 2)
        .select("d_id", "k_id").as[(Long, Long)].collect().toSet
      // every row recovers its own original; suffixes are unique so no
      // cross-row pair shares a block
      got == clean.map(r => (r._1, r._1)).toSet
    })
  }

  test("snapshot full-outer diff == brute-force map diff (property)") {
    import spark.implicits._
    val rows = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 3L)))
    check(forAll(rows, rows) { (o, n) =>
      val old = o.distinctBy(_._1)
      val neu = n.distinctBy(_._1)
      val got = old.toDF("k", "v").select(col("k").as("old_key"), col("v").as("old_v"))
        .join(neu.toDF("k", "v").select(col("k").as("new_key"), col("v").as("new_v")),
          col("old_key") === col("new_key"), "full_outer")
        .select(coalesce(col("old_key"), col("new_key")).as("key"),
          when(col("old_key").isNull, "added")
            .when(col("new_key").isNull, "removed")
            .when(col("old_v") =!= col("new_v"), "changed")
            .otherwise("unchanged").as("change"))
        .filter(col("change") =!= "unchanged")
        .as[(Long, String)].collect().toSet
      val om = old.toMap; val nm = neu.toMap
      val want =
        (nm.keySet -- om.keySet).map(_ -> "added") ++
          (om.keySet -- nm.keySet).map(_ -> "removed") ++
          (om.keySet & nm.keySet).filter(k => om(k) != nm(k)).map(_ -> "changed")
      got == want
    })
  }

  test("TopKAgg bounded-heap aggregate == window row_number form (property, heavy ties)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // narrow value range forces duplicate sort keys so the id
    // tie-break is exercised; few groups so merge paths fire
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 200L)))
    check(forAll(rows) { l =>
      l.isEmpty || {
        val df = l.zipWithIndex
          .map { case ((g, v, _), i) => (g, v, i.toLong) }
          .toDF("g", "v", "id").repartition(8)
        val viaAgg = df.groupBy("g")
          .agg(graft.functions.TopKAgg(col("v"), col("id"), 4).as("top"))
          .select(col("g"), posexplode(col("top")))
          .select(col("g"), col("pos"), col("col.sort_key"), col("col.id"))
          .as[(Long, Int, Long, Long)].collect().toSet
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
        val viaWindow = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .select(col("g"), (col("rn") - 1).cast("int"), col("v"), col("id"))
          .as[(Long, Int, Long, Long)].collect().toSet
        viaAgg == viaWindow
      }
    })
  }

  private def checkFew(p: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(r.passed, r.status.toString)
  }

  test("k-center greedy: radii non-increasing, centers distinct, seeded at min id (property)") {
    import spark.implicits._
    val pts = Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)).map(_.take(10).distinct)
    checkFew(forAll(pts) { xs =>
      val vecs = xs.zipWithIndex
        .map { case (x, i) => (i.toLong, Array(x / 1000.0f)) }
        .toDF("vec_id", "embedding")
      val k = math.min(3, xs.length)
      val out = llm.Sampling.kcenterOf(vecs, k)
        .as[(Long, Long, Long)].collect()
      val radii = out.map(_._3)
      out.length == k &&
        out.head._2 == 0L &&
        radii.zip(radii.tail).forall { case (a, b) => a >= b } &&
        out.map(_._2).distinct.length == k
    })
  }

  test("ACF is shift-invariant and bounded by ±1000 permille (property)") {
    import spark.implicits._
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")
    val series = Gen.listOfN(10, Gen.chooseNum(0L, 1000L))
    val shift = Gen.chooseNum(1L, 100000L)
    checkFew(forAll(series, shift) { (ms, c) =>
      def frame(off: Long) = ms.zipWithIndex
        .map { case (m, d) => ("x", day(d), m + off) }.toDF("event_type", "day", "m")
      def rows(off: Long) = llm.Events.acfOf(frame(off)).collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val base = rows(0L)
      base == rows(c) &&
        base.forall { case (_, r) => r.forall(v => v >= -1000L && v <= 1000L) }
    })
  }

  test("CUSUM scales linearly with the series and keeps its change day (property)") {
    import spark.implicits._
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")
    val series = Gen.listOfN(8, Gen.chooseNum(0L, 1000L))
    val scale = Gen.chooseNum(2L, 50L)
    checkFew(forAll(series, scale) { (ms, c) =>
      def detect(f: Long => Long) = llm.Events.cusumDetect(
        ms.zipWithIndex.map { case (m, d) => ("x", day(d), f(m), 1L) }
          .toDF("event_type", "day", "sd", "nd")).collect().head
      val base = detect(identity)
      val scaled = detect(_ * c)
      scaled.getLong(3) == base.getLong(3) * c &&
        scaled.getTimestamp(2) == base.getTimestamp(2)
    })
  }
}
