package graft

import org.apache.spark.sql.functions._
import graft.llm.{Bpe, Classifier}

/** The histogram split-finder must equal an exhaustive sequential
  * threshold search, and must rediscover the quality-gate stopword
  * rule exactly (the feature `stop_ratio_m` can express the label, so
  * a correct finder returns a perfect split there). Also pins the
  * BPE corpus encoder against a sequential reference. */
class ClassifierSpec extends SparkSpec {

  private def stumpRows(dir: String) =
    Classifier.qualityStump.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap

  test("split-finder equals an exhaustive sequential search") {
    val feats = Classifier.featureFrame(
      Tables.load(spark, sf001, "documents"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val got = stumpRows(sf001)
    for ((fname, fi) <- Seq("stop_ratio_m" -> 0, "rep_ratio_m" -> 1,
      "mean_wlen_c" -> 2, "n_tok" -> 3)) {
      val fv = feats.map(t => (t.productElement(fi).asInstanceOf[Long], t._5))
      val n = fv.length.toLong
      val nPos = fv.count(_._2 == 1L).toLong
      val cands = fv.map(_._1).distinct.sorted
      def correctGt(th: Long) =
        fv.count { case (v, y) => if (v > th) y == 1L else y == -1L }.toLong
      def correctLe(th: Long) =
        fv.count { case (v, y) => if (v <= th) y == 1L else y == -1L }.toLong
      val bg = cands.map(correctGt).max
      val bl = cands.map(correctLe).max
      val thrGt = cands.filter(correctGt(_) == bg).min
      val thrLe = cands.filter(correctLe(_) == bl).min
      assert(got(fname) == ((n, nPos, bg, thrGt, bl, thrLe)),
        s"$fname: ${got(fname)} != ($n, $nPos, $bg, $thrGt, $bl, $thrLe)")
    }
  }

  test("stump rediscovers the gate's stopword rule with a perfect split") {
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val rows = stumpRows(dir)
      val (n, _, bg, thrGt, _, _) = rows("stop_ratio_m")
      assert(bg == n, s"stop_ratio_m split imperfect at $dir: $bg / $n")
      // ⌊1000·stop/n⌋ ≥ 20 ⟺ 50·stop ≥ n, so the winning threshold
      // must sit immediately below 20
      assert(thrGt < 20, s"threshold $thrGt does not encode the 2% rule")
      // no other feature can express the label exactly here
      Seq("rep_ratio_m", "mean_wlen_c", "n_tok").foreach { f =>
        val (fn_, _, fbg, _, fbl, _) = rows(f)
        assert(fbg < fn_ && fbl < fn_, s"$f unexpectedly perfect")
      }
    }
  }

  test("BPE corpus encoding equals a sequential reference encoder") {
    val docs = Tables.load(spark, sf001, "documents")
    val merges = Bpe.trainMergesMemo(sf001, docs, 8).map(m => (m._1, m._2))
    def encRef(w: String): Int = {
      var syms = w.toVector.map(_.toString)
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var acc = Vector.empty[String]
        syms.foreach { s =>
          if (acc.nonEmpty && acc.last == l && s == r)
            acc = acc.init :+ (l + r)
          else acc = acc :+ s
        }
        syms = acc
      }
      syms.length
    }
    val want = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val ws = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      (r.getLong(0), ws.length.toLong, ws.map(encRef(_).toLong).sum,
        ws.map(_.length.toLong).sum)
    }.sortBy(_._1).toSeq
    val got = Bpe.bpeEncode.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("training on a corpus of single-char words yields no merges") {
    import spark.implicits._
    val one = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(one, 3).isEmpty)
  }

  test("eval metrics equal a confusion matrix recomputed from q_lang_id rows") {
    val per = llm.TextStats.langId.fn(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")))
    val classes = (per.map(_._1) ++ per.map(_._2)).distinct.sorted
    val got = llm.Classifier.evalMetrics.fn(spark, sf001).collect()
      .map(r => r.getAs[String]("cls") -> r).toMap
    assert(got.keys.toSeq.sorted == classes.toSeq)
    classes.foreach { c =>
      val nGold = per.count(_._1 == c).toLong
      val nPred = per.count(_._2 == c).toLong
      val tp = per.count(p => p._1 == c && p._2 == c).toLong
      val r = got(c)
      assert(r.getAs[Long]("n_gold") == nGold && r.getAs[Long]("n_pred") == nPred
        && r.getAs[Long]("tp") == tp, s"counts for $c")
      assert(r.getAs[Long]("fp") == nPred - tp && r.getAs[Long]("fn") == nGold - tp)
      assert(r.getAs[Long]("precision_ppm") ==
        (if (nPred == 0) 0L else tp * 1000000L / nPred), s"precision for $c")
      assert(r.getAs[Long]("recall_ppm") ==
        (if (nGold == 0) 0L else tp * 1000000L / nGold), s"recall for $c")
      assert(r.getAs[Long]("f1_ppm") == 2L * tp * 1000000L / (nPred + nGold))
    }
  }
}
