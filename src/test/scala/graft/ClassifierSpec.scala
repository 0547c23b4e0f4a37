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

  test("feature AUC equals brute-force pair counting under heavy ties") {
    import spark.implicits._
    // ties within and across classes exercise the midrank path
    val feats = Seq(
      (1L, 5L, 5L, 10L, 1L), (2L, 5L, 4L, 10L, -1L), (3L, 7L, 4L, 12L, 1L),
      (4L, 7L, 3L, 15L, -1L), (5L, 2L, 3L, 15L, 1L), (6L, 2L, 2L, 15L, -1L),
      (6L, 9L, 2L, 20L, 1L), (1L, 9L, 1L, 20L, -1L)
    ).toDF("stop_ratio_m", "rep_ratio_m", "mean_wlen_c", "n_tok", "y")
    val got = llm.Classifier.featureAucOf(feats).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = feats.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((fname, fi) <- Seq("stop_ratio_m" -> 0, "rep_ratio_m" -> 1,
      "mean_wlen_c" -> 2, "n_tok" -> 3)) {
      val pos = rows.filter(_._5 == 1L).map(_.productElement(fi).asInstanceOf[Long])
      val neg = rows.filter(_._5 == -1L).map(_.productElement(fi).asInstanceOf[Long])
      // u2 = 2·U = Σ_pairs (2 if p > n, 1 if tie, 0 otherwise)
      val u2 = (for (p <- pos; q <- neg)
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      val aucPpm = math.round(u2.toDouble /
        ((2.0 * pos.length) * neg.length) * 1000000.0)
      assert(got(fname) == ((pos.length.toLong, neg.length.toLong, u2, aucPpm)),
        s"feature $fname")
    }
  }

  test("calibration bins and rollup total recompute from the feature frame") {
    val feats = Classifier.featureFrame(
      Tables.load(spark, sf001, "documents")).collect()
      .map(r => (r.getLong(1), r.getLong(5)))  // (stop_ratio_m, y)
    val scored = feats.map { case (srm, y) =>
      val conf = math.min(1000L, 50L * srm)
      (math.min(9L, conf / 100), if (y == 1L) 1L else 0L, conf)
    }
    val got = Classifier.calibration.fn(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val bins = scored.groupBy(_._1).view.mapValues(_.toSeq).toSeq :+
      (-1L -> scored.toSeq)
    assert(got.keys.toSet == bins.map(_._1).toSet)
    for ((bin, members) <- bins) {
      val n = members.size.toLong
      val nPos = members.map(_._2).sum
      val sumConf = members.map(_._3).sum
      val acc = 1000000L * nPos / n
      val conf = 1000L * sumConf / n
      assert(got(bin) == ((n, nPos, sumConf, acc, conf, math.abs(conf - acc))),
        s"bin $bin")
    }
  }

  test("Cohen's kappa recomputes from the q_lang_id confusion counts") {
    val per = llm.TextStats.langId.fn(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")))
    val n = per.length.toLong
    val agree = per.count(p => p._1 == p._2).toLong
    val chance = per.groupBy(_._1).map { case (c, g) =>
      g.length.toLong * per.count(_._2 == c) }.sum
    val r = Classifier.cohensKappa.fn(spark, sf001).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == agree && r.getLong(2) == chance)
    assert(r.getLong(3) == 1000000L * agree / n)
    assert(r.getLong(4) == math.round(
      (n * agree - chance).toDouble / (n * n - chance).toDouble * 1000000.0))
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

  test("MI ranking: stopword feature dominates (the label is its function)") {
    val out = Classifier.miFeatures.fn(spark, sf001)
      .select("feature", "n_values", "mi_micro")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1).sorted ==
      Seq("mean_wlen_c", "n_tok", "rep_ratio_m", "stop_ratio_m"))
    val mi = out.map(t => t._1 -> t._3).toMap
    // MI ≥ 0 up to per-cell rounding (one micro-nat per cell at most)
    for ((f, nv, m) <- out)
      assert(m >= -2 * nv, s"$f: MI $m below the rounding floor")
    // the gate label is a threshold of the stopword ratio, so that
    // feature must carry the most information about it
    assert(mi("stop_ratio_m") == mi.values.max,
      s"stop_ratio_m not the top feature: $mi")
    assert(mi("stop_ratio_m") > 0L)
  }

  test("logreg training trajectory equals a sequential reference; accuracy improves") {
    val out = Classifier.logregTrain.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // independent driver-side replay of the exact fixed-point recipe
    val feats = Tables.load(spark, sf001, "documents")
      .select(org.apache.spark.sql.functions.expr(
        "size(filter(split(trim(text), '\\\\s+'), tk -> tk IN ('a','the')))").as("s"),
        org.apache.spark.sql.functions.expr(
          "size(split(trim(text), '\\\\s+'))").as("n"))
      .collect().map(r => {
        val s = r.getInt(0).toLong; val n = r.getInt(1).toLong
        (1L, 50L * s - n, n, if (50L * s >= n) 1L else 0L)
      })
    var w = Array(0L, 0L, 0L)
    val ref = (1 to 4).map { it =>
      var g = Array(0L, 0L, 0L); var loss = 0L; var correct = 0L
      for ((x0, x1, x2, y) <- feats) {
        val z = w(0) * x0 + w(1) * x1 + w(2) * x2
        val zc = math.max(-20000000L, math.min(20000000L, z))
        val p = 1.0 / (1.0 + math.exp(-zc.toDouble / 1e6))
        val gm = math.round(1e6 * (p - y))
        g = Array(g(0) + gm * x0, g(1) + gm * x1, g(2) + gm * x2)
        val m = if (y == 1L) zc else -zc
        loss += math.round(1e6 * math.log(1.0 + math.exp(-m.toDouble / 1e6)))
        correct += (if ((z >= 0) == (y == 1L)) 1L else 0L)
      }
      val nrows = feats.length.toLong
      w = Array.tabulate(3)(j => w(j) - math.floor(g(j).toDouble / (nrows * 64)).toLong)
      (it.toLong, loss, correct, w(0), w(1), w(2))
    }
    assert(out.toSeq == ref,
      s"distributed trajectory diverged from sequential reference:\n$out\nvs\n$ref")
    // word of the label is in the features: training must actually learn
    assert(out.last._3 > out.head._3, "accuracy did not improve over training")
    assert(out.last._2 < out.head._2, "loss did not decrease over training")
  }

  test("naive Bayes learns separable vocabularies perfectly, survives unseen tokens") {
    import spark.implicits._
    def occ(rows: Seq[(Long, String, String)]) = rows.flatMap { case (id, lab, text) =>
      text.split(" ").map(tok => (id, lab, tok))
    }.toDF("doc_id", "label", "tok")
    val train = occ(Seq(
      (1L, "A", "aa bb cc aa"), (2L, "A", "bb cc aa bb"), (3L, "A", "cc aa"),
      (4L, "B", "xx yy zz"), (5L, "B", "yy zz xx yy"), (6L, "B", "zz xx")))
    val test = occ(Seq(
      (10L, "A", "aa bb"), (11L, "A", "cc cc aa"),
      (12L, "B", "xx zz"), (13L, "B", "yy UNSEEN zz")))
    val got = ops_nb(train, test)
    assert(got == Map(10L -> "A", 11L -> "A", 12L -> "B", 13L -> "B"))
  }

  test("naive Bayes argmax tie breaks on the class name") {
    import spark.implicits._
    // perfectly symmetric classes: every score ties, "A" < "B" wins
    val train = Seq((1L, "A", "tt"), (2L, "B", "tt"))
      .toDF("doc_id", "label", "tok")
    val test = Seq((9L, "B", "tt")).toDF("doc_id", "label", "tok")
    assert(ops_nb(train, test) == Map(9L -> "A"))
  }

  private def ops_nb(train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame): Map[Long, String] = {
    import spark.implicits._
    llm.Classifier.nbClassify(train, test)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
  }

  test("q_nb_train confusion matrix accounts for every held-out doc") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("q_nb_train")(spark, sf001)
      .agg(sum("n_docs")).head().getLong(0)
    val held = Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(m == held, s"matrix covers $m of $held held-out docs")
  }

  test("lift curve: deciles tile the population, capture is monotone to 1000") {
    val rows = SparkEntry.queries("q_lift_curve")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0L until 10L).toSeq, "all ten deciles present")
    val n = Tables.load(spark, sf001, "orders").count()
    assert(rows.map(_._2).sum == n, "deciles tile the orders table")
    // equal-depth up to integer rounding
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    val captures = rows.map(_._4)
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b })
    assert(captures.last == 1000L, s"final capture ${captures.last}")
  }

  // --- isotonic regression (minimax closed form) ------------------------

  /** Textbook PAVA pooling loop — the independent reference. */
  private def pavaRef(blocks: Seq[(Long, Long)]): Seq[Double] = {
    // each pooled block: (n, pos)
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    blocks.foreach { case (n, pos) =>
      var cur = (n, pos, 1)
      while (stack.nonEmpty && {
        val (pn, pp, _) = stack.last
        pp.toDouble / pn >= cur._2.toDouble / cur._1
      }) {
        val (pn, pp, pc) = stack.remove(stack.size - 1)
        cur = (pn + cur._1, pp + cur._2, pc + cur._3)
      }
      stack += cur
    }
    stack.flatMap { case (n, pos, c) =>
      Seq.fill(c)(pos.toDouble / n)
    }.toSeq
  }

  test("minimax isotonic fit equals the PAVA pooling loop on randomized cases") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val m = 6 + rnd.nextInt(10)
      val blocks = (0 until m).map { _ =>
        val n = 1L + rnd.nextInt(50)
        (n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val g = blocks.zipWithIndex
        .map { case ((n, pos), i) => (i.toLong, n, pos) }
        .toDF("level", "n", "n_pos")
      val got = Classifier.isotonicFit(g).collect()
        .sortBy(_.getLong(0)).map(_.getLong(3))
      val want = pavaRef(blocks).map(v => math.round(v * 1e6))
      assert(got.toSeq == want.toSeq,
        s"seed $seed: minimax ${got.toSeq} != PAVA ${want.toSeq}")
    }
  }

  test("q_tree_depth2: branches tile the corpus and never undercut the root") {
    val rows = Classifier.treeDepth2.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("correct"))).toMap
    assert(rows.keySet == Set("root", "le", "gt"))
    val (nRoot, cRoot) = rows("root")
    assert(rows("le")._1 + rows("gt")._1 == nRoot, "branches must tile the corpus")
    // each branch's best split can at worst replicate the root's leaf
    // labeling, so depth-2 correct >= depth-1 correct
    val c2 = rows("le")._2 + rows("gt")._2
    assert(c2 >= cRoot, s"depth-2 $c2 undercuts root $cRoot")
    assert(cRoot > nRoot / 2, "root must beat the majority-class baseline")
  }

  test("q_random_forest: subset discipline and perfect stop-feature bags") {
    val fnames = Seq("mean_wlen_c", "n_tok", "rep_ratio_m", "stop_ratio_m")
    val rows = Classifier.randomForest.fn(spark, sf001).collect()
    assert(rows.length == 8, s"expected 8 bags, got ${rows.length}")
    rows.foreach { r =>
      val (b, f) = (r.getAs[Long]("b"), r.getAs[String]("feature"))
      val allowed = Seq(b % 4, (b + 1) % 4, (b + 2) % 4).map(i => fnames(i.toInt))
      assert(allowed.contains(f), s"bag $b chose $f outside subset $allowed")
      val (nInbag, correct) = (r.getAs[Long]("n_inbag"), r.getAs[Long]("correct"))
      assert(correct <= nInbag, s"bag $b correct $correct > in-bag $nInbag")
      // the stopword feature expresses the label, so any bag allowed
      // to use it must fit a PERFECT weighted split
      if (allowed.contains("stop_ratio_m"))
        assert(correct == nInbag, s"bag $b imperfect: $correct / $nInbag")
      // the two bags without it cannot be perfect (no other feature
      // expresses the gate rule — same claim the stump spec pins)
      else assert(correct < nInbag, s"bag $b unexpectedly perfect")
    }
  }

  test("q_gb_step: leaves tile the corpus, doubled-score identity, floor holds") {
    val rows = Classifier.gbStep.fn(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val n = rows.map(_.getAs[Long]("n")).sum
    val nDocs = Tables.load(spark, sf001, "documents").count()
    assert(n == nDocs, s"leaves cover $n of $nDocs documents")
    // 2·(F0 + η·Δ) = F0 + rate_leaf: score2 − leaf_rate must be the
    // one global rate for every leaf
    val diffs = rows.map(r =>
      r.getAs[Long]("score2_micro") - r.getAs[Long]("leaf_rate_micro")).distinct
    assert(diffs.length == 1, s"global-rate term not constant: ${diffs.toSeq}")
    // the provable floor, re-derived from the output itself
    val pos = rows.map(_.getAs[Long]("n_pos")).sum
    val corr = rows.map(_.getAs[Long]("n_correct")).sum
    assert(corr >= math.max(pos, n - pos),
      s"boosted $corr undercuts majority ${math.max(pos, n - pos)}")
  }

  test("q_cv_stump: folds tile the corpus and train/held partition it") {
    val rows = Classifier.cvStump.fn(spark, sf001).collect()
    assert(rows.length == 5, s"expected 5 folds, got ${rows.length}")
    val nDocs = Tables.load(spark, sf001, "documents").count()
    val heldByFold = rows.map(r =>
      r.getAs[Long]("fold") -> r.getAs[Long]("n_held")).toMap
    assert(heldByFold.values.sum == nDocs, "heldout folds must tile the corpus")
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      assert(r.getAs[Long]("n_train") + heldByFold(f) == nDocs,
        s"fold $f: train+held != corpus")
      assert(r.getAs[Long]("train_correct") <= r.getAs[Long]("n_train"))
      assert(r.getAs[Long]("held_correct") <= heldByFold(f))
    }
  }

  test("q_isotonic: monotone fit that preserves total mass") {
    val rows = Classifier.isotonic.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val fit = rows.map(_.getLong(3))
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b }, "fit not monotone")
    // isotonic projection preserves the grand mean over its blocks
    val totPos = rows.map(_.getLong(2)).sum.toDouble
    val totFit = rows.map(r => r.getLong(3) / 1e6 * r.getLong(1)).sum
    assert(math.abs(totFit - totPos) < 1e-3 * totPos + 1.0,
      s"mass not preserved: $totFit vs $totPos")
  }

  test("q_woe_iv: WOE recomputes from the bin counts; IV contributions never negative") {
    val rows = Classifier.woeIv.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val gt = rows.map(_._2).sum; val bt = rows.map(_._3).sum
    rows.foreach { case (bin, g, b, woe, iv) =>
      val want = BigDecimal(math.log(((g + 1) * (bt + 10)).toDouble /
        ((b + 1) * (gt + 10)).toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(woe == want, s"bin $bin: woe $woe != $want")
      // (p - q) and ln(p/q) share sign, so each IV term is >= 0
      assert(iv >= 0L, s"bin $bin: negative IV contribution $iv")
      assert(iv == ((g + 1) * (bt + 10) - (b + 1) * (gt + 10)) * woe)
    }
    // a bin voting good has positive WOE, voting bad negative
    rows.foreach { case (bin, g, b, woe, _) =>
      if ((g + 1).toDouble * (bt + 10) > (b + 1).toDouble * (gt + 10))
        assert(woe >= 0L, s"bin $bin")
      else assert(woe <= 0L, s"bin $bin")
    }
  }
}
