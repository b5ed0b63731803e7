package graft

import org.apache.spark.sql.functions._
import graft.operators.ClassifyOps

/** Hand-computed multinomial-NB fixtures (IIR ch.13 arithmetic):
  * train = {1:"a b a"/x, 2:"a c"/x, 3:"d d"/y} →
  * tokens x = [a,b,a,a,c] (5), y = [d,d] (2), V = {a,b,c,d} (4),
  * priors ln(2/3) / ln(1/3),
  * lp(w|x) = ln((cnt+1)/9), lp(w|y) = ln((cnt+1)/6). */
class ClassifyOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private val train = Seq(
    (1L, "a b a", "x"), (2L, "a c", "x"), (3L, "d d", "y"))
    .toDF("doc_id", "text", "lbl")

  test("nbClassify reproduces the hand-computed smoothed scores") {
    val out = ClassifyOps.nbClassify(
      train, col("text"), col("lbl"),
      train, col("doc_id"), col("text"), Some(col("lbl")))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1 "a b a": x = ln(2/3) + 2·r(ln(4/9)) + r(ln(2/9))
    //                y = ln(1/3) + 3·r(ln(1/6))   (a, b unseen in y)
    val sx1 = r6(math.log(2.0 / 3)) + r6(math.log(4.0 / 9)) * 2 +
      r6(math.log(2.0 / 9))
    val sy1 = r6(math.log(1.0 / 3)) + r6(math.log(1.0 / 6)) * 3
    assert(sx1 > sy1)
    assert(out(1L)._1 == "x" && out(1L)._2 == 3L)
    assert(math.abs(out(1L)._3 - sx1.toDouble) < 1e-9)
    // doc 3 "d d": y = ln(1/3) + 2·r(ln(3/6)) wins over
    //              x = ln(2/3) + 2·r(ln(1/9))   (d unseen in x)
    val sy3 = r6(math.log(1.0 / 3)) + r6(math.log(3.0 / 6)) * 2
    val sx3 = r6(math.log(2.0 / 3)) + r6(math.log(1.0 / 9)) * 2
    assert(sy3 > sx3)
    assert(out(3L)._1 == "y")
    assert(math.abs(out(3L)._3 - sy3.toDouble) < 1e-9)
  }

  test("unseen words take the class-specific smoothed zero likelihood") {
    val apply = Seq((9L, "e e")).toDF("doc_id", "text")
    val out = ClassifyOps.nbClassify(
      train, col("text"), col("lbl"),
      apply, col("doc_id"), col("text")).collect()
    assert(out.length == 1)
    // oov_x = r(ln(1/9)), oov_y = r(ln(1/6)); y's smaller denominator wins
    // despite x's larger prior.
    val sy = r6(math.log(1.0 / 3)) + r6(math.log(1.0 / 6)) * 2
    val sx = r6(math.log(2.0 / 3)) + r6(math.log(1.0 / 9)) * 2
    assert(sy > sx)
    assert(out(0).getString(1) == "y")
    assert(math.abs(out(0).getDouble(3) - sy.toDouble) < 1e-9)
  }

  test("exact score ties break to the ascending label") {
    val sym = Seq((1L, "a", "x"), (2L, "a", "y")).toDF("doc_id", "text", "lbl")
    // Symmetric by construction: equal priors ln(1/2), equal totals,
    // lp(a|x) = lp(a|y) = ln(2/2) = 0 → both classes score identically.
    val out = ClassifyOps.nbClassify(
      sym, col("text"), col("lbl"),
      Seq((5L, "a")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
    assert(out(0).getString(1) == "x")
    assert(math.abs(out(0).getDouble(3) - r6(math.log(0.5)).toDouble) < 1e-9)
  }

  test("q110 self-classification beats the prior-only baseline") {
    // The learned model must be better than always predicting the modal
    // class — the minimum bar for "the classifier learned something".
    val docs = Tables.documents(spark, sf)
    val out = ClassifyOps.nbClassify(
      docs, col("text"), col("lang"),
      docs, col("doc_id"), col("text"), Some(col("lang")))
    val n = out.count().toDouble
    val correct = out.where(col("label") === col("pred_label")).count().toDouble
    val modal = docs.groupBy("lang").count()
      .agg(max("count")).head().getLong(0).toDouble
    assert(correct / n > modal / n,
      s"NB accuracy ${correct / n} must beat modal-class ${modal / n}")
  }

  test("held-out accuracy beats modal-class where the signal exists") {
    // The generalization gate, on a corpus whose labels actually
    // correlate with vocabulary: each lang has its own token set plus
    // shared noise. (The driver's synthetic documents table draws every
    // lang from ONE shared vocabulary — label/text near-independence —
    // so no classifier can beat modal out-of-sample there; measured
    // held-out 0.35-0.43 vs modal 0.44 at both sf dirs. The gate
    // belongs on data where the property is achievable; the documents
    // table gets the overfitting-DETECTION pin below.)
    val langWords = Map(
      "aa" -> Seq("rot", "blau", "grün"),
      "bb" -> Seq("red", "blue", "green"),
      "cc" -> Seq("rojo", "azul", "verde"))
    val noise = Seq("data", "table", "row")
    val docs = (0 until 120).map { i =>
      val l = Seq("aa", "bb", "cc")(i % 3)
      val w = langWords(l)
      val text = Seq(w(i % 3), noise(i % 3), w((i + 1) % 3),
        noise((i + 1) % 3), w((i * 7 + 1) % 3)).mkString(" ")
      (i.toLong, text + s" x$i", l) // x$i: unique token → hash spread
    }.toDF("doc_id", "text", "lang")
    val split = graft.operators.TextOps.hashSplit(
      docs, col("doc_id"), col("text"))
    val withSplit = docs.join(split.select("doc_id", "split"), "doc_id")
    val train = withSplit.where(col("split") === "train")
    val held = withSplit.where(col("split") =!= "train")
    val out = ClassifyOps.nbClassify(
      train, col("text"), col("lang"),
      held, col("doc_id"), col("text"), Some(col("lang")))
    val n = out.count().toDouble
    val correct = out.where(col("label") === col("pred_label")).count().toDouble
    val modal = held.groupBy("lang").count()
      .agg(max("count")).head().getLong(0).toDouble
    assert(n > 0 && correct / n > modal / n,
      s"held-out NB accuracy ${correct / n} must beat modal ${modal / n}")
  }

  test("the held-out face detects in-sample bias (q118 vs q110 accuracy)") {
    // What q118 exists to measure: on the driver's corpus, in-sample
    // accuracy clears the modal bar (the q110 gate) while held-out
    // accuracy falls back toward/below it — the in-sample optimism a
    // self-scored confusion can never reveal. Pin that the gap is
    // visible and the held-out scoring path is well-formed (every
    // held-out doc classified exactly once, train/held disjoint).
    val docs = Tables.documents(spark, sf)
    val split = graft.operators.TextOps.hashSplit(
      docs, col("doc_id"), col("text"))
    val withSplit = docs.join(split.select("doc_id", "split"), "doc_id")
    val train = withSplit.where(col("split") === "train").cache()
    val held = withSplit.where(col("split") =!= "train")
    // the q118 oracle's static label list must equal train's domain
    assert(train.select("lang").distinct().as[String].collect().sorted
      .toSeq == Seq("de", "en", "es", "fr", "zh"),
      "every language must appear in the train split")
    def accuracy(eval: org.apache.spark.sql.DataFrame): Double = {
      val out = ClassifyOps.nbClassify(
        train, col("text"), col("lang"),
        eval, col("doc_id"), col("text"), Some(col("lang")))
      out.where(col("label") === col("pred_label")).count().toDouble /
        out.count().toDouble
    }
    val heldN = held.count()
    assert(heldN > 0 &&
      train.join(held, "doc_id").count() == 0, "splits must be disjoint")
    val selfAcc = accuracy(train)
    val heldAcc = accuracy(held)
    assert(selfAcc > heldAcc,
      s"in-sample optimism must be visible: self $selfAcc vs held $heldAcc")
    // held-out scoring classifies every doc exactly once
    val out = ClassifyOps.nbClassify(train, col("text"), col("lang"),
      held, col("doc_id"), col("text"), Some(col("lang")))
    assert(out.count() == heldN &&
      out.select("doc_id").distinct().count() == heldN)
    train.unpersist(blocking = false)
  }

  test("scoreAuc: perfect, inverted, tied, and hand-computed mixed rankings") {
    import graft.operators.ClassifyOps
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val df = rows.toDF("s", "y")
      val r = ClassifyOps.scoreAuc(df, col("s"), col("y")).collect().head
      if (r.isNullAt(r.fieldIndex("auc"))) None
      else Some(r.getAs[Double]("auc"))
    }
    // perfect separation -> 1.0; inverted -> 0.0
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false))) === Some(1.0))
    assert(auc(Seq((0.1, true), (0.2, true), (0.9, false))) === Some(0.0))
    // all scores equal -> midrank AUC exactly 0.5
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true))) === Some(0.5))
    // one swapped pair out of 2x2 -> 3 of 4 pairs ordered = 0.75
    assert(auc(Seq((0.9, true), (0.8, false), (0.7, true), (0.1, false)))
      === Some(0.75))
    // degenerate: single-class input -> NULL, not a division blowup
    assert(auc(Seq((0.9, true), (0.1, true))) === None)
  }

  test("cohenKappa: hand-computed agreement, chance correction, degenerate cases") {
    import graft.operators.ClassifyOps
    def kap(rows: Seq[(String, String)]) = {
      val r = ClassifyOps.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
      (r.getAs[Long]("n"), r.getAs[Long]("n_agree"),
        r.getAs[Double]("po"), r.getAs[Double]("pe"),
        Option(r.getAs[java.lang.Double]("kappa")))
    }
    // classic 2x2 fixture: conf = [[20,5],[10,15]], po=0.7,
    // pe = (30*25 + 20*25)/2500 = 0.5, kappa = 0.4
    val rows =
      Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    assert(kap(rows) === ((50L, 35L, 0.7, 0.5, Some(0.4))))
    // perfect agreement -> kappa 1; orthogonal labels -> pe 0 path absent,
    // total disagreement with symmetric marginals -> kappa negative
    assert(kap(Seq(("x", "x"), ("y", "y")))._5 === Some(1.0))
    val disagree = kap(Seq(("x", "y"), ("y", "x")))
    assert(disagree._5.exists(_ < 0))
    // agreement by majority echo: predictor always says 'x' -> kappa 0
    val echo = kap(Seq(("x", "x"), ("x", "x"), ("x", "x"), ("y", "x")))
    assert(echo._5 === Some(0.0))
  }

  test("confusionDrift: drop flags, stable passes, vanished/new labels flag") {
    import graft.operators.ClassifyOps
    // baseline: en 9/10 correct, de 8/10 correct, zz present
    val base = Seq(
      ("en", "en", 9L), ("en", "de", 1L),
      ("de", "de", 8L), ("de", "en", 2L),
      ("zz", "zz", 5L)).toDF("label", "pred_label", "n")
    // arrivals: en stable, de collapses (2/10), zz VANISHED, 'new' appears
    val arr = Seq(
      ("en", "en", 18L), ("en", "de", 2L),
      ("de", "de", 2L), ("de", "en", 8L),
      ("new", "en", 4L)).toDF("label", "pred_label", "n")
    val out = ClassifyOps.confusionDrift(base, arr)
      .collect().map(r => r.getAs[String]("label") ->
        ((Option(r.getAs[java.lang.Double]("acc_frozen")),
          Option(r.getAs[java.lang.Double]("acc_new")),
          Option(r.getAs[java.lang.Double]("drift")),
          r.getAs[Boolean]("needs_refit")))).toMap
    assert(out("en") === ((Some(0.9), Some(0.9), Some(0.0), false)))
    assert(out("de") === ((Some(0.8), Some(0.2), Some(0.6), true)))
    assert(out("zz") === ((Some(1.0), None, None, true)))
    assert(out("new") === ((None, Some(0.0), None, true)))
    assert(out.size === 4)
  }
}
