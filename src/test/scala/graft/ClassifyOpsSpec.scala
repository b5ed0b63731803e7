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
}
