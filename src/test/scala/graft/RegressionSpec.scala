package graft

import org.apache.spark.sql.functions._
import graft.operators.RegressionOps

/** Closed-form ridge distillation ([[RegressionOps]]): exact recovery of
  * a noiseless linear target at λ = 0, ridge shrinkage, the λ-guarded
  * degenerate design, and beats-the-constant-baseline on the real corpus
  * features.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def data(rows: Seq[(Long, Double, Double, Double)]) =
    rows.toDF("id", "x1", "x2", "y")

  test("lambda = 0 recovers a noiseless linear model exactly") {
    // y = 0.5 + 0.25*x1 - 0.125*x2 on exact-decimal points
    def y(x1: Double, x2: Double) = 0.5 + 0.25 * x1 - 0.125 * x2
    val pts = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 3.0), (0.5, 0.25))
    val df = data(pts.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b, y(a, b)) })
    val w = RegressionOps.ridge2Fit(df, 0.0).collect().head
    assert(w.getAs[Double]("w0") === 0.5)
    assert(w.getAs[Double]("w1") === 0.25)
    assert(w.getAs[Double]("w2") === -0.125)
    val resid = RegressionOps.ridge2Score(df, 0.0)
      .agg(max(abs(col("resid")))).collect().head.getDouble(0)
    assert(resid === 0.0)
  }

  test("ridge penalty shrinks slopes toward zero") {
    val df = data(Seq((1L, 1.0, 2.0, 1.1), (2L, 2.0, 1.0, 2.3),
      (3L, 3.0, 4.0, 2.9), (4L, 4.0, 2.0, 4.2), (5L, 5.0, 6.0, 4.8)))
    def slopeNorm(l: Double) = {
      val r = RegressionOps.ridge2Fit(df, l).collect().head
      val (a, b) = (r.getAs[Double]("w1"), r.getAs[Double]("w2"))
      math.sqrt(a * a + b * b)
    }
    // ridge shrinks the slope-vector norm (individual slopes can move
    // either way under correlated features)
    assert(slopeNorm(10.0) < slopeNorm(0.0))
  }

  test("lambda > 0 keeps a constant-feature design finite") {
    val df = data(Seq((1L, 2.0, 2.0, 1.0), (2L, 2.0, 2.0, 3.0),
      (3L, 2.0, 2.0, 5.0)))
    val w = RegressionOps.ridge2Fit(df, 0.1).collect().head
    Seq("w0", "w1", "w2").foreach { c =>
      val v = w.getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite, c)
    }
    // prediction is pulled to the target mean for every row
    val preds = RegressionOps.ridge2Score(df, 0.1)
      .select("y_hat").distinct().collect()
    assert(preds.length === 1)
  }

  test("distilled score beats the constant baseline on real features") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ws = split(col("text"), " ")
    val nw = size(filter(ws, w => length(w) > 0))
    val feat = docs.select(col("doc_id").as("id"),
      round(log(lit(1.0) + nw), 6).as("x1"),
      round(length(translate(col("text"), " ", "")).cast("double") / nw, 6)
        .as("x2"),
      round(graft.operators.TextOps.qualityComposite(col("text")), 6)
        .as("y"))
    val scored = RegressionOps.ridge2Score(feat, 0.1)
    val r = scored.agg(
      sum(col("resid") * col("resid")).as("sse"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("y")).as("sy"),
      count(lit(1)).cast("double").as("n")).collect().head
    val sst = r.getAs[Double]("syy") -
      r.getAs[Double]("sy") * r.getAs[Double]("sy") / r.getAs[Double]("n")
    assert(r.getAs[Double]("sse") < sst, s"sse=${r.getAs[Double]("sse")} sst=$sst")
  }

  test("ridge2FitBy: per-group fits match per-group global fits; degenerate group guarded") {
    val rows = Seq(
      ("a", 1.0, 2.0, 1.1), ("a", 2.0, 1.0, 2.3), ("a", 3.0, 4.0, 2.9),
      ("a", 4.0, 2.0, 4.2),
      ("b", 2.0, 2.0, 1.0), ("b", 2.0, 2.0, 3.0), ("b", 2.0, 2.0, 5.0))
    val df = rows.toDF("g", "x1", "x2", "y")
    val by = RegressionOps.ridge2FitBy(df, col("g"), 0.1).collect()
      .map(r => r.getString(0) -> r).toMap
    // group a: identical to a global fit over only group a's rows
    val solo = RegressionOps.ridge2Fit(
      df.where(col("g") === "a"), 0.1).collect().head
    assert(by("a").getAs[Double]("w0") === solo.getAs[Double]("w0"))
    assert(by("a").getAs[Double]("w1") === solo.getAs[Double]("w1"))
    assert(by("a").getAs[Double]("w2") === solo.getAs[Double]("w2"))
    // group b is constant-featured; lambda keeps it solvable and finite
    Seq("w0", "w1", "w2").foreach { c =>
      val v = by("b").getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite, c)
    }
    // degenerate at lambda = 0: NULL weights, no Inf/NaN leakage
    val deg = RegressionOps.ridge2FitBy(
      df.where(col("g") === "b"), col("g"), 0.0).collect().head
    assert(deg.isNullAt(deg.fieldIndex("w0")))
  }
}
