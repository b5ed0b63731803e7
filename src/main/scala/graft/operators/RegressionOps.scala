package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Closed-form ridge regression for quality-signal distillation: fit a
  * 2-feature linear model to mimic an expensive quality target (an LM
  * perplexity, a composite score), then score the whole corpus with the
  * cheap model — the standard "distill the expensive signal into a cheap
  * pre-filter" pipeline stage (cf. fastText quality filters distilled
  * from LM scores, Brown et al. 2020 §A; ridge = Hoerl & Kennard 1970).
  *
  * Scale design: the FIT is one aggregation producing a single row of
  * second-moment sums, and the weights are Cramer's-rule column
  * arithmetic over that row — no `.collect()`, no iteration, no driver
  * math at all (tighter than the NB fit, which collects a bounded class
  * domain). Scoring broadcasts the 1-row model and is a pure map. Every
  * intermediate is rounded to 6 decimals (the repo's engine-parity
  * convention), so the DuckDB oracle replays fit AND predictions
  * bit-identically: the weight formulas are shared as SQL text and
  * parsed by BOTH engines ([[cramerSql]] via `expr`), making formula
  * drift impossible.
  */
object RegressionOps {

  /** Shared Cramer's-rule formulas for the ridge normal equations
    *   A w = b,  A = XᵀX + λ·diag(0,1,1),  b = Xᵀy
    * over an aggregate row with columns n, s1, s2, s11, s12, s22, sy,
    * s1y, s2y (x0 = intercept is unpenalized, the standard convention).
    * Index 0 = det, 1..3 = w0..w2 numerators; weights = num/det. */
  def cramerSql(lambda: Double): Seq[String] = {
    val a11 = s"(s11 + $lambda)"
    val a22 = s"(s22 + $lambda)"
    // det of [[n, s1, s2], [s1, a11, s12], [s2, s12, a22]]
    val det = s"(n * ($a11 * $a22 - s12 * s12)" +
      s" - s1 * (s1 * $a22 - s12 * s2)" +
      s" + s2 * (s1 * s12 - $a11 * s2))"
    // replace column j with b = [sy, s1y, s2y]
    val n0 = s"(sy * ($a11 * $a22 - s12 * s12)" +
      s" - s1 * (s1y * $a22 - s12 * s2y)" +
      s" + s2 * (s1y * s12 - $a11 * s2y))"
    val n1 = s"(n * (s1y * $a22 - s12 * s2y)" +
      s" - sy * (s1 * $a22 - s12 * s2)" +
      s" + s2 * (s1 * s2y - s1y * s2))"
    val n2 = s"(n * ($a11 * s2y - s1y * s12)" +
      s" - s1 * (s1 * s2y - s1y * s2)" +
      s" + sy * (s1 * s12 - $a11 * s2))"
    Seq(det, n0, n1, n2)
  }

  /** The second-moment aggregate row from a frame exposing round-6
    * columns `x1`, `x2`, `y`: n plus the seven sums, each product
    * rounded before summation and each sum rounded after — both engines
    * then hold bit-identical doubles and all downstream weight/score
    * arithmetic agrees exactly. */
  private def momentRow(f: DataFrame): DataFrame = {
    def s(c: Column, name: String): Column = round(sum(round(c, 6)), 6).as(name)
    f.agg(
      count(lit(1)).cast("double").as("n"),
      s(col("x1"), "s1"), s(col("x2"), "s2"),
      s(col("x1") * col("x1"), "s11"),
      s(col("x1") * col("x2"), "s12"),
      s(col("x2") * col("x2"), "s22"),
      s(col("y"), "sy"),
      s(col("x1") * col("y"), "s1y"),
      s(col("x2") * col("y"), "s2y"))
  }

  /** Fit the ridge model over `(id, x1, x2, y)` rows (features/target
    * already round-6). Returns ONE row: n plus w0, w1, w2 (round-6). */
  def ridge2Fit(data: DataFrame, lambda: Double = 0.1): DataFrame = {
    val Seq(det, n0, n1, n2) = cramerSql(lambda)
    momentRow(data)
      .select(col("n").cast("long").as("n_rows"),
        Exact.round6z(expr(s"$n0 / $det")).as("w0"),
        Exact.round6z(expr(s"$n1 / $det")).as("w1"),
        Exact.round6z(expr(s"$n2 / $det")).as("w2"))
  }

  /** Per-group ridge fits — one model row per group (per-language /
    * per-source calibration: the feature→quality mapping differs by
    * domain, and a single global fit lets head domains dominate). Same
    * zero-driver shape: ONE grouped aggregation, Cramer's rule on each
    * group's row. Degenerate groups (constant features at λ = 0) yield
    * NULL weights rather than failing the fit. */
  def ridge2FitBy(data: DataFrame, group: Column, lambda: Double = 0.1)
      : DataFrame = {
    def s(c: Column, name: String): Column =
      round(sum(round(c, 6)), 6).as(name)
    val Seq(det, n0, n1, n2) = cramerSql(lambda)
    data.groupBy(group.as("grp")).agg(
      count(lit(1)).cast("double").as("n"),
      s(col("x1"), "s1"), s(col("x2"), "s2"),
      s(col("x1") * col("x1"), "s11"),
      s(col("x1") * col("x2"), "s12"),
      s(col("x2") * col("x2"), "s22"),
      s(col("y"), "sy"),
      s(col("x1") * col("y"), "s1y"),
      s(col("x2") * col("y"), "s2y"))
      .select(col("grp"), col("n").cast("long").as("n_rows"),
        Exact.round6z(when(expr(det) =!= 0.0, expr(s"$n0 / $det"))).as("w0"),
        Exact.round6z(when(expr(det) =!= 0.0, expr(s"$n1 / $det"))).as("w1"),
        Exact.round6z(when(expr(det) =!= 0.0, expr(s"$n2 / $det"))).as("w2"))
  }

  /** Score every row with the fitted model (broadcast 1-row cross join):
    * `(id, y, y_hat, resid)`, all round-6. */
  def ridge2Score(data: DataFrame, lambda: Double = 0.1): DataFrame = {
    val model = ridge2Fit(data, lambda)
    data.crossJoin(broadcast(model))
      .select(col("id"),
        Exact.round6z(col("y")).as("y"),
        Exact.round6z(col("w0") + col("w1") * round(col("x1"), 6)
          + col("w2") * round(col("x2"), 6)).as("y_hat"))
      .withColumn("resid", Exact.round6z(col("y") - col("y_hat")))
  }

  /** The two cheap distillation features over a text column — round-6
    * (log word count, mean word length); shared by the q155 registry
    * body and the ingest face so they cannot drift. */
  def qualityFeatures(text: Column): (Column, Column) = {
    val ws = split(text, " ")
    val nw = size(filter(ws, w => length(w) > 0))
    (round(log(lit(1.0) + nw), 6),
      round(length(translate(text, " ", "")).cast("double") / nw, 6))
  }

  /** DuckDB oracle fragment mirroring [[momentRow]] over a CTE `feat`
    * exposing `x1`, `x2`, `y` (round-6). */
  def momentRowSql: String =
    """SELECT CAST(count(*) AS DOUBLE) AS n,
      |  round(sum(round(x1, 6)), 6) AS s1,
      |  round(sum(round(x2, 6)), 6) AS s2,
      |  round(sum(round(x1 * x1, 6)), 6) AS s11,
      |  round(sum(round(x1 * x2, 6)), 6) AS s12,
      |  round(sum(round(x2 * x2, 6)), 6) AS s22,
      |  round(sum(round(y, 6)), 6) AS sy,
      |  round(sum(round(x1 * y, 6)), 6) AS s1y,
      |  round(sum(round(x2 * y, 6)), 6) AS s2y
      |FROM feat""".stripMargin
}
