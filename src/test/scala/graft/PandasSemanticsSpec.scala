package graft

import org.apache.spark.sql.functions._

/** The reference computes its stats with pandas; these tests pin the exact
  * numerical semantics our operators must reproduce (SURVEY §2.4):
  * linear-interpolation percentiles, ddof=1 dispersion. */
class PandasSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")

  test("percentile uses pandas-style linear interpolation") {
    val Seq(p50, p25) = df.agg(
      percentile(col("v"), lit(0.5)),
      percentile(col("v"), lit(0.25))).as[(Double, Double)].head() match {
      case (a, b) => Seq(a, b)
    }
    assert(p50 == 2.5)  // pandas quantile(0.5) of [1,2,3,4]
    assert(p25 == 1.75) // (n-1)*q = 0.75 -> 1 + 0.75*(2-1)
  }

  test("stddev/var use sample (ddof=1) semantics like pandas defaults") {
    val (sd, vr) = df.agg(stddev_samp(col("v")), var_samp(col("v")))
      .as[(Double, Double)].head()
    assert(math.abs(vr - 5.0 / 3.0) < 1e-12)   // pandas var() of [1,2,3,4]
    assert(math.abs(sd - math.sqrt(5.0 / 3.0)) < 1e-12)
  }

  test("single-row groups: std/var are NULL (pandas NaN), median is the value") {
    val one = Seq(7.0).toDF("v")
    val r = one.agg(stddev_samp(col("v")).as("sd"), var_samp(col("v")).as("vr"),
      percentile(col("v"), lit(0.5)).as("md")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == 7.0)
  }

  test("diff semantics: first element filled with 0 like the reference") {
    val out = graft.operators.CoreOps.diff2(
      Seq(("k", 1L, 5.0), ("k", 2L, 8.0)).toDF("k", "t", "v"),
      Seq(col("k")), Seq(col("t")), col("v"), "d1", "d2")
      .orderBy("t").select("d1").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 3.0))
  }
}
