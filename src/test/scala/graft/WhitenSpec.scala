package graft

import org.apache.spark.sql.functions._
import graft.operators.WhitenOps

/** ZCA whitening ([[WhitenOps]]): the fit is judged by its defining law
  * — the whitened corpus has identity covariance — on data built to be
  * badly anisotropic, plus production/oracle moment parity and
  * end-to-end determinism. */
class WhitenSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic fixture: dim 0 stretched 10x, dims correlated via a
  // deterministic mix — cosine in raw space is dominated by dim 0
  private val Dim = 8
  private lazy val aniso = {
    val rows = (0 until 400).map { s =>
      val base = Array.tabulate(Dim) { d =>
        val h = ((s.toLong * 131 + d) * 2654435761L) % 1000003L
        (h.toDouble / 1000003.0 - 0.5)
      }
      val v = base.clone()
      v(0) = base(0) * 2.0 + 20.0          // huge common offset: every raw
                                           // vector points almost along e0
      v(1) = base(1) + 0.8 * base(0)       // correlated with dim 0
      (s.toLong, v.map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("moments: treeAggregate production face matches the relational face") {
    val rel = WhitenOps.momentsRelational(aniso, col("embedding"), Dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val prod = WhitenOps.moments(aniso, col("embedding"), Dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(rel.keySet == prod.keySet)
    assert(rel.size == 1 + Dim + Dim * (Dim + 1) / 2)
    rel.foreach { case (k, v) =>
      val p = prod(k)
      assert(math.abs(v - p) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"moment $k: relational $v vs production $p")
    }
  }

  test("whitened corpus has identity covariance (the defining law)") {
    val model = WhitenOps.fitZca(
      WhitenOps.moments(aniso, col("embedding"), Dim), Dim)
    val wh = WhitenOps.whiten(aniso, col("vec_id"), col("embedding"), model)
      .collect().map(r => r.getSeq[Double](1).toArray)
    val n = wh.length
    val mean = Array.tabulate(Dim)(d => wh.map(_(d)).sum / n)
    // whitened mean is ~0 (the transform centers)
    mean.foreach(m => assert(math.abs(m) < 1e-3, s"mean must center: $m"))
    for (i <- 0 until Dim; j <- i until Dim) {
      val c = wh.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      if (i == j) assert(math.abs(c - 1.0) < 0.05,
        s"whitened var($i) must be ~1: $c")
      else assert(math.abs(c) < 0.05,
        s"whitened cov($i,$j) must be ~0: $c")
    }
  }

  test("whitening recovers neighbors the stretched dim was hiding") {
    // raw cosine is dominated by the stretched+shifted dim 0, so nearly
    // everything looks alike; whitened cosine separates by the full
    // geometry — measure the spread of pairwise cosines
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val raw = aniso.collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val model = WhitenOps.fitZca(
      WhitenOps.moments(aniso, col("embedding"), Dim), Dim)
    val wh = WhitenOps.whiten(aniso, col("vec_id"), col("embedding"), model)
      .collect().map(r => r.getSeq[Double](1).toArray)
    def spread(vs: Array[Array[Double]]): Double = {
      val cs = for (i <- 0 until 50; j <- i + 1 until 50)
        yield cos(vs(i), vs(j))
      val m = cs.sum / cs.size
      math.sqrt(cs.map(c => (c - m) * (c - m)).sum / cs.size)
    }
    val sRaw = spread(raw)
    val sWh = spread(wh)
    assert(sRaw < 0.1, s"fixture sanity: raw cosines must be squashed: $sRaw")
    assert(sWh > 3 * sRaw,
      s"whitening must un-squash the cosine distribution: $sWh vs $sRaw")
  }

  test("fit and apply are deterministic across runs and partitionings") {
    val m1 = WhitenOps.fitZca(
      WhitenOps.moments(aniso, col("embedding"), Dim), Dim)
    val m2 = WhitenOps.fitZca(
      WhitenOps.momentsRelational(aniso.repartition(7), col("embedding"), Dim),
      Dim)
    // same moments (up to the spec'd 1e-9) => same matrix to ~1e-6
    m1.w.zip(m2.w).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"fit must be reproducible: $x vs $y") }
    val w1 = WhitenOps.whiten(aniso, col("vec_id"), col("embedding"), m1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val w2 = WhitenOps.whiten(aniso.repartition(5), col("vec_id"),
      col("embedding"), m1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(w1 == w2, "apply must be partitioning-invariant")
  }

  test("whiten plan: row-local, zero exchanges") {
    val model = WhitenOps.fitZca(
      WhitenOps.moments(aniso, col("embedding"), Dim), Dim)
    val plan = WhitenOps.whiten(aniso, col("vec_id"), col("embedding"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"whiten must not shuffle:\n$plan")
  }
}
