package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{CoreOps, DedupOps}
import graft.functions.Exact

/** Property-based invariants (SURVEY.md §5.2) — raw scalacheck generators
  * with a fixed seed (the scalatest bridge artifact isn't available in the
  * offline cache), so failures are reproducible. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val flagSeqGen: Gen[List[Boolean]] =
    Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n, Gen.oneOf(true, false)))

  test("flagRuns: runs are disjoint, maximal, and cover exactly the true samples") {
    samples(flagSeqGen, 10).foreach { flags =>
      val df = flags.zipWithIndex.map { case (f, i) => ("k", i.toLong, f) }
        .toDF("k", "t", "flag")
      val runs = CoreOps.flagRuns(df, Seq(col("k")), Seq(col("t")), col("flag"))
        .select("start_ts", "end_ts", "n_rows")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      runs.foreach { case (s, e, n) =>
        assert(n == e - s + 1)
        assert((s to e).forall(i => flags(i.toInt)), "run must be all-true")
        assert(s == 0 || !flags(s.toInt - 1), "run must be left-maximal")
        assert(e == flags.length - 1 || !flags(e.toInt + 1),
          "run must be right-maximal")
      }
      assert(runs.map(_._3).sum == flags.count(identity),
        "runs must cover every true sample exactly once")
    }
  }

  test("flagRuns is invariant to input partitioning") {
    samples(Gen.zip(flagSeqGen, Gen.chooseNum(1, 8)), 8).foreach {
      case (flags, parts) =>
        val df = flags.zipWithIndex.map { case (f, i) => ("k", i.toLong, f) }
          .toDF("k", "t", "flag")
        val a = CoreOps.flagRuns(df, Seq(col("k")), Seq(col("t")), col("flag"))
          .collect().toSet
        val b = CoreOps.flagRuns(df.repartition(parts), Seq(col("k")),
          Seq(col("t")), col("flag")).collect().toSet
        assert(a == b)
    }
  }

  test("Exact.dsum is invariant to partitioning") {
    samples(Gen.listOfN(50, Gen.chooseNum(-1e6, 1e6)), 8).foreach { xs =>
      val df = xs.toDF("v")
      val a = df.agg(Exact.dsum(col("v"))).as[Double].head()
      val b = df.repartition(7).agg(Exact.dsum(col("v"))).as[Double].head()
      assert(a == b, "dsum must be bit-identical under repartitioning")
    }
  }

  test("jaccard pairs: scores in (0,1], exact dups score 1.0") {
    val texts = Seq(
      "a b c d e f", "a b c d e f", "a b c x y z", "p q r s t u",
      "a b p q x y", "m n o m n o")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairs(docs, col("doc_id"), col("text"), 2, 0.01)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._3 > 0 && p._3 <= 1.0))
    assert(pairs.find(p => p._1 == 0 && p._2 == 1).exists(_._3 == 1.0))
  }

  test("minhash signatures stay within the hash field for random words") {
    samples(Gen.listOfN(5, Gen.alphaLowerStr.suchThat(_.nonEmpty)), 8)
      .foreach { words =>
        val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val row = DedupOps
          .minhashSignatures(docs, col("doc_id"), col("text"), 2).head()
        (1 to 8).foreach(i =>
          assert(row.getLong(i) >= 0 &&
            row.getLong(i) < graft.functions.TextHash.P))
      }
  }
}
