package graft

import org.apache.spark.sql.functions._
import graft.operators.{HistogramPacking, TextOps}
import graft.operators.HistogramPacking.PackGroup

class HistogramPackingSpec extends SparkSpec {
  import spark.implicits._

  /** Literal per-item best-fit-decreasing: items longest length first
    * (ranks of one length in order), each to the open bin with the
    * smallest remaining capacity that fits, ties to the oldest bin,
    * else a new bin. Returns bins (contents, creation order) and every
    * item's bin index — the semantics [[HistogramPacking.pack]] batches. */
  private def brute(hist: Seq[(Long, Long)], ctx: Long)
      : (Vector[List[Long]], Map[(Long, Long), Int]) = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, List[Long])]
    val asg = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for ((l, c) <- hist.sortBy(-_._1); r <- 0L until c) {
      var best = -1
      for (i <- bins.indices)
        if (bins(i)._1 >= l && (best < 0 || bins(i)._1 < bins(best)._1))
          best = i
      if (best < 0) { bins += ((ctx - l, List(l))); asg((l, r)) = bins.size - 1 }
      else {
        bins(best) = (bins(best)._1 - l, l :: bins(best)._2)
        asg((l, r)) = best
      }
    }
    (bins.map(_._2.sorted(Ordering[Long].reverse)).toVector, asg.toMap)
  }

  /** The [[PackGroup]] closed form: (length, rank) → pack id, asserting
    * the rank lands in exactly ONE group's slot interval. */
  private def assign(groups: Seq[PackGroup], l: Long, r: Long): Long = {
    val cands = for {
      g <- groups
      (l0, k, off) <- g.slots
      if l0 == l && r >= off && r < off + g.mult * k
    } yield g.packBase + (r - off) / k
    assert(cands.size == 1, s"rank ($l, $r) must hit one slot: $cands")
    cands.head
  }

  private def expand(groups: Seq[PackGroup]): Seq[List[Long]] =
    groups.flatMap(p => (0L until p.mult).map(_ =>
      p.slots.flatMap { case (l, k, _) => List.fill(k.toInt)(l) }
        .sorted(Ordering[Long].reverse)))

  test("pack: hand example — combos, offsets, pack ids") {
    // ctx 8, hist {8:1, 6:2, 4:3, 2:5} -> packs [8] [6,2]x2 [4,4]
    // [4,2,2] [2]; worked through by hand in operator order
    val hist = Seq(8L -> 1L, 6L -> 2L, 4L -> 3L, 2L -> 5L)
    val g = HistogramPacking.pack(hist, 8L)
    assert(expand(g) == Seq(List(8L), List(6L, 2L), List(6L, 2L),
      List(4L, 4L), List(4L, 2L, 2L), List(2L)), s"${expand(g)}")
    // pack ids dense, in order
    assert(g.map(_.packBase) == g.scanLeft(0L)(_ + _.mult).init)
    // every doc placed exactly once: per length, slot intervals tile [0, c)
    for ((l, c) <- hist) {
      val iv = g.flatMap(p => p.slots.collect {
        case (`l`, k, off) => (off, off + p.mult * k) }).sortBy(_._1)
      assert(iv.head._1 == 0L && iv.last._2 == c &&
        iv.sliding(2).forall(w => w.size < 2 || w(0)._2 == w(1)._1),
        s"$l: $iv")
    }
  }

  test("pack: batched ≡ per-item best-fit decreasing on random histograms") {
    val rnd = new scala.util.Random(18L)
    for (case_ <- 0 until 80) {
      val ctx = Seq(8L, 16L, 37L, 64L)(rnd.nextInt(4))
      val nLens = 1 + rnd.nextInt(math.min(ctx, 9L).toInt)
      val lens = rnd.shuffle((1L to ctx).toList).take(nLens)
      val hist = lens.map(l => (l, 1L + rnd.nextInt(30).toLong))
      val groups = HistogramPacking.pack(hist, ctx)
      val (bins, asg) = brute(hist, ctx)
      // identical pack contents in identical creation order
      assert(expand(groups) == bins, s"case $case_ ctx=$ctx hist=$hist")
      // identical per-item assignment via the closed form
      for (((l, r), bin) <- asg)
        assert(assign(groups, l, r) == bin.toLong,
          s"case $case_ ctx=$ctx hist=$hist item ($l, $r)")
    }
  }

  test("histogramPack operator: exact assignment, capacity, truncation") {
    val d = Seq((1L, 5L), (2L, 3L), (3L, 3L), (4L, 9L), (5L, 2L),
      (6L, 3L), (7L, 1L), (8L, 0L)).toDF("doc_id", "nt")
    // ctx 6; doc 4 truncated to 6; doc 8 (0 tokens) skipped
    def run(block: Long) = TextOps.histogramPack(d, col("doc_id"),
        col("nt"), 6L, blockSize = block)
      .as[(Long, Long, Long, Boolean, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val out = run(2L) // hierarchical rank path (multiple blocks)
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(out.find(_._1 == 4L).get._4 && out.find(_._1 == 4L).get._3 == 6L,
      "doc 4 clamped to ctx and flagged truncated")
    // every pack within capacity
    val byPack = out.groupBy(_._5).view.mapValues(_.map(_._3).sum).toMap
    assert(byPack.values.forall(_ <= 6L), s"$byPack")
    // matches the per-item reference on the same histogram: rank within
    // a length class is doc_id order
    val hist = out.groupBy(_._3).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val (_, asg) = brute(hist, 6L)
    val ranks = out.groupBy(_._3).flatMap { case (l, rows) =>
      rows.sortBy(_._1).zipWithIndex.map { case (row, i) =>
        row._1 -> ((l, i.toLong)) } }
    assert(out.forall(r => asg(ranks(r._1)).toLong == r._5),
      s"operator assignment must equal per-item BFD: $out")
    assert(run(64L) == out, "blockSize never changes the result")
    assert(TextOps.histogramPack(d.repartition(5), col("doc_id"),
      col("nt"), 6L, blockSize = 2L)
      .as[(Long, Long, Long, Boolean, Long, Long)]
      .collect().sortBy(_._1).toSeq == out, "partitioning-invariant")
  }
}
