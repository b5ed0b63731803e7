package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(xs: Seq[Long], bits: Int): Long =
    (0 until bits).flatMap { b =>
      xs.zipWithIndex.map { case (v, j) =>
        ((v >> b) & 1L) << (b * xs.size + j) }
    }.reduce(_ | _)

  test("zValue interleaves bits exactly like a reference Morton encoder") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L),
      (17L, 42L), (32L, 31L))
    val out = pts.toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(
        Seq((col("x"), 0.0, 63.0), (col("y"), 0.0, 63.0)), bits = 6))
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z == mortonRef(Seq(x, y), 6), s"($x,$y): got $z") }
  }

  test("zValue: NULL bins to 0, out-of-range values clamp to edge bins") {
    val out = Seq((Some(200L), 0L), (None, 0L), (Some(-5L), 63L))
      .toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(
        Seq((col("x"), 0.0, 63.0), (col("y"), 0.0, 63.0)), bits = 6))
      .select("z").as[Long].collect()
    assert(out(0) == mortonRef(Seq(63L, 0L), 6), "above max clamps to top bin")
    assert(out(1) == 0L, "NULL sorts first")
    assert(out(2) == mortonRef(Seq(0L, 63L), 6), "below min clamps to bin 0")
  }

  test("zValue: NaN bins to 0 like NULL, not the top bin") {
    val out = Seq((Double.NaN, 63.0), (Double.NaN, Double.NaN))
      .toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(
        Seq((col("x"), 0.0, 63.0), (col("y"), 0.0, 63.0)), bits = 6))
      .select("z").as[Long].collect()
    assert(out(0) == mortonRef(Seq(0L, 63L), 6),
      "NaN x must land in bin 0 (NaN-is-largest would send it to 63)")
    assert(out(1) == 0L, "all-NaN row clusters at the low edge")
  }

  test("compactionPlan: adjacency-preserving prefix-sum bins at the target size") {
    val audit = Seq(
      ("f0", 10L, 0L), ("f1", 10L, 100L), ("f2", 10L, 200L),
      ("f3", 70L, 300L), ("f4", 100L, 400L), ("f5", 5L, 500L),
      ("f6", 5L, 600L)).toDF("file", "n_rows", "k_min")
    val plan = LayoutOps.compactionPlan(audit, col("file"), col("n_rows"),
      col("k_min"), 100L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // prefix sums 0,10,20,30,100,200,205 -> bins 0,0,0,0,1,2,2
    assert(plan("f0")._1 == 0 && plan("f3")._1 == 0,
      s"first four files share bin 0: $plan")
    assert(plan("f4") == ((1L, 100L, 1L, false)),
      "an exactly-at-target file is its own bin, no rewrite needed")
    assert(plan("f5") == ((2L, 10L, 2L, true)) && plan("f6")._1 == 2L,
      "tail smalls merge into one rewrite bin")
    assert(plan("f0")._2 == 100L && plan("f0")._3 == 4L && plan("f0")._4,
      "bin 0 holds 100 rows across 4 files and needs compaction")
    // adjacency: files of a bin are contiguous in clustering order —
    // the property that keeps post-rewrite ranges disjoint
    val order = Seq("f0", "f1", "f2", "f3", "f4", "f5", "f6")
    val bins = order.map(plan(_)._1)
    assert(bins == bins.sorted, s"bins must be monotone over the order: $bins")
  }

  test("compactedWrite: target file count, near-even rows, disjoint sort-key ranges") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/compact"
    val df = spark.range(10000)
      .select((col("id") * 7919 % 10007).as("k"), col("id").as("v"))
    LayoutOps.compactedWrite(df, dir, 8, Seq("k"))
    val audit = LayoutOps.fileLayoutAudit(spark, dir, Seq("k")).collect()
    assert(audit.length == 8, s"expected 8 files, got ${audit.length}")
    val counts = audit.map(_.getAs[Long]("n_rows"))
    assert(counts.sum == 10000L)
    assert(counts.max <= 2L * counts.min,
      s"range sampling should keep files near-even, got ${counts.toSeq}")
    val ranges = audit.map(r =>
      (r.getAs[Long]("k_min"), r.getAs[Long]("k_max"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges must be disjoint: $aMax vs $bMin")
      case _ => ()
    }
  }

  test("zOrderedWrite bounds every file's box on BOTH dims; a 1-col sort cannot") {
    val base = Files.createTempDirectory("graft-layout").toString
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    LayoutOps.zOrderedWrite(grid, s"$base/z", 16, Seq("x", "y"), bits = 6)
    val zBoxes = LayoutOps.fileLayoutAudit(spark, s"$base/z", Seq("x", "y"))
      .collect()
    assert(zBoxes.map(_.getAs[Long]("n_rows")).sum == 4096L)
    // A point predicate on y prunes z-ordered files: ideal Morton quadrants
    // put y=17 in 4 of 16 files; range-sampling slack allowed up to 8.
    def touched(boxes: Array[org.apache.spark.sql.Row], dim: String, v: Long) =
      boxes.count(r => r.getAs[Long](s"${dim}_min") <= v &&
        v <= r.getAs[Long](s"${dim}_max"))
    assert(touched(zBoxes, "y", 17L) <= 8,
      s"y=17 should touch few z-ordered files, got ${touched(zBoxes, "y", 17L)}")
    assert(touched(zBoxes, "x", 40L) <= 8,
      s"x=40 should touch few z-ordered files, got ${touched(zBoxes, "x", 40L)}")
    // Contrast: x-sorted layout prunes x perfectly but every y predicate
    // touches ALL files — the trade zValue's doc states.
    LayoutOps.compactedWrite(grid, s"$base/xsort", 16, Seq("x"))
    val xBoxes = LayoutOps.fileLayoutAudit(spark, s"$base/xsort",
      Seq("x", "y")).collect()
    assert(touched(xBoxes, "y", 17L) == 16,
      "1-col sort leaves the second dim unpruned")
    assert(touched(xBoxes, "x", 40L) <= 2)
  }

  test("maxRecordsPerFile splits oversized partitions into sequential sorted chunks") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/split"
    val df = spark.range(1000).select(col("id").as("k"))
    LayoutOps.compactedWrite(df, dir, 2, Seq("k"), maxRecordsPerFile = 300L)
    val audit = LayoutOps.fileLayoutAudit(spark, dir, Seq("k")).collect()
    assert(audit.length >= 4, s"2 partitions of ~500 rows at cap 300 must " +
      s"split into >= 4 files, got ${audit.length}")
    assert(audit.map(_.getAs[Long]("n_rows")).max <= 300L)
    val ranges = audit.map(r =>
      (r.getAs[Long]("k_min"), r.getAs[Long]("k_max"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ => ()
    }
  }

  test("pruningPlan on a real clustered layout is sound and effective") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/prune"
    val df = spark.range(10000)
      .select((col("id") * 7919 % 10007).as("k"), col("id").as("v"))
    LayoutOps.compactedWrite(df, dir, 10, Seq("k"))
    val audit = LayoutOps.fileLayoutAudit(spark, dir, Seq("k"))
    val (lo, hi) = (2000.0, 2999.0)
    val plan = LayoutOps.pruningPlan(audit, col("file"), col("n_rows"),
      Seq(("k", lo, hi))).collect()
    val scanned = plan.filter(_.getAs[Boolean]("scan"))
      .map(_.getAs[String]("file")).toSet
    // Effectiveness: a clustered layout prunes ~90% of files for a ~10%
    // selectivity predicate.
    assert(scanned.size <= 3 && scanned.nonEmpty,
      s"clustered layout must prune most files: ${scanned.size}/10")
    // Soundness: reading ONLY the scan=true files returns exactly the
    // predicate's rows from the full table.
    val pruned = spark.read.parquet(scanned.toSeq: _*)
      .where(col("k").between(lo, hi)).agg(count(lit(1)), sum("v")).head
    val full = spark.read.parquet(dir)
      .where(col("k").between(lo, hi)).agg(count(lit(1)), sum("v")).head
    assert(pruned == full, "pruning must not lose predicate rows")
  }

  test("pruningPlanSummary reports files/rows scanned vs total") {
    val audit = Seq(
      ("f0", 10L, 0.0, 1.0), ("f1", 20L, 2.0, 3.0), ("f2", 30L, 5.0, 9.0))
      .toDF("file", "n_rows", "k_min", "k_max")
    val s = LayoutOps.pruningPlanSummary(LayoutOps.pruningPlan(
      audit, col("file"), col("n_rows"), Seq(("k", 2.5, 6.0)))).head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((3L, 2L, 60L, 50L)), s"summary row: $s")
  }

  test("pruningPlan: NULL statistics are conservatively scannable") {
    val audit = Seq(
      ("f0", 10L, Some(0.0), Some(1.0)),
      ("f1", 10L, None, None),
      ("f2", 10L, Some(5.0), Some(9.0)))
      .toDF("file", "n_rows", "k_min", "k_max")
    val got = LayoutOps.pruningPlan(audit, col("file"), col("n_rows"),
      Seq(("k", 4.0, 6.0))).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("scan")).toMap
    assert(got == Map("f0" -> false, "f1" -> true, "f2" -> true),
      s"missing stats must never skip a file: $got")
  }
}
