package graft

import org.apache.spark.sql.functions._
import graft.operators.CoreOps

import java.sql.Timestamp

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scanWithPredicates refuses an unbounded scan") {
    val li = Tables.lineitem(spark, sf)
    assertThrows[IllegalArgumentException] {
      CoreOps.scanWithPredicates(li, Seq("l_orderkey"), "l_orderkey", None,
        "l_shipdate", None, None)
    }
  }

  test("scanWithPredicates time bounds are closed intervals") {
    val df = Seq(
      (1L, ts("2021-03-09 14:15:00")),
      (2L, ts("2021-03-09 14:16:00")),
      (3L, ts("2021-03-09 14:17:00"))).toDF("id", "t")
    val out = CoreOps.scanWithPredicates(df, Seq("id"), "id", None, "t",
      Some(ts("2021-03-09 14:15:00")), Some(ts("2021-03-09 14:16:00")))
    assert(out.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("flagRuns finds maximal contiguous runs incl. edges") {
    // key A: F T T F T  -> runs [2,3] (len 2) and [5,5] (len 1)
    // key B: T T T      -> single run [1,3]
    // key C: F F        -> no runs
    val df = Seq(
      ("A", 1L, false), ("A", 2L, true), ("A", 3L, true), ("A", 4L, false),
      ("A", 5L, true),
      ("B", 1L, true), ("B", 2L, true), ("B", 3L, true),
      ("C", 1L, false), ("C", 2L, false)).toDF("k", "t", "flag")
    val runs = CoreOps.flagRuns(df, Seq(col("k")), Seq(col("t")), col("flag"))
      .select("k", "start_ts", "end_ts", "n_rows")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(runs.toSeq == Seq(
      ("A", 2L, 3L, 2L), ("A", 5L, 5L, 1L), ("B", 1L, 3L, 3L)))
  }

  test("flagRuns is invariant to partition slicing (whole-trip semantics)") {
    val df = Seq.tabulate(600) { i =>
      ("T1", i.toLong, (i / 37) % 2 == 0) // alternating runs of 37
    }.toDF("k", "t", "flag")
    val once = CoreOps.flagRuns(df, Seq(col("k")), Seq(col("t")), col("flag"))
    val sliced = CoreOps.flagRuns(df.repartition(7), Seq(col("k")),
      Seq(col("t")), col("flag"))
    assert(once.collect().toSet == sliced.collect().toSet)
  }

  test("diff2 computes first/second differences with zero fill") {
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 13.0), ("A", 3L, 13.0),
      ("A", 4L, 20.0)).toDF("k", "t", "v")
    val out = CoreOps.diff2(df, Seq(col("k")), Seq(col("t")), col("v"),
      "d1", "d2")
      .select("t", "d1", "d2").as[(Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0.0, 0.0), (2L, 3.0, 3.0), (3L, 0.0, -3.0), (4L, 7.0, 7.0)))
  }

  test("diff2ByJoin equals diff2 on gapless 1 Hz data") {
    import graft.ztbus.Fixtures
    val tel = Fixtures.telemetry(seconds = 240).toDF()
    val byWindow = graft.operators.CoreOps.diff2(tel,
      Seq(col("trip_id")), Seq(col("time")), col("odometry_vehicle_speed"),
      "accel", "jerk")
      .select("id", "accel", "jerk").as[(Long, Double, Double)]
      .collect().map { case (i, a, j) => i -> (a, j) }.toMap
    val byJoin = graft.operators.CoreOps.diff2ByJoin(tel,
      Seq("trip_id"), "time", "INTERVAL 1 SECOND",
      "odometry_vehicle_speed", "accel", "jerk")
      .select("id", "accel", "jerk").as[(Long, Double, Double)]
      .collect().map { case (i, a, j) => i -> (a, j) }.toMap
    assert(byWindow == byJoin)
  }

  test("asofJoin attaches the latest prior right row per key, <= semantics") {
    val left = Seq(("u1", 10L, "p1"), ("u1", 20L, "p2"), ("u2", 5L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq(("u1", 8L, 1.0), ("u1", 15L, 2.0), ("u1", 20L, 3.0),
      ("u2", 9L, 9.0)).toDF("k", "t", "v")
    val out = CoreOps.asofJoin(left, right, Seq("k"), "t", "t",
      Map("t" -> "rt", "v" -> "rv"))
      .select("tag", "rt", "rv").as[(String, Long, Double)]
      .collect().sortBy(_._1)
    // p1@10 -> right@8; p2@20 -> right@20 (equal ts included);
    // p3@5 has no prior right row -> dropped (inner semantics)
    assert(out.toSeq == Seq(("p1", 8L, 1.0), ("p2", 20L, 3.0)))
  }

  test("guardedRatio yields NULL, not Inf, on zero denominator") {
    import graft.functions.Exact
    val df = Seq(("a", 1.0, 0.0), ("b", 1.0, 2.0)).toDF("k", "num", "den")
    val out = df.select(col("k"),
      Exact.guardedRatio(col("num"), col("den")).as("r"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("a").isEmpty && out("b").contains(0.5))
  }
}
