package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
  }.toDF("k", "v")

  test("saltedAggregate equals the unsalted aggregation on skewed data") {
    val salted = ScaleOps.saltedAggregate(
      skewed, col("k"), salts = 8,
      partial = Seq(sum(col("v")).as("ps"), count(lit(1)).as("pc")),
      combine = Seq(sum(col("ps")).as("sum_v"), sum(col("pc")).as("n")))
      .select("key", "sum_v", "n")
      .as[(String, Double, Long)].collect().toSet
    val plain = skewed.groupBy(col("k").as("key"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join on skewed keys") {
    val right = Seq(("hot", 1L), ("k1", 2L), ("k3", 3L)).toDF("rk", "tag")
    val salted = ScaleOps.saltedJoin(skewed, right, col("k"), col("rk"), 8)
      .select("k", "v", "tag").as[(String, Double, Long)].collect().sorted
    val plain = skewed.join(right, col("k") === col("rk"))
      .select("k", "v", "tag").as[(String, Double, Long)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("session detection over a trip-bucketed lake plans with ZERO exchange") {
    // the 100 TB layout claim, asserted: telemetry written bucketed on
    // trip_id means the gaps-and-islands window (and the run aggregation
    // that shares its partitioning) needs no shuffle at all — the one
    // Exchange the unbucketed plan carries (PlanSpec) disappears, so
    // session detection over the whole lake is scan + sort + aggregate.
    val tel = graft.ztbus.Fixtures.telemetry().toDF()
    ScaleOps.writeBucketed(tel, "bucket_tel", "trip_id", 4)
    val runs = graft.ztbus.Algorithms.brakeSessions(
      spark.table("bucket_tel"), "status_halt_brake_is_active")
    val plan = runs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed session detection must not shuffle:\n$plan")
    // and the result is identical to the unbucketed path
    val plain = graft.ztbus.Algorithms.brakeSessions(
      tel, "status_halt_brake_is_active").collect().toSet
    assert(runs.collect().toSet == plain)
  }

  test("bucketed tables join with zero exchanges") {
    val a = (1L to 500L).map(i => (i, s"a$i")).toDF("id", "pa")
    val b = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "vb")
    ScaleOps.writeBucketed(a, "bucket_a", "id", 4)
    ScaleOps.writeBucketed(b, "bucket_b", "id", 4)
    // hint MERGE: at test size the planner would broadcast (also shuffle-
    // free, but that's not what we're demonstrating); at lake scale the
    // same join is sort-merge and bucketing removes its exchanges.
    val joined = spark.table("bucket_a").hint("merge")
      .join(spark.table("bucket_b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 500)
  }

  test("weightedSample: deterministic, bounded, weight-responsive") {
    import spark.implicits._
    // 100 heavy rows (weight 1000) + 100 light rows (weight 1)
    val rows = (1L to 100L).map(i => (i, 1000.0)) ++
      (101L to 200L).map(i => (i, 1.0))
    val df = rows.toDF("id", "w")
    val s1 = ScaleOps.weightedSample(df, col("id"), col("w"), 50)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val s2 = ScaleOps.weightedSample(df, col("id"), col("w"), 50)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(s1 === s2)                       // reproducible
    assert(s1.size === 50)
    assert(s1.map(_._2) === (1L to 50L).toSet)  // rank is 1..n
    val heavy = s1.count(_._1 <= 100L)
    assert(heavy >= 45, s"heavy rows selected: $heavy/50")
  }

  test("weightedSample excludes non-positive weights and caps at n") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, -3.0), (3L, 2.0), (4L, 5.0))
      .toDF("id", "w")
    val out = ScaleOps.weightedSample(df, col("id"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(3L, 4L))
  }
}
