package graft

import org.apache.spark.sql.functions._

/** Scale-mode approximations must stay close to the exact operators. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("q24 approx distinct/median bounded against exact values") {
    val approx = SparkEntry.queries("q24_approx_scale_mode")(spark, sf)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        percentile(col("value"), lit(0.5)).as("m"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (k, (u, m)) =>
      val (au, am) = approx(k)
      assert(math.abs(au - u).toDouble / u < 0.05,
        s"$k: approx distinct $au vs exact $u")
      assert(math.abs(am - m) / math.max(math.abs(m), 1.0) < 0.05,
        s"$k: approx median $am vs exact $m")
    }
  }

  test("approx distinct scale modes bounded against exact counts") {
    // dedup stats over the documents table
    val docs = Tables.documents(spark, sf)
    def dedup(approx: Boolean) = graft.operators.DedupOps
      .exactDedupStats(docs, col("lang"), col("text"), approx)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val (de, da) = (dedup(false), dedup(true))
    // HLL++ default rsd is 0.05 — allow 2 sigma on small groups
    de.foreach { case (k, exact) =>
      assert(math.abs(da(k) - exact).toDouble / exact < 0.1,
        s"$k: approx unique ${da(k)} vs exact $exact")
    }
    // active-bus count over the ztbus fixture
    val tel = graft.ztbus.Fixtures.telemetry().toDF()
    val trips = graft.ztbus.Fixtures.trips.toDF()
    def buses(approx: Boolean) = graft.ztbus.Algorithms
      .activeBusCount(tel, trips, approx)
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val (be, ba) = (buses(false), buses(true))
    assert(be.keySet == ba.keySet)
    be.foreach { case (m, exact) =>
      assert(math.abs(ba(m) - exact).toDouble / exact < 0.1,
        s"$m: approx ${ba(m)} vs exact $exact")
    }
  }

  test("CSV and JSON telemetry sources roundtrip the typed schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val t = graft.ztbus.Fixtures.telemetry(seconds = 60).toDF()
    t.write.option("header", "true").csv(s"$dir/csv")
    t.write.json(s"$dir/json")
    val fromCsv = graft.sources.Sources.telemetryCsv(spark, s"$dir/csv")
    val fromJson = graft.sources.Sources.telemetryJson(spark, s"$dir/json")
    assert(fromCsv.count() == t.count() && fromJson.count() == t.count())
    assert(fromCsv.schema == fromJson.schema)
    // values survive the format roundtrip
    val a = fromCsv.agg(sum(col("odometry_vehicle_speed"))).as[Double].head()
    val b = fromJson.agg(sum(col("odometry_vehicle_speed"))).as[Double].head()
    assert(math.abs(a - b) < 1e-6)
  }
}
