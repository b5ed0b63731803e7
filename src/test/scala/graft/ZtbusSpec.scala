package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ztbus.{Algorithms, Fixtures}

class ZtbusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val telemetry = Fixtures.telemetry().toDF()
  private lazy val trips = Fixtures.trips.toDF()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("FindActiveBusses: distinct (trip,bus,route) per minute + count") {
    val counts = Algorithms.activeBusCount(telemetry, trips)
      .as[(Timestamp, Long)].collect().toMap
    assert(counts(ts("2021-03-09 14:16:00")) == 2L) // trips 1+2 active
    assert(counts(ts("2021-03-09 14:31:00")) == 1L) // only trip 3
  }

  test("perMinuteMetrics: zero-movement minute yields NULL ratio, full dwell") {
    val m = Algorithms.perMinuteMetrics(telemetry, trips)
      .where(col("trip_id") === 1 && col("minute") === ts("2021-03-09 14:18:00"))
      .head()
    assert(m.getAs[Long]("dwell_time_s") == 60L)
    assert(m.getAs[Long]("total_s") == 60L)
    assert(m.isNullAt(m.fieldIndex("kwh_per_km")), "zero distance → NULL, not Inf")
    assert(m.getAs[Double]("door_open_fraction") == 1.0)
    assert(m.getAs[Long]("bus_id") == 183L && m.getAs[Long]("route_id") == 31L)
  }

  test("perMinuteMetrics: kwh matches an independent computation") {
    // trip 1, minute 14:16: samples s in [55, 115)
    val expected = (55 until 115)
      .map(s => (50.0 + 20.0 * math.cos(s / 15.0)) / 3600.0).sum
    val got = Algorithms.perMinuteMetrics(telemetry, trips)
      .where(col("trip_id") === 1 && col("minute") === ts("2021-03-09 14:16:00"))
      .select("kwh").as[Double].head()
    assert(math.abs(got - expected) < 1e-6, s"$got vs $expected")
  }

  test("brakeSessions: runs crossing minute boundaries and active at start") {
    val halt = Algorithms.brakeSessions(telemetry, "status_halt_brake_is_active")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime))
    assert(halt.toSeq == Seq(
      (1L, ts("2021-03-09 14:15:55"), ts("2021-03-09 14:16:14"), 20L),
      (1L, ts("2021-03-09 14:18:25"), ts("2021-03-09 14:18:29"), 5L),
      (2L, ts("2021-03-09 14:15:05"), ts("2021-03-09 14:15:34"), 30L)))
    val park = Algorithms.brakeSessions(telemetry, "status_park_brake_is_active")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
    assert(park.toSeq == Seq(
      (1L, ts("2021-03-09 14:23:25"), ts("2021-03-09 14:23:44"), 20L)))
  }

  test("sessionsAsWindowEvents carries the window-type contract") {
    val ev = Algorithms.sessionsAsWindowEvents(
      Algorithms.brakeSessions(telemetry, "status_halt_brake_is_active"),
      graft.ztbus.WindowTypes.HaltBrakeApplied, "halt_brake_finder")
    val r = ev.head()
    assert(r.getAs[String]("name") == "HaltBrakeApplied")
    assert(r.getAs[String]("version") == "2.1.0")
    assert(r.getAs[Map[String, String]]("metadata").contains("trip_id"))
  }

  test("asAlgoResults unpivots to one row per algorithm per key") {
    val res = Algorithms.asAlgoResults(
      Algorithms.perMinuteMetrics(telemetry, trips))
    val perKey = res.groupBy("minute", "trip_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect().toSet
    assert(perKey == Set(5L), "five metric algorithms per (minute, trip)")
    val names = res.select("algorithm").distinct().as[String].collect().toSet
    assert(names == Algorithms.registry
      .filter(_.trigger == graft.ztbus.WindowTypes.EveryMinutePerTripPerBus)
      .map(_.name).toSet)
  }

  test("globalPerMinute reproduces the reference's trip_id=None behavior") {
    val global = Algorithms.perMinuteMetrics(telemetry, trips, globalPerMinute = true)
      .where(col("minute") === ts("2021-03-09 14:16:00")).head()
    assert(global.getAs[Long]("total_s") == 120L, "both trips' samples pooled")
  }

  test("distributed generator matches the typed schema and row count") {
    val df = graft.ztbus.Fixtures.telemetryDF(spark, 1000L)
    assert(df.count() == 3000L)
    // must bind to the typed model (by-name resolution)
    assert(df.as[graft.ztbus.Telemetry].head().trip_id > 0)
    // and the collapsed pipeline must run on it
    assert(Algorithms.perMinuteMetrics(df, trips).count() > 0)
  }

  test("describeAllPerMinute: one pass equals the 13 per-column passes") {
    val all = Algorithms.describeAllPerMinute(telemetry)
    val one = Algorithms.describePerMinute(telemetry, "odometry_vehicle_speed")
      .where(col("trip_id") === 1 && col("minute") === ts("2021-03-09 14:18:00"))
      .head()
    val fromWide = all
      .where(col("trip_id") === 1 && col("minute") === ts("2021-03-09 14:18:00")
        && col("column") === "odometry_vehicle_speed")
      .collect().map(r => r.getAs[String]("stat") -> r.getAs[Double]("value"))
      .toMap
    assert(fromWide("n") == one.getAs[Long]("n").toDouble)
    assert(fromWide("vmax") == one.getAs[Double]("vmax"))
    assert(fromWide("p50") == one.getAs[Double]("p50"))
    assert(fromWide("mean_v") == one.getAs[Double]("mean_v"))
    assert(all.select("column").distinct().count() ==
      Algorithms.statsColumns.size)
  }

  test("describePerMinute instantiates the stats template") {
    val d = Algorithms.describePerMinute(telemetry, "odometry_vehicle_speed")
      .where(col("trip_id") === 1 && col("minute") === ts("2021-03-09 14:18:00"))
      .head()
    assert(d.getAs[Long]("n") == 60L && d.getAs[Double]("vmax") == 0.0)
  }
}
