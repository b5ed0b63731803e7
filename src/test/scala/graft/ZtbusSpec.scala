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

  test("brakeSessionStats: one row per (session, column, stat), correct values") {
    val stats = Algorithms.brakeSessionStats(telemetry, "status_halt_brake_is_active")
    // 3 halt sessions × 16 columns × 7 stats
    assert(stats.count() == 3L * 16 * 7)
    // trip 1's first halt session is s in [50, 70): check speed stats by hand
    val speeds = (50 until 70).map(s => 6.0 + 3.0 * math.sin(s / 20.0 + 1))
    val m = stats.where(col("trip_id") === 1 &&
        col("time_from") === ts("2021-03-09 14:15:55") &&
        col("column") === "odometry_vehicle_speed")
      .collect().map(r => r.getAs[String]("stat") -> r.getAs[Double]("value"))
      .toMap
    assert(m.keySet == Set("mean", "std", "min", "25p", "50p", "75p", "max"))
    assert(math.abs(m("mean") - speeds.sum / speeds.size) < 1e-9)
    assert(m("min") == speeds.min && m("max") == speeds.max)
    val sessionRow = stats.where(col("trip_id") === 1 &&
        col("time_from") === ts("2021-03-09 14:15:55")).head()
    assert(sessionRow.getAs[Timestamp]("time_to") == ts("2021-03-09 14:16:14"))
    assert(sessionRow.getAs[Long]("n_samples") == 20L)
  }

  test("brakeSessionStats skips NULL GNSS samples like pandas describe") {
    // trip 2's halt session s in [0,30) has every 7th GNSS row NULL
    val alt = Algorithms
      .brakeSessionStats(telemetry, "status_halt_brake_is_active")
      .where(col("trip_id") === 2 && col("column") === "gnss_altitude")
      .collect().map(r => r.getAs[String]("stat") -> r.getAs[Double]("value"))
      .toMap
    val present = (0 until 30).filter(_ % 7 != 0).map(s => 400.0 + s * 0.01)
    assert(math.abs(alt("mean") - present.sum / present.size) < 1e-9)
    assert(alt("min") == present.min && alt("max") == present.max)
  }

  test("brakeSessionStats equals the session x telemetry interval-join formulation") {
    // the reference re-reads telemetry BETWEEN time_from AND time_to per
    // session (other_metrics.py:5-13); with unique 1 Hz sample times the
    // run-id aggregation must produce identical stats
    val sessions = Algorithms.brakeSessions(telemetry, "status_halt_brake_is_active")
      .withColumnRenamed("trip_id", "s_trip")
    val joined = telemetry.join(sessions,
      col("trip_id") === col("s_trip") &&
        col("time").between(col("time_from"), col("time_to")))
    val byJoin = graft.operators.CoreOps.describeStats(
      joined, Seq(col("trip_id"), col("time_from")), col("gnss_course"))
      .select("trip_id", "time_from", "p50", "mean_v")
      .as[(Long, Timestamp, Double, Double)].collect().toSet
    val byRun = Algorithms
      .brakeSessionStats(telemetry, "status_halt_brake_is_active")
      .where(col("column") === "gnss_course" && col("stat").isin("50p", "mean"))
      .groupBy("trip_id", "time_from")
      .pivot("stat", Seq("50p", "mean")).agg(first(col("value")))
      .as[(Long, Timestamp, Double, Double)].collect().toSet
    assert(byRun == byJoin)
  }

  test("brakeSessionStatsAsResults emits reference algorithm names + payloads") {
    val res = Algorithms.brakeSessionStatsAsResults(
      telemetry, "status_park_brake_is_active",
      graft.ztbus.WindowTypes.ParkBrakeApplied)
    assert(res.count() == 16L) // 1 park session × 16 columns
    val r = res.where(col("algorithm") === "GnssAltitudeParkBrakeStats").head()
    assert(r.getAs[String]("name") == "ParkBrakeApplied")
    assert(r.getAs[String]("version") == "1.0.0")
    val payload = r.getAs[Map[String, Double]]("payload")
    assert(payload.keySet == Set("mean", "std", "min", "25p", "50p", "75p", "max"))
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

  test("describeAllPerMinute: one pass equals the per-column passes") {
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
