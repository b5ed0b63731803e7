package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Sources}
import graft.ztbus.{Algorithms, Engine, Fixtures}

class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("telemetry lake roundtrip: partitioned write, typed read, pushdown scan") {
    val dir = Files.createTempDirectory("graft-lake").toString
    val telemetry = Fixtures.telemetry().toDF()
    Sinks.writeTelemetry(telemetry, s"$dir/telemetry")
    val back = Sources.telemetry(spark, s"$dir/telemetry")
    assert(back.count() == telemetry.count())
    val slice = Sources.readTelemetry(
      back.toDF(), Seq("trip_id", "time", "odometry_vehicle_speed"),
      tripId = Some(1L),
      timeFrom = Some(ts("2021-03-09 14:16:00")),
      timeTo = Some(ts("2021-03-09 14:16:59")))
    assert(slice.count() == 60)
    assert(slice.columns.toSeq ==
      Seq("trip_id", "time", "odometry_vehicle_speed"))
  }

  test("replayTick advances the ledger like the simulator loop") {
    val dir = Files.createTempDirectory("graft-replay").toString
    val telemetry = Fixtures.telemetry().toDF()
    val trips = Fixtures.trips.toDF()
    val w1 = Engine.replayTick(spark, telemetry, trips,
      s"$dir/ledger", s"$dir/results")
    assert(w1 == ((Fixtures.SeedEpoch, ts("2021-03-09 14:16:05"))))
    val w2 = Engine.replayTick(spark, telemetry, trips,
      s"$dir/ledger", s"$dir/results")
    assert(w2 == ((ts("2021-03-09 14:16:05"), ts("2021-03-09 14:17:05"))))
    assert(Sinks.latestLedger(spark, s"$dir/ledger").contains(w2))
    val results = spark.read.parquet(s"$dir/results")
    assert(results.select("algorithm").distinct().count() == 5)
  }

  test("batchRun composes the full pipeline over a range") {
    val r = Engine.batchRun(
      Fixtures.telemetry().toDF(), Fixtures.trips.toDF(),
      Fixtures.SeedEpoch, ts("2021-03-09 14:40:00"))
    assert(r.activeBuses.count() > 0)
    assert(r.results.count() == r.metrics.count() * 5)
    assert(r.haltSessions.where(col("name") === "HaltBrakeApplied").count() == 3)
    assert(r.parkSessions.count() == 1)
    // 32 stats algorithms: one result row per (algorithm, session window);
    // 16 columns x (3 halt + 1 park session)
    assert(r.sessionStats.count() == 16 * 4)
    assert(r.sessionStats.select("algorithm").distinct().count() == 32)
  }
}
