package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ztbus.{Algorithms, Fixtures}

class FanOutSpec extends SparkSpec {
  import spark.implicits._

  test("fanOutWindowEvents emits one event per active key with full metadata") {
    val ev = Algorithms.fanOutWindowEvents(
      Fixtures.telemetry().toDF(), Fixtures.trips.toDF())
    val rows = ev.collect()
    assert(rows.nonEmpty)
    val r = ev.where(
        col("time_from") === Timestamp.valueOf("2021-03-09 14:16:00") &&
          col("metadata")("trip_id") === "1")
      .head()
    assert(r.getAs[String]("name") == "EveryMinutePerTripPerBus")
    assert(r.getAs[Timestamp]("time_to") == Timestamp.valueOf("2021-03-09 14:17:00"))
    val md = r.getAs[Map[String, String]]("metadata")
    assert(md("bus_id") == "183" && md("route_id") == "31")
    // fan-out cardinality == active keys cardinality
    assert(ev.count() == Algorithms.activeBusesPerMinute(
      Fixtures.telemetry().toDF(), Fixtures.trips.toDF()).count())
  }

  test("statsRegistry exposes the reference's 32 brake-session stats algorithms") {
    val reg = Algorithms.statsRegistry
    assert(reg.size == 32 && Algorithms.statsColumns.size == 16)
    // exact reference decorator names (other_metrics.py:41,62,145,166)
    val names = reg.map(_.name).toSet
    assert(names.contains("ElectricPowerDemandHaltBrakeStats"))
    assert(names.contains("GnssAltitudeHaltBrakeStats"))
    assert(names.contains("OdometryWheelSpeedRrParkBrakeStats"))
    assert(reg.forall(_.version == "1.0.0"))
    assert(reg.count(_.trigger == graft.ztbus.WindowTypes.HaltBrakeApplied) == 16)
    assert(reg.count(_.trigger == graft.ztbus.WindowTypes.ParkBrakeApplied) == 16)
    assert(reg.forall(_.resultCols ==
      Seq("mean", "std", "min", "25p", "50p", "75p", "max")))
  }
}
