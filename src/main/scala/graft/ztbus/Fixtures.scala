package graft.ztbus

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ZTBus-shaped fixture generator (FIXTURES.md §A; seed via
  * pure arithmetic — no RNG). Mirrors the reference's replay seed epoch
  * 2021-03-09 14:15:05 (simulator/main.py:85-87) and plants the edge cases
  * the session/metric operators must survive: a halt-brake run crossing a
  * minute boundary, a run active at fixture start, an all-false trip, a
  * zero-movement minute (zero-denominator ratio path), NULL GNSS rows. */
object Fixtures {

  val SeedEpoch: Timestamp = Timestamp.valueOf("2021-03-09 14:15:05")

  /** trips: 3 trips over 2 buses / 2 routes. */
  def trips: Seq[Trip] = Seq(
    Trip(1L, "trip-1", bus_id = 183L, route_id = 31L,
      Timestamp.valueOf("2021-03-09 14:15:05"),
      Timestamp.valueOf("2021-03-09 14:25:05"),
      4.2, 5.1, 12.0, 3, 40, 0.4, 8.0, 6.5, 9.5),
    Trip(2L, "trip-2", bus_id = 208L, route_id = 31L,
      Timestamp.valueOf("2021-03-09 14:15:05"),
      Timestamp.valueOf("2021-03-09 14:25:05"),
      3.9, 4.8, 15.0, 5, 45, 0.5, 8.2, 6.9, 9.9),
    Trip(3L, "trip-3", bus_id = 183L, route_id = 32L,
      Timestamp.valueOf("2021-03-09 14:30:05"),
      Timestamp.valueOf("2021-03-09 14:36:05"),
      2.1, 2.6, 9.0, 1, 25, 0.3, 7.9, 6.2, 9.1))

  /** Distributed telemetry generator for throughput runs: same waveform
    * shapes as [[telemetry]] but built from `spark.range` + Column
    * expressions, so ZTBus-dataset-scale inputs (the reference's ~1.5 M
    * points ≈ `secondsPerTrip = 500000`) are generated on executors, never
    * materialized on the driver. */
  def telemetryDF(spark: SparkSession, secondsPerTrip: Long): DataFrame = {
    val tripDf = spark.createDataFrame(
      trips.map(t => (t.id, t.start_time, t.route_id.toInt)))
      .toDF("trip_id", "start_time", "route")
    spark.range(0, secondsPerTrip).withColumnRenamed("id", "s")
      .crossJoin(broadcast(tripDf))
      .select(
        (col("trip_id") * 10000000L + col("s")).as("id"),
        col("trip_id"),
        (col("start_time") + expr("make_interval(0, 0, 0, 0, 0, 0, s)"))
          .as("time"),
        (lit(50.0) + lit(20.0) * cos(col("s") / 15.0))
          .as("electric_power_demand"),
        (lit(8.0) + (col("s") % 10) * 0.1).as("temperature_ambient"),
        when((col("s") % 97) < 5, 5.0).otherwise(1.0)
          .as("traction_brake_pressure"),
        (lit(1000.0) + col("s") % 50).as("traction_traction_force"),
        (lit(400.0) + col("s") * 0.01).as("gnss_altitude"),
        (col("s") % 360).cast("double").as("gnss_course"),
        (lit(47.37) + col("s") * 1e-5).as("gnss_latitude"),
        (lit(8.54) + col("s") * 1e-5).as("gnss_longitude"),
        col("route").as("itcs_bus_route_id"),
        ((col("s") / 60).cast("int") % 30 + 3).as("itcs_number_of_passengers"),
        concat(lit("stop-"), (col("s") / 120).cast("long") % 5)
          .as("itcs_stop_name"),
        (lit(2.0) * sin(col("s") / 9.0)).as("odometry_articulation_angle"),
        (lit(10.0) * sin(col("s") / 11.0)).as("odometry_steering_angle"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_vehicle_speed"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_fl"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_fr"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_ml"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_mr"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_rl"),
        (lit(6.0) + lit(3.0) * sin(col("s") / 20.0 + col("trip_id")))
          .as("odometry_wheel_speed_rr"),
        ((col("s") % 120) < 10).as("status_door_is_open"),
        (col("s") % 2 === 0).as("status_grid_is_available"),
        ((col("s") % 89) < 7).as("status_halt_brake_is_active"),
        ((col("s") % 211) < 3).as("status_park_brake_is_active"))
  }

  /** 1 Hz telemetry, `seconds` samples per trip. Deterministic waveforms:
    *  - trip 1: halt-brake ON for t∈[50,70) (crosses the 14:16:00 minute
    *    boundary at t=55) and again [200,205); door-open dwell at stops;
    *    minute 3 (t∈[175,235)) has near-zero speed (dwell minute).
    *  - trip 2: halt-brake ON at t=0 (run active at start); park brake all
    *    false; every 7th GNSS row NULL.
    *  - trip 3: all flags false (no sessions).
    */
  def telemetry(seconds: Int = 600): Seq[Telemetry] = {
    trips.flatMap { t =>
      val n = if (t.id == 3L) math.min(seconds, 360) else seconds
      (0 until n).map { s =>
        val time = new Timestamp(t.start_time.getTime + s * 1000L)
        val dwellMinute = t.id == 1L && s >= 175 && s < 235
        val speed =
          if (dwellMinute) 0.0
          else 6.0 + 3.0 * math.sin(s / 20.0 + t.id)
        val halt = t.id match {
          case 1L => (s >= 50 && s < 70) || (s >= 200 && s < 205)
          case 2L => s < 30
          case _ => false
        }
        val park = t.id == 1L && s >= 500 && s < 520
        val door = dwellMinute || (s % 120 < 10)
        val gnssNull = t.id == 2L && s % 7 == 0
        Telemetry(
          id = t.id * 1000000L + s,
          trip_id = t.id,
          time = time,
          electric_power_demand = 50.0 + 20.0 * math.cos(s / 15.0),
          temperature_ambient = 8.0 + (s % 10) * 0.1,
          traction_brake_pressure = if (halt) 5.0 else 1.0,
          traction_traction_force = 1000.0 + s % 50,
          gnss_altitude = if (gnssNull) None else Some(400.0 + s * 0.01),
          gnss_course = if (gnssNull) None else Some((s % 360).toDouble),
          gnss_latitude = if (gnssNull) None else Some(47.37 + s * 1e-5),
          gnss_longitude = if (gnssNull) None else Some(8.54 + s * 1e-5),
          itcs_bus_route_id = t.route_id.toInt,
          itcs_number_of_passengers = (s / 60) % 30 + 3,
          itcs_stop_name = s"stop-${(s / 120) % 5}",
          odometry_articulation_angle = 2.0 * math.sin(s / 9.0),
          odometry_steering_angle = 10.0 * math.sin(s / 11.0),
          odometry_vehicle_speed = speed,
          odometry_wheel_speed_fl = speed * 1.01,
          odometry_wheel_speed_fr = speed * 0.99,
          odometry_wheel_speed_ml = speed * 1.00,
          odometry_wheel_speed_mr = speed * 1.02,
          odometry_wheel_speed_rl = speed * 0.98,
          odometry_wheel_speed_rr = speed * 1.03,
          status_door_is_open = door,
          status_grid_is_available = s % 2 == 0,
          status_halt_brake_is_active = halt,
          status_park_brake_is_active = park)
      }
    }
  }
}
