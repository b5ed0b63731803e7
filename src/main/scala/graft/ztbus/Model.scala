package graft.ztbus

import java.sql.Timestamp

/** Typed data model mirroring the reference's implicit schemas.
  *
  * `Telemetry` mirrors the 27-column SELECT list / `ReadTelemResultRow`
  * (reference processor/main.py:59-86, :99-130); `Trip` mirrors
  * `ReadTripsFromTripIdRow` (processor/main.py:189-204); `WindowEvent`
  * mirrors the `Window` value (processor/main.py:327-336) and
  * `AlgoResult` the `ValueResult`/`StructResult` payloads
  * (processor/main.py:371, :466-470).
  */
final case class Telemetry(
    id: Long,
    trip_id: Long,
    time: Timestamp,
    electric_power_demand: Double,
    temperature_ambient: Double,
    traction_brake_pressure: Double,
    traction_traction_force: Double,
    gnss_altitude: Option[Double],
    gnss_course: Option[Double],
    gnss_latitude: Option[Double],
    gnss_longitude: Option[Double],
    itcs_bus_route_id: Int,
    itcs_number_of_passengers: Int,
    itcs_stop_name: String,
    odometry_articulation_angle: Double,
    odometry_steering_angle: Double,
    odometry_vehicle_speed: Double,
    odometry_wheel_speed_fl: Double,
    odometry_wheel_speed_fr: Double,
    odometry_wheel_speed_ml: Double,
    odometry_wheel_speed_mr: Double,
    odometry_wheel_speed_rl: Double,
    odometry_wheel_speed_rr: Double,
    status_door_is_open: Boolean,
    status_grid_is_available: Boolean,
    status_halt_brake_is_active: Boolean,
    status_park_brake_is_active: Boolean)

final case class Trip(
    id: Long,
    name: String,
    bus_id: Long,
    route_id: Long,
    start_time: Timestamp,
    end_time: Timestamp,
    driven_distance_km: Double,
    energy_consumption_kwh: Double,
    itcs_passengers_mean: Double,
    itcs_passengers_min: Int,
    itcs_passengers_max: Int,
    grid_available_mean: Double,
    amb_temperature_mean: Double,
    amb_temperature_min: Double,
    amb_temperature_max: Double)

/** A window event — the reference's dataflow trigger value
  * (processor/main.py:327-336; metadata fields per window type at
  * processor/windows.py:3-16). */
final case class WindowEvent(
    time_from: Timestamp,
    time_to: Timestamp,
    name: String,
    version: String,
    origin: String,
    metadata: Map[String, String])

/** Window-type registry — the five declared types incl. the declared-only
  * TripEnd (reference processor/windows.py:7-37). */
object WindowTypes {
  val EveryMinute = ("EveryMinute", "1.0.0")
  val EveryMinutePerTripPerBus = ("EveryMinutePerTripPerBus", "1.0.0")
  val TripEnd = ("TripEnd", "1.0.0") // declared-only in the reference
  val HaltBrakeApplied = ("HaltBrakeApplied", "2.1.0")
  val ParkBrakeApplied = ("ParkBrakeApplied", "2.1.0")
}
