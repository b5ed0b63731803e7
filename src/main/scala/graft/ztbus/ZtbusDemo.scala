package graft.ztbus

import org.apache.spark.sql.SparkSession

/** End-to-end batch run of the collapsed ZTBus pipeline over the built-in
  * fixture: active buses → per-minute metrics → per-algorithm results →
  * brake sessions. Prints row counts and samples — the library-boundary
  * entry point a reference user would start from. */
object ZtbusDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val telemetry = Fixtures.telemetry().toDF()
    val trips = Fixtures.trips.toDF()

    val active = Algorithms.activeBusCount(telemetry, trips)
    println(s"[demo] active-bus windows: ${active.count()}")
    active.orderBy("minute").show(5, truncate = false)

    val metrics = Algorithms.perMinuteMetrics(telemetry, trips)
    println(s"[demo] per-minute metric rows: ${metrics.count()}")
    metrics.orderBy("minute", "trip_id").show(5, truncate = false)

    val results = Algorithms.asAlgoResults(metrics)
    println(s"[demo] algorithm results: ${results.count()}")
    results.show(6, truncate = false)

    val sessions = Algorithms.brakeSessions(telemetry, "status_halt_brake_is_active")
    println(s"[demo] halt-brake sessions: ${sessions.count()}")
    sessions.orderBy("trip_id", "time_from").show(truncate = false)

    println("[demo] physical plan of the collapsed metric job:")
    metrics.explain("formatted")
    spark.stop()
  }
}
