package graft.ztbus

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Batch engine drivers (SURVEY.md §3, §7).
  *
  * Two modes:
  *  - collapsed (primary): one declarative plan computes every algorithm for
  *    every window key over the whole requested range — what the reference
  *    does with 1 + N + 5N RPCs per minute.
  *  - faithful replay: advances the minute ledger exactly like the
  *    simulator loop (seed epoch → +60 s per tick, simulator/main.py:84-93)
  *    and emits WindowEvent rows for auditability, while delegating the
  *    actual computation to the same collapsed plan restricted to the tick's
  *    interval.
  */
object Engine {

  /** Collapsed batch run: all metrics + all sessions + the 32 session-stats
    * algorithm results for a time range — the reference's COMPLETE
    * registered-algorithm surface in one call. */
  def batchRun(telemetry: DataFrame, trips: DataFrame,
      from: Timestamp, to: Timestamp): BatchResults = {
    val slice = telemetry.where(col("time") >= lit(from) && col("time") < lit(to))
    val metrics = Algorithms.perMinuteMetrics(slice, trips)
    BatchResults(
      activeBuses = Algorithms.activeBusCount(slice, trips),
      metrics = metrics,
      results = Algorithms.asAlgoResults(metrics),
      haltSessions = Algorithms.sessionsAsWindowEvents(
        Algorithms.brakeSessions(slice, "status_halt_brake_is_active"),
        WindowTypes.HaltBrakeApplied, "halt_brake_finder"),
      parkSessions = Algorithms.sessionsAsWindowEvents(
        Algorithms.brakeSessions(slice, "status_park_brake_is_active"),
        WindowTypes.ParkBrakeApplied, "park_brake_finder"),
      sessionStats = Algorithms.brakeSessionStatsAsResults(
          slice, "status_halt_brake_is_active", WindowTypes.HaltBrakeApplied)
        .unionByName(Algorithms.brakeSessionStatsAsResults(
          slice, "status_park_brake_is_active", WindowTypes.ParkBrakeApplied)))
  }

  final case class BatchResults(
      activeBuses: DataFrame,
      metrics: DataFrame,
      results: DataFrame,
      haltSessions: DataFrame,
      parkSessions: DataFrame,
      sessionStats: DataFrame)

  /** Faithful replay tick: read ledger tail → advance one minute → compute
    * that minute → append ledger. Returns the processed window, or the seed
    * window on an empty ledger (simulator/main.py:84-93). */
  def replayTick(spark: SparkSession, telemetry: DataFrame, trips: DataFrame,
      ledgerPath: String, resultsPath: String): (Timestamp, Timestamp) = {
    val prevEnd = Sinks.latestLedger(spark, ledgerPath)
      .map(_._2).getOrElse(Fixtures.SeedEpoch)
    val next = (prevEnd, new Timestamp(prevEnd.getTime + 60000L))
    val metrics = Algorithms.perMinuteMetrics(
      telemetry.where(col("time") >= lit(next._1) && col("time") < lit(next._2)),
      trips)
    Sinks.writeResults(Algorithms.asAlgoResults(metrics), resultsPath)
    Sinks.appendLedger(spark, ledgerPath, next._1, next._2)
    next
  }
}
