package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.sources.Sources

/** Integration test for the JDBC read path against an in-memory Derby
  * database (the JDBC driver Spark ships with) — a stand-in for the
  * reference's Postgres source with identical Spark-side mechanics:
  * range-partitioned parallel reads + predicate pushdown. */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby").toString)
    val u = "jdbc:derby:memory:graft;create=true"
    // seed a telemetry-shaped table through Spark's own JDBC writer
    Seq(
      (1L, 10L, Timestamp.valueOf("2021-03-09 14:15:05"), 50.0),
      (2L, 10L, Timestamp.valueOf("2021-03-09 14:15:06"), 51.0),
      (3L, 11L, Timestamp.valueOf("2021-03-09 14:15:05"), 60.0),
      (4L, 11L, Timestamp.valueOf("2021-03-09 14:15:07"), 61.0),
      (5L, 12L, Timestamp.valueOf("2021-03-09 14:16:05"), 70.0))
      .toDF("id", "trip_id", "time", "electric_power_demand")
      .write.mode("overwrite").jdbc(u, "telemetry", new java.util.Properties())
    u
  }

  test("telemetryJdbc reads range-partitioned with the requested parallelism") {
    val df = Sources.telemetryJdbc(spark, url, "telemetry",
      partitionColumn = "trip_id", lowerBound = 10L, upperBound = 13L,
      numPartitions = 3, fetchSize = 100)
    assert(df.rdd.getNumPartitions == 3, "one task per trip_id range")
    assert(df.count() == 5)
    assert(df.select(sum(col("electric_power_demand"))).as[Double].head() == 292.0)
  }

  test("readTelemetryJdbc pushes predicates to the database") {
    val df = Sources.readTelemetryJdbc(spark, url, "telemetry",
      cols = Seq("id", "trip_id", "electric_power_demand"),
      tripId = Some(11L),
      lowerBound = Some(10L), upperBound = Some(13L), numPartitions = 2)
    assert(df.as[(Long, Long, Double)].collect().sorted.toSeq ==
      Seq((3L, 11L, 60.0), (4L, 11L, 61.0)))
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("trip_id"),
      s"trip predicate must reach the JDBC scan:\n$plan")
    // unbounded scans stay refused on the JDBC path too — BEFORE the
    // derived-bounds round-trip (a refused call must not query the DB)
    intercept[IllegalArgumentException] {
      Sources.readTelemetryJdbc(spark, url, "telemetry", Seq("id"))
    }
  }

  test("derived bounds balance partitions on a key space far beyond 2^20") {
    // 40 trips spread over [2^30, 2^30 + 40e9) — a guessed 1<<20 upper
    // bound would funnel every row into the last partition's open range
    val base = 1L << 30
    (0 until 40).map(i =>
      (100L + i, base + i * 1000000000L,
        Timestamp.valueOf("2021-03-09 14:15:05"), i.toDouble))
      .toDF("id", "trip_id", "time", "electric_power_demand")
      .write.mode("overwrite").jdbc(url, "telemetry_big", new java.util.Properties())

    assert(Sources.jdbcBounds(spark, url, "telemetry_big", "trip_id")
      .contains((base, base + 39 * 1000000000L)))

    val auto = Sources.readTelemetryJdbc(spark, url, "telemetry_big",
      cols = Seq("id", "trip_id"), timeFrom = Some(Timestamp.valueOf("2021-01-01 00:00:00")),
      numPartitions = 4)
    val autoCounts = auto.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(autoCounts.length == 4 && autoCounts.max <= 11,
      s"derived bounds must spread rows: ${autoCounts.toSeq}")

    val guessed = Sources.readTelemetryJdbc(spark, url, "telemetry_big",
      cols = Seq("id", "trip_id"), timeFrom = Some(Timestamp.valueOf("2021-01-01 00:00:00")),
      lowerBound = Some(0L), upperBound = Some(1L << 20), numPartitions = 4)
    val guessedCounts = guessed.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(guessedCounts.max == 40,
      s"the old constant bound funnels everything into one partition: ${guessedCounts.toSeq}")
  }
}
