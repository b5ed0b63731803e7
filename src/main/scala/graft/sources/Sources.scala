package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CoreOps
import graft.ztbus.{Telemetry, Trip}

/** Typed readers for the ZTBus data model over a partitioned parquet lake —
  * the storage layer replacing the reference's Postgres row store
  * (SURVEY.md §4 "physical-design choices").
  *
  * 100 TB layout contract: telemetry written via [[Sinks.writeTelemetry]] is
  * partitioned by event date (directory-level pruning for every time-bounded
  * read — the S1 predicate builder turns `time BETWEEN` into partition
  * pruning + row-group skipping) and sorted within partitions by
  * (trip_id, time) so session detection and per-trip windows read
  * near-clustered data. */
object Sources {

  /** Read a telemetry lake as a typed Dataset (27-column schema enforced by
    * the case-class encoder — extra columns pruned, missing ones fail fast). */
  def telemetry(spark: SparkSession, path: String): Dataset[Telemetry] = {
    import spark.implicits._
    spark.read.parquet(path).as[Telemetry]
  }

  def trips(spark: SparkSession, path: String): Dataset[Trip] = {
    import spark.implicits._
    spark.read.parquet(path).as[Trip]
  }

  /** CSV ingest with the strict typed schema (header expected; malformed
    * rows fail fast — ingest integrity over silent nulls). */
  def telemetryCsv(spark: SparkSession, path: String): Dataset[Telemetry] = {
    import spark.implicits._
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(implicitly[org.apache.spark.sql.Encoder[Telemetry]].schema)
      .csv(path)
      .as[Telemetry]
  }

  /** JSON-lines ingest with the strict typed schema. */
  def telemetryJson(spark: SparkSession, path: String): Dataset[Telemetry] = {
    import spark.implicits._
    spark.read
      .option("mode", "FAILFAST")
      .schema(implicitly[org.apache.spark.sql.Encoder[Telemetry]].schema)
      .json(path)
      .as[Telemetry]
  }

  /** S1 over a JDBC row store — the reference's PRIMARY source is Postgres
    * (connection at reference processor/db.py:9-19, cursor read at
    * processor/main.py:147-155). The reference streams one cursor; here the
    * read is range-partitioned on `partitionColumn` into `numPartitions`
    * disjoint-range queries issued in parallel from the executors, each with
    * `fetchsize`-batched row transfer — the scan parallelism a 1000-executor
    * cluster needs from a relational source. Predicates and projection
    * still push down: Spark's JDBC relation compiles `.where`/`.select`
    * into server-side WHERE/SELECT lists. */
  def telemetryJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, fetchSize: Int = 10000,
      connProps: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    connProps.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("fetchsize", fetchSize.toString)
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)
  }

  /** Partition bounds for a range-partitioned JDBC read, derived from the
    * table itself with one tiny aggregate query. A guessed constant bound
    * silently unbalances the read: every key beyond the guess funnels into
    * the last partition's open-ended range query (the round-2 default of
    * `1 << 20` did exactly that for key spaces past ~1M). None on an empty
    * table. */
  def jdbcBounds(spark: SparkSession, url: String, table: String,
      column: String,
      connProps: Map[String, String] = Map.empty): Option[(Long, Long)] = {
    val props = new java.util.Properties()
    connProps.foreach { case (k, v) => props.setProperty(k, v) }
    // Dialect-quote the column: engines with case-folding identifiers
    // (Derby/Postgres uppercase/lowercase unquoted names) would otherwise
    // miss columns created quoted by Spark's own JDBC writer.
    val c = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(column)
    val q = s"(SELECT MIN($c) AS lo, MAX($c) AS hi FROM $table) bounds"
    val row = spark.read.jdbc(url, q, props).collect().head
    if (row.isNullAt(0)) None
    else Some((row.getAs[Number](0).longValue, row.getAs[Number](1).longValue))
  }

  /** [[readTelemetry]] over a JDBC source: the same ≥1-predicate contract
    * and projection, with the predicates reaching the remote database as
    * WHERE clauses on every partition query. Partition bounds default to
    * [[jdbcBounds]] (min/max of `partitionColumn`) so the range stride
    * matches the actual key space; pass both explicitly to skip the extra
    * round-trip when the bounds are already known. */
  def readTelemetryJdbc(spark: SparkSession, url: String, table: String,
      cols: Seq[String],
      tripId: Option[Long] = None,
      timeFrom: Option[Timestamp] = None,
      timeTo: Option[Timestamp] = None,
      partitionColumn: String = "trip_id",
      lowerBound: Option[Long] = None, upperBound: Option[Long] = None,
      numPartitions: Int = 32): DataFrame = {
    // validate the ≥1-predicate contract BEFORE the bounds round-trip: a
    // refused call must not cost the database a query
    require(tripId.nonEmpty || timeFrom.nonEmpty || timeTo.nonEmpty,
      "at least one of key/timeFrom/timeTo is required (unbounded scan refused)")
    val derived =
      if (lowerBound.nonEmpty && upperBound.nonEmpty) None
      else jdbcBounds(spark, url, table, partitionColumn)
    val lo = lowerBound.orElse(derived.map(_._1)).getOrElse(0L)
    // +1: Spark's upperBound is a stride bound (rows above it still read,
    // via the last partition's open-ended query) — include max in the stride.
    val hi = upperBound.orElse(derived.map(_._2 + 1)).getOrElse(1L)
    readTelemetry(
      telemetryJdbc(spark, url, table, partitionColumn, lo,
        math.max(hi, lo + 1), numPartitions),
      cols, tripId, timeFrom, timeTo)
  }

  /** S1 — the reference's telemetry read API: ≥1 predicate required,
    * closed time interval, explicit projection; predicates reach the scan
    * (PushedFilters / partition pruning). Mirrors
    * read_telemetry(trip_id, time_from, time_to) at reference
    * processor/main.py:89-155. */
  def readTelemetry(
      telemetry: DataFrame,
      cols: Seq[String],
      tripId: Option[Long] = None,
      timeFrom: Option[Timestamp] = None,
      timeTo: Option[Timestamp] = None): DataFrame =
    CoreOps.scanWithPredicates(
      telemetry, cols, "trip_id", tripId, "time", timeFrom, timeTo)
}

/** Writers: the result sink (S7), ledger append (S5), and the partitioned
  * telemetry lake layout. */
object Sinks {

  /** Write telemetry in the 100 TB layout: date-partitioned,
    * trip/time-clustered within files. */
  def writeTelemetry(df: DataFrame, path: String): Unit =
    // Repartition by (date, trip) — NOT date alone, which would funnel a
    // whole day (potentially TBs at 1 Hz × fleet) into one task; trip
    // granularity keeps write parallelism while the partitionBy still
    // yields one directory per date and trips stay file-clustered.
    df.withColumn("date", to_date(col("time")))
      .repartition(col("date"), col("trip_id"))
      .sortWithinPartitions(col("trip_id"), col("time"))
      .write.partitionBy("date").mode("append").parquet(path)

  /** S7 — algorithm-result sink: one row per (algorithm, version, window
    * key), date-partitioned like the fact data. */
  def writeResults(results: DataFrame, path: String): Unit =
    results.withColumn("date", to_date(col("minute")))
      .write.partitionBy("date").mode("append").parquet(path)

  /** S5 — ledger append (the simulator's sim_logs INSERT,
    * simulator/main.py:96-101). In streaming this is subsumed by the
    * checkpoint; batch replays append here for auditability. */
  def appendLedger(spark: SparkSession, path: String,
      startTime: Timestamp, endTime: Timestamp): Unit = {
    import spark.implicits._
    Seq((startTime, endTime)).toDF("start_time", "end_time")
      .write.mode("append").parquet(path)
  }

  /** S4 — ledger tail read (latest row). A missing ledger means "never ran"
    * → None; any OTHER failure (corrupt files, permissions) propagates —
    * swallowing it would make a replay driver silently restart from scratch
    * instead of resuming. */
  def latestLedger(spark: SparkSession, path: String): Option[(Timestamp, Timestamp)] = {
    import spark.implicits._
    try spark.read.parquet(path)
      .orderBy(col("end_time").desc)
      .limit(1)
      .as[(Timestamp, Timestamp)]
      .collect().headOption
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => None
    }
  }
}
