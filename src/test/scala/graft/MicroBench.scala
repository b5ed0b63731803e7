package graft

/** Dev measurement harness (test scope — not part of the shipped library):
  * times one named scenario over the 1.5 M-row ztbus bench fixture, N reps.
  *
  * Usage: sbt "Test/runMain graft.MicroBench <scenario> [reps]"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val scenario = args.headOption.getOrElse("session_stats")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ztbus.{Algorithms, Fixtures}
    val tel = Fixtures.telemetryDF(spark, 500000L)
    val trips = { import spark.implicits._; Fixtures.trips.toDF() }

    def run(): Unit = {
      val df = scenario match {
        case "session_stats" =>
          Algorithms.brakeSessionStats(tel, "status_halt_brake_is_active")
        case "session_stats_chunked" =>
          Algorithms.brakeSessionStats(tel, "status_halt_brake_is_active",
            chunkSeconds = Some(3600L))
        case "sessions" =>
          Algorithms.brakeSessions(tel, "status_halt_brake_is_active")
        // single giant key — the chunked variant's target regime
        case "session_stats_1key" =>
          Algorithms.brakeSessionStats(
            Fixtures.telemetryDF(spark, 2000000L)
              .where(org.apache.spark.sql.functions.col("trip_id") === 1L),
            "status_halt_brake_is_active")
        case "session_stats_1key_chunked" =>
          Algorithms.brakeSessionStats(
            Fixtures.telemetryDF(spark, 2000000L)
              .where(org.apache.spark.sql.functions.col("trip_id") === 1L),
            "status_halt_brake_is_active", chunkSeconds = Some(3600L))
        case "metrics" => Algorithms.perMinuteMetrics(tel, trips)
        case "dedup_clusters" =>
          // the full q51 pipeline at bench scale (sf0.1 documents)
          import org.apache.spark.sql.functions.col
          graft.operators.DedupOps.dedupClusters(
            graft.operators.DedupOps.lshCandidatePairs(
              graft.operators.DedupOps.minhashSignatures(
                Tables.documents(spark, "/root/testdata/sf0.1"),
                col("doc_id"), col("text"), 2)),
            "doc_a", "doc_b")
        case other => sys.error(s"unknown scenario: $other")
      }
      df.write.format("noop").mode("overwrite").save()
    }

    run() // warmup
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      run()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[microbench] $scenario rep $i: $s%.2f s")
      s
    }
    println(f"[microbench] $scenario median: ${times.sorted.apply(reps / 2)}%.2f s")
    spark.stop()
  }
}
