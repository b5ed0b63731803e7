package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.streaming.Streaming.{FlagSample, SessionOut}

/** Checkpoint-recovery: the sessionizer's keyed state must survive a query
  * restart (the durability the reference hand-rolls with its sim_logs
  * ledger, simulator/main.py:96-101 — here it's the streaming checkpoint). */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def sec(base: String, s: Int) =
    new Timestamp(Timestamp.valueOf(base).getTime + s * 1000L)

  test("open-run state survives a stop/restart from the checkpoint") {
    implicit val s = spark
    val base = "2021-03-09 14:15:00"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-sess-out").toString
    val in = MemoryStream[FlagSample]

    def start() = Streaming.sessionize(in.toDS()).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    // batch 1: run open at stop time — state only exists in the checkpoint
    val q1 = start()
    in.addData((0 to 9).map(i => FlagSample(1L, sec(base, i), flag = true)))
    q1.processAllAvailable()
    q1.stop()

    // restart: the closing sample arrives after recovery
    val q2 = start()
    in.addData(FlagSample(1L, sec(base, 11), flag = false))
    q2.processAllAvailable()
    q2.stop()

    val sessions = spark.read.parquet(out).as[SessionOut].collect()
    assert(sessions.toSeq == Seq(
      SessionOut(1L, sec(base, 0), sec(base, 9), 10L)),
      "one session spanning both runs of the query, emitted exactly once")
  }
}
