package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.streaming.Streaming.FlagSample

/** The faithful two-stage cascade run END TO END in streaming mode:
  * stage 1 (sessionize) emits window events to a file topic; stage 2
  * subscribes to that topic and aggregates — the reference's
  * emitter → window_events → algorithm dataflow (processor/main.py:356-369)
  * — including a stop/restart of BOTH stages from their checkpoints. */
class StreamingCascadeSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def sec(base: String, s: Int) =
    new Timestamp(Timestamp.valueOf(base).getTime + s * 1000L)

  test("stage-1 session events drive stage-2 aggregation across a restart") {
    implicit val s = spark
    val base = "2021-03-09 14:15:00"
    val topic = Files.createTempDirectory("graft-topic").toString
    val ckpt1 = Files.createTempDirectory("graft-ck1").toString
    val ckpt2 = Files.createTempDirectory("graft-ck2").toString
    val out2 = Files.createTempDirectory("graft-out2").toString
    val in = MemoryStream[FlagSample]

    def stage1() = Streaming.sessionize(in.toDS()).writeStream
      .outputMode("append").format("parquet")
      .option("path", topic).option("checkpointLocation", ckpt1)
      .start()
    def stage2() = Streaming
      .sessionMinuteAgg(Streaming.sessionTopic(spark, topic).toDF())
      .writeStream
      .outputMode("append").format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .start()

    // run 1: trip 1 brakes for samples 0..9; the false sample closes the
    // session, stage 1 publishes it to the topic, stage 2 buffers it (its
    // minute cannot finalize yet — watermark hasn't passed)
    val q1a = stage1(); val q2a = stage2()
    in.addData((0 to 9).map(i => FlagSample(1L, sec(base, i), flag = true)))
    in.addData(FlagSample(1L, sec(base, 12), flag = false))
    q1a.processAllAvailable(); q2a.processAllAvailable()
    assert(spark.read.parquet(topic).count() == 1, "stage 1 emitted the session")
    q1a.stop(); q2a.stop()

    // run 2 (recovered from checkpoints): a much later trip-2 session both
    // exercises new stage-1 state and pushes stage 2's watermark past
    // trip 1's minute, finalizing its aggregate exactly once
    val q1b = stage1(); val q2b = stage2()
    in.addData((2000 to 2004).map(i => FlagSample(2L, sec(base, i), flag = true)))
    in.addData(FlagSample(2L, sec(base, 2006), flag = false))
    q1b.processAllAvailable(); q2b.processAllAvailable()
    q1b.stop(); q2b.stop()

    val got = spark.read.parquet(out2)
      .select("minute", "trip_id", "n_sessions", "brake_s")
      .as[(Timestamp, Long, Long, Long)].collect().toSet
    assert(got == Set((Timestamp.valueOf(base), 1L, 1L, 10L)),
      s"exactly one finalized aggregate for trip 1's braking minute: $got")
  }
}
