package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming form of sessionization (q37's `session_window` /
  * `operators.Sessionize`'s batch labeling): gap-merged session
  * aggregates under a watermark, append mode — a session row is
  * emitted EXACTLY once, only after the watermark proves no more
  * events can extend it. State is per-open-session, not per-event,
  * so executor memory at 100 TB scales with concurrently-active
  * sessions, and the watermark bounds even that.
  */
case class SessEv(user_id: Long, ts: Timestamp)

class StreamingSessionSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("a session emits only after the watermark closes it, with " +
      "gap-adjacent events merged into one row") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEv]
    val sessions = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 minutes apart — one merged open session
      in.addData(SessEv(1L, ts(0)), SessEv(1L, ts(5)))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0,
        "an open session must not emit")
      // an event far in the future advances the watermark to t+80,
      // past user 1's session end (t+35) — the closed session flushes
      // (the no-data micro-batch after the watermark bump emits it)
      in.addData(SessEv(2L, ts(90)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(rows === Set((1L, 2L)),
        "exactly the closed session, exactly once; user 2 stays open")
    } finally q.stop()
  }
}
