package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** T4 in its streaming-native form: `dropDuplicatesWithinWatermark`
  * suppresses re-deliveries of the same event across micro-batches as
  * long as they arrive within the watermark delay — the reference's
  * queue coalescing without a mutable queue.
  */
case class Ev(event_id: Long, item_id: Long, ts: Timestamp)

class StreamingDedupSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("re-delivered events within the watermark are suppressed") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val deduped = in.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(1L, 10L, ts(0)), Ev(2L, 10L, ts(1)))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 (at-least-once upstream) + a new one
      in.addData(Ev(1L, 10L, ts(2)), Ev(3L, 11L, ts(2)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
