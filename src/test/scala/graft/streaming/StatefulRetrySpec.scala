package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** flatMapGroupsWithState retry counter: counts consecutive failures
  * per key across micro-batches, resets on success, flags dead-letter
  * at the threshold.
  */
class StatefulRetrySpec extends SparkSpec {
  import StatefulRetry._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("failure count persists across batches, resets on success, " +
      "dead-letters at the limit") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Attempt]
    val q = track(in.toDS(), limit = 3)
      .writeStream.format("memory").queryName("retry_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two failures for item 1, one success for item 2
      in.addData(Attempt(1L, ts(0), ok = false),
        Attempt(1L, ts(1), ok = false),
        Attempt(2L, ts(0), ok = true))
      q.processAllAvailable()
      // batch 2: third failure crosses the limit; item 2 fails once
      in.addData(Attempt(1L, ts(2), ok = false),
        Attempt(2L, ts(1), ok = false))
      q.processAllAvailable()
      // batch 3: item 1 finally succeeds -> counter resets
      in.addData(Attempt(1L, ts(3), ok = true))
      q.processAllAvailable()
      val rows = spark.table("retry_out").as[Verdict].collect()
        .sortBy(v => (v.item_id, v.ts.getTime))
      val item1 = rows.filter(_.item_id == 1L).map(v => (v.failures, v.dead))
      assert(item1.toSeq === Seq((1, false), (2, false), (3, true), (0, false)))
      val item2 = rows.filter(_.item_id == 2L).map(v => (v.failures, v.dead))
      assert(item2.toSeq === Seq((0, false), (1, false)))
    } finally q.stop()
  }
}
