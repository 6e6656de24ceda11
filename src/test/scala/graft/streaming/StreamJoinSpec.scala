package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream watermarked join: two live CDC feeds joined on key
  * with an event-time range — the enrichment shape where neither side
  * is static. The batch-equality half of the gate lives in q74 (same
  * `StreamJoin.enrich` code path, DuckDB oracle); this spec proves the
  * STREAMING-only semantics: rows arriving on either side in any
  * order still pair, and rows later than the watermark bound are
  * dropped by the state store instead of growing state forever.
  */
case class SjEv(user_id: Long, p_id: Long, p_ts: Timestamp)
case class SjCh(user_id: Long, c_id: Long, c_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("both sides buffer in state and pair regardless of arrival " +
      "order; results equal the batch run of the same function") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SjEv]
    val chs = MemoryStream[SjCh]
    val joined = StreamJoin.enrich(evs.toDF(), chs.toDF(), "user_id",
      "p_ts", "c_ts", lookbackSec = 600L, watermark = "5 minutes")
      .select(col("p_id"), col("c_id"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append).start()
    try {
      // change arrives BEFORE its event (the CDC race): still pairs
      chs.addData(SjCh(1L, 101L, ts(0)))
      q.processAllAvailable()
      evs.addData(SjEv(1L, 11L, ts(5)))
      q.processAllAvailable()
      // event before its change, other user: pairs too (in-window)
      evs.addData(SjEv(2L, 12L, ts(8)))
      chs.addData(SjCh(2L, 102L, ts(3)))
      q.processAllAvailable()
      // out-of-window change (11 min before the event): no pair
      chs.addData(SjCh(1L, 103L, ts(5 - 11)))
      q.processAllAvailable()
      val got = spark.table("sj_out").as[(Long, Long)].collect().toSet
      assert(got === Set((11L, 101L), (12L, 102L)))

      // batch run of the SAME function over the same rows agrees
      val bEv = Seq(SjEv(1L, 11L, ts(5)), SjEv(2L, 12L, ts(8))).toDF()
      val bCh = Seq(SjCh(1L, 101L, ts(0)), SjCh(2L, 102L, ts(3)),
        SjCh(1L, 103L, ts(-6))).toDF()
      val batch = StreamJoin.enrich(bEv, bCh, "user_id", "p_ts", "c_ts",
        600L, "5 minutes")
        .select(col("p_id"), col("c_id"))
        .as[(Long, Long)].collect().toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("a change arriving past the watermark is dropped: state was " +
      "evicted, so a matching in-window event finds nothing") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SjEv]
    val chs = MemoryStream[SjCh]
    val joined = StreamJoin.enrich(evs.toDF(), chs.toDF(), "user_id",
      "p_ts", "c_ts", lookbackSec = 600L, watermark = "5 minutes")
      .select(col("p_id"), col("c_id"))
    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode(OutputMode.Append).start()
    try {
      // advance BOTH watermarks far ahead (t+60): every buffered row
      // older than the derived eviction bound leaves state
      evs.addData(SjEv(9L, 900L, ts(60)))
      chs.addData(SjCh(9L, 901L, ts(60)))
      q.processAllAvailable()
      // a change 50 min late relative to the watermark: dropped on
      // arrival, so the in-window event that follows cannot pair
      chs.addData(SjCh(3L, 301L, ts(9)))
      evs.addData(SjEv(3L, 31L, ts(10)))
      q.processAllAvailable()
      val got = spark.table("sj_late").as[(Long, Long)].collect().toSet
      assert(!got.contains((31L, 301L)),
        s"late change must have been evicted/dropped, got $got")
      // and the state stayed bounded: fewer rows than total fed
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 4,
        s"state must hold only in-watermark rows: $state")
    } finally q.stop()
  }

  test("left_outer: an unmatched event emits null-padded only after " +
      "the watermark proves no change can still arrive; matched " +
      "events pair as in the inner join") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SjEv]
    val chs = MemoryStream[SjCh]
    val joined = StreamJoin.enrich(evs.toDF(), chs.toDF(), "user_id",
      "p_ts", "c_ts", lookbackSec = 600L, watermark = "5 minutes",
      joinType = "left_outer")
      .select(col("p_id"), col("c_id"))
    val q = joined.writeStream.format("memory").queryName("sj_outer")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 matched; user 2's event has no change at all
      evs.addData(SjEv(1L, 11L, ts(5)), SjEv(2L, 21L, ts(5)))
      chs.addData(SjCh(1L, 101L, ts(2)))
      q.processAllAvailable()
      val early = spark.table("sj_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(early === Set((11L, Some(101L))),
        s"unmatched event must NOT null-pad while a match is still " +
          s"possible, got $early")
      // advance both watermarks far past t+5's match window: the
      // engine can now prove no change will pair with event 21
      evs.addData(SjEv(9L, 900L, ts(60)))
      chs.addData(SjCh(9L, 901L, ts(60)))
      q.processAllAvailable()
      // an extra no-data micro-batch lets the evicted state flush
      evs.addData(SjEv(9L, 902L, ts(61)))
      q.processAllAvailable()
      val late = spark.table("sj_outer")
        .as[(Long, Option[Long])].collect().toSet
      assert(late.contains((21L, None)),
        s"closed event must emit null-padded, got $late")
    } finally q.stop()
  }

  test("reserved/overlapping column names are rejected up front") {
    val spark0 = spark
    import spark0.implicits._
    val l = Seq((1L, ts(0))).toDF("user_id", "p_ts")
    val r = Seq((1L, ts(0))).toDF("user_id", "p_ts")
    intercept[IllegalArgumentException] {
      StreamJoin.enrich(l, r, "user_id", "p_ts", "p_ts", 600L, "5 minutes")
    }
    val r2 = Seq((1L, ts(0), 1L)).toDF("user_id", "c_ts", "p_id")
    val l2 = Seq((1L, ts(0), 1L)).toDF("user_id", "p_ts", "p_id")
    intercept[IllegalArgumentException] {
      StreamJoin.enrich(l2, r2, "user_id", "p_ts", "c_ts", 600L,
        "5 minutes")
    }
  }
}
