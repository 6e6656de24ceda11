package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import StreamingSessionize.{Closed, SEvent}

class StreamingSessionizeSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def startQuery(evs: MemoryStream[SEvent]) = {
    val out = StreamingSessionize.sessions(evs.toDS(),
      gapSeconds = 600L, watermarkDelay = "10 minutes")
    out.writeStream.format("memory").queryName("ss_out")
      .outputMode(OutputMode.Append).start()
  }

  test("sessions close via the watermark without any further traffic " +
      "on their key, and equal the batch operator's grouping") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SEvent]
    val q = startQuery(evs)
    try {
      // user 1: two sessions (0-2 and 30-31, gap 28 min > 10)
      evs.addData(SEvent(1L, ts(0), 1.0), SEvent(1L, ts(1), 2.0),
        SEvent(1L, ts(2), 3.0), SEvent(1L, ts(30), 4.0),
        SEvent(1L, ts(31), 5.0))
      q.processAllAvailable()
      // user 7 pushes the watermark to 120 - 10 = 110 min; user 1 has
      // no rows in this or any later batch, so its closes ride the
      // event-time timeout alone
      evs.addData(SEvent(7L, ts(120), 0.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(121), 0.0)) // one more batch for timeouts
      q.processAllAvailable()
      val got = spark.table("ss_out").as[Closed].collect()
        .filter(_.user_id == 1L)
        .map(c => (c.session_start, c.session_end, c.n_events,
          c.value_sum)).toSet
      assert(got === Set((ts(0), ts(2), 3L, 6.0),
        (ts(30), ts(31), 2L, 9.0)))

      // the batch operator on the same rows groups identically
      val batch = Sessionize.assign(
        Seq((1L, ts(0), 1.0, 1L), (1L, ts(1), 2.0, 2L),
          (1L, ts(2), 3.0, 3L), (1L, ts(30), 4.0, 4L),
          (1L, ts(31), 5.0, 5L))
          .toDF("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "event_id", 600L)
        .groupBy(col("user_id"), col("session_n"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"),
          count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("s"), col("e"), col("n"), col("v"))
        .as[(Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("an out-of-order event inside the watermark bridges two open " +
      "fragments into one session") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SEvent]
    val q = startQuery(evs)
    try {
      // two fragments 12 min apart (> 10 min gap): still open, and
      // would close as TWO sessions were the stream to end here
      evs.addData(SEvent(1L, ts(0), 1.0), SEvent(1L, ts(12), 1.0))
      q.processAllAvailable()
      // the bridging event arrives late but within the watermark
      evs.addData(SEvent(1L, ts(6), 1.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(60), 0.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(61), 0.0))
      q.processAllAvailable()
      val got = spark.table("ss_out").as[Closed].collect()
        .filter(_.user_id == 1L)
      assert(got.map(c => (c.session_start, c.session_end,
        c.n_events)).toSeq === Seq((ts(0), ts(12), 3L)))
    } finally q.stop()
  }

  test("an event behind the watermark is dropped: a closed session " +
      "is never reopened or re-emitted") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[SEvent]
    val q = startQuery(evs)
    try {
      evs.addData(SEvent(1L, ts(0), 1.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(60), 0.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(61), 0.0))
      q.processAllAvailable()
      val before = spark.table("ss_out").as[Closed].collect()
        .count(_.user_id == 1L)
      assert(before === 1, "session closed once watermark passed")
      // ts(1) is far behind the 51-min watermark: dropped at source
      evs.addData(SEvent(1L, ts(1), 9.0))
      q.processAllAvailable()
      evs.addData(SEvent(7L, ts(62), 0.0))
      q.processAllAvailable()
      val after = spark.table("ss_out").as[Closed].collect()
        .filter(_.user_id == 1L)
      assert(after.length === 1 && after(0).n_events === 1L,
        "late event neither re-emits nor mutates the closed session")
    } finally q.stop()
  }

  test("fragment coalescing merges across the gap boundary inclusively " +
      "and keeps disjoint fragments apart") {
    import StreamingSessionize.{coalesce, Frag}
    def f(sMin: Long, eMin: Long) =
      Frag(sMin * 60000L, eMin * 60000L, 1L, 1.0)
    // exactly gap seconds apart merges (the batch operator's > opens)
    assert(coalesce(List(f(0, 0), f(10, 10)), 600L).length === 1)
    assert(coalesce(List(f(0, 0), f(11, 11)), 600L).length === 2)
    // containment and chains collapse regardless of input order
    val got = coalesce(List(f(20, 22), f(0, 5), f(4, 6), f(21, 21)), 600L)
    assert(got.map(g => (g.startMs / 60000L, g.endMs / 60000L, g.n))
      === List((0L, 6L, 2L), (20L, 22L, 2L)))
  }
}
