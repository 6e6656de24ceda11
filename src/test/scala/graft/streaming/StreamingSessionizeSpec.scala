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

  test("parity with Spark's built-in session_window aggregation on the " +
      "same feed (where the gap semantics coincide)") {
    // Two deliberate boundary differences exist and are avoided here,
    // making everything else comparable: (a) the built-in merges only
    // when the next event is STRICTLY inside last_ts + gap while the
    // custom state merges inclusively at exactly-gap — so no two
    // events in this feed are exactly 10 minutes apart; (b) the
    // built-in reports window.end = last_ts + gap while the custom
    // operator reports the last event time — so the comparison shifts
    // the built-in end back by the gap. Within that, both must close
    // identical sessions with identical aggregates via the watermark.
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      Seq(SEvent(1L, ts(0), 1.0), SEvent(1L, ts(1), 2.0),
        SEvent(1L, ts(2), 3.0), SEvent(1L, ts(30), 4.0),
        SEvent(1L, ts(31), 5.0), SEvent(2L, ts(5), 7.0)),
      Seq(SEvent(7L, ts(120), 0.0)),
      Seq(SEvent(7L, ts(121), 0.0)))
    // custom operator
    val evsA = MemoryStream[SEvent]
    val qA = StreamingSessionize.sessions(evsA.toDS(),
      gapSeconds = 600L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ss_parity_custom")
      .outputMode(OutputMode.Append).start()
    // built-in session_window aggregation, identical feed
    val evsB = MemoryStream[SEvent]
    val qB = evsB.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("w.start").as("s"),
        col("w.end").as("e"), col("n"), col("v"))
      .writeStream.format("memory").queryName("ss_parity_builtin")
      .outputMode(OutputMode.Append).start()
    try {
      feed.foreach { batch =>
        evsA.addData(batch); evsB.addData(batch)
        qA.processAllAvailable(); qB.processAllAvailable()
      }
      val custom = spark.table("ss_parity_custom").as[Closed].collect()
        .filter(_.user_id != 7L)
        .map(c => (c.user_id, c.session_start.getTime,
          c.session_end.getTime, c.n_events, c.value_sum)).toSet
      val builtin = spark.table("ss_parity_builtin")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .filter(_._1 != 7L)
        .map { case (u, s, e, n, v) =>
          (u, s.getTime, e.getTime - 600000L, n, v) }.toSet
      assert(custom.nonEmpty, "watermark should have closed sessions")
      assert(custom === builtin,
        s"custom=$custom\nbuiltin=$builtin")
    } finally { qA.stop(); qB.stop() }
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

  test("state bound at scale: 100k keys' state rows track OPEN " +
      "sessions, drop to ~zero once the watermark closes them, and " +
      "every session emits exactly once") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 100000
    val evs = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(evs.toDS(),
      gapSeconds = 30L, watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ss_bound")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    def stateRows: Long = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    try {
      // wave 1: every key opens a session
      evs.addData((1 to n).map(i => SEvent(i.toLong, t(1000), 1.0)): _*)
      q.processAllAvailable()
      // wave 2: a second in-gap event per key — still ONE open
      // session each, so state must hold exactly n keys, not 2n rows
      evs.addData((1 to n).map(i => SEvent(i.toLong, t(1020), 2.0)): _*)
      q.processAllAvailable()
      val peak = stateRows
      assert(peak === n.toLong,
        s"state holds $peak rows for $n open sessions")
      // a single far-future event advances the watermark past every
      // fragment's end+gap: all n close via the event-time timeout
      // (no further traffic on their keys) and their state is REMOVED
      evs.addData(SEvent(0L, t(2000), 0.0))
      q.processAllAvailable()
      evs.addData(SEvent(0L, t(2001), 0.0)) // one more batch for timeouts
      q.processAllAvailable()
      val after = stateRows
      assert(after <= 2L,
        s"state still holds $after rows after every session closed " +
          s"(peak $peak) — closed-session state was not reclaimed")
      val closed = spark.table("ss_bound").as[Closed].collect()
        .filter(_.user_id >= 1L)
      assert(closed.length === n, s"${closed.length} closes for $n keys")
      assert(closed.forall(c => c.n_events == 2L && c.value_sum == 3.0))
    } finally q.stop()
  }
}
