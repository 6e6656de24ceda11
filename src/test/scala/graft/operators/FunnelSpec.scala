package graft.operators

import graft.SparkSpec

/** Funnel.stages: ordered-subsequence semantics — later steps only
  * count after earlier ones, out-of-order completions don't.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("stage counts the longest IN-ORDER prefix of the step sequence") {
    val events = Seq(
      // user 1: full funnel in order, with noise interleaved
      (1L, 10L, 1L, "view"), (1L, 11L, 2L, "error"),
      (1L, 12L, 3L, "click"), (1L, 13L, 4L, "purchase"),
      // user 2: purchase BEFORE view/click — only stage 1 (the view)
      (2L, 10L, 5L, "purchase"), (2L, 11L, 6L, "view"),
      // user 3: view then purchase, no click — stage 1
      (3L, 10L, 7L, "view"), (3L, 11L, 8L, "purchase"),
      // user 4: never starts — stage 0
      (4L, 10L, 9L, "signup"),
      // user 5: click-first then the full ordered funnel — stage 3
      (5L, 9L, 10L, "click"), (5L, 10L, 11L, "view"),
      (5L, 11L, 12L, "click"), (5L, 12L, 13L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.stages(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 3))
  }

  test("ties on timestamp resolve by the tiebreak column, " +
      "deterministically") {
    // same ts: event_id order decides — click(id=1) before view(id=2)
    // means the click can't count toward the funnel
    val events = Seq(
      (1L, 10L, 1L, "click"), (1L, 10L, 2L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.stages(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1))
  }

  test("stagesTimed records the greedy-matched timestamp of each " +
      "completed step and agrees with stages on the stage count") {
    val events = Seq(
      // user 1: full funnel; the SECOND view (t=14) must not replace
      // the first match, and the click consumed is the first one
      // after the matched view
      (1L, 10L, 1L, "view"), (1L, 12L, 2L, "click"),
      (1L, 14L, 3L, "view"), (1L, 15L, 4L, "purchase"),
      // user 2: click precedes the only view — click never matches,
      // stage stops at 1 with only the view's timestamp recorded
      (2L, 10L, 5L, "click"), (2L, 11L, 6L, "view"),
      // user 3: nothing matches
      (3L, 10L, 7L, "signup")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.stagesTimed(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Int, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((3, Seq(10L, 12L, 15L))),
      2L -> ((1, Seq(11L))),
      3L -> ((0, Seq.empty[Long]))))
  }
}
