package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantics of the union+window as-of join: inclusive ≤ match, per-key
  * isolation, null for no-prior-row, deterministic tiebreaks.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def right = Seq(
    (1L, 10L, 100L), // key 1: events at t=10, 20
    (1L, 20L, 101L),
    (2L, 15L, 200L), // key 2: one event
    (1L, 20L, 102L)  // tie on (key=1, t=20) — higher id must win
  ).toDF("k", "t", "event_id")

  private def left = Seq(
    (1L, 5L, "before-any"),
    (1L, 10L, "at-first"),
    (1L, 25L, "after-all"),
    (2L, 15L, "exact"),
    (3L, 99L, "no-right-key")
  ).toDF("k", "t", "tag")

  private def run() =
    AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id")
      .select("tag", "asof_event_id").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("backward as-of: inclusive match, ties by max tiebreak, " +
      "null when nothing precedes") {
    val m = run()
    assert(m("before-any") === None)          // no event at or before t=5
    assert(m("at-first") === Some(100L))      // inclusive: event AT t=10
    assert(m("after-all") === Some(102L))     // t=20 tie → max event_id
    assert(m("exact") === Some(200L))         // other key unaffected
    assert(m("no-right-key") === None)        // key absent from right
  }

  test("null right times/keys never match, and a null left time " +
      "yields a null payload in both directions") {
    val r = Seq(
      (Option(1L), Option(5L), 500L),
      (Option(1L), Option.empty[Long], 501L), // null time: would sort first
      (Option.empty[Long], Option(3L), 502L)  // null key
    ).toDF("k", "t", "event_id")
    val l = Seq(
      (Option(1L), Option(4L), "pre"),        // before the only real right row
      (Option(1L), Option(10L), "post"),      // after it
      (Option(1L), Option.empty[Long], "null-time"),
      (Option.empty[Long], Option(3L), "null-key")
    ).toDF("k", "t", "tag")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "asof_event_id").collect()
        .map(x => x.getString(0) ->
          (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val back = collect(AsOfJoin.asofBackward(l, r, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id"))
    // the null-time right row must NOT act as an always-match floor
    assert(back("pre") === None)
    assert(back("post") === Some(500L))
    assert(back("null-time") === None)
    assert(back("null-key") === None)
    val fwd = collect(AsOfJoin.asofForward(l, r, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id"))
    assert(fwd("pre") === Some(500L))
    assert(fwd("post") === None)
    // previously the null-time left row sorted first and took the
    // earliest right row's payload
    assert(fwd("null-time") === None)
    assert(fwd("null-key") === None)
  }

  test("reserved and colliding payload names are rejected up front") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
        payload = Seq("event_id", "asof_event_id"), tiebreak = "event_id")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
        payload = Seq("_rt"), tiebreak = "event_id")
    }
  }

  test("forward as-of: nearest following row, inclusive ≥, ties by " +
      "MIN tiebreak, null when nothing follows") {
    val m = AsOfJoin.asofForward(left, right, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id")
      .select("tag", "asof_event_id").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m("before-any") === Some(100L))    // nearest following is t=10
    assert(m("at-first") === Some(100L))      // inclusive: event AT t=10
    assert(m("after-all") === None)           // nothing after t=25
    assert(m("exact") === Some(200L))
    assert(m("no-right-key") === None)
  }

  test("tolerance bounds the match distance in both directions " +
      "(inclusive at the bound)") {
    def back(tol: String) =
      AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
        payload = Seq("event_id"), tiebreak = "event_id",
        tolerance = Some(tol))
        .select("tag", "asof_event_id").collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // "after-all" (t=25) matches t=20, distance 5
    assert(back("5")("after-all") === Some(102L))
    assert(back("4")("after-all") === None)
    assert(back("4")("at-first") === Some(100L)) // distance 0 unaffected
    val fwd = AsOfJoin.asofForward(left, right, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id",
      tolerance = Some("4"))
      .select("tag", "asof_event_id").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(fwd("before-any") === None)        // t=5 → t=10 is distance 5 > 4
    assert(fwd("at-first") === Some(100L))
  }

  test("left row count and columns are preserved") {
    val out = AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
      payload = Seq("event_id"), tiebreak = "event_id")
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "t", "tag", "asof_event_id"))
  }
}
