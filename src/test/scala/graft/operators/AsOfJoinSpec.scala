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
