package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over a LIVE event stream — the streaming
  * complement of operators.Sessionize (q65): that one labels a bounded
  * table's events after the fact; this one closes sessions continuously
  * as the event-time watermark advances, the per-queue burst grouping
  * the reference's consumers do on live webhook traffic
  * (/root/reference/PodioApiGateway.py:195).
  *
  * Semantics under out-of-order arrival: per key, state holds OPEN
  * SESSION FRAGMENTS — disjoint [start, end] extents more than
  * `gapSeconds` apart. A new event either extends/merges fragments
  * (events only ever merge sessions, never split them) or opens a new
  * fragment; a fragment is emitted as a closed session exactly when
  * the watermark passes `end + gap`, because any event that could
  * still extend it (ts ≤ end + gap) would now be behind the watermark
  * and dropped at the source. Flushing happens on data arrival AND via
  * an event-time timeout, so a key whose traffic stops still closes
  * its last session once OTHER keys' events advance the watermark —
  * no per-key poison pill required.
  *
  * Scale: state per key is the open-fragment list — bounded by the
  * number of concurrent gaps inside one watermark horizon, not by
  * event count (fragments store only extent + aggregates, never
  * events). The groupByKey hash-shuffles once; everything downstream
  * is per-key local. This is the mapGroupsWithState case the built-in
  * `session_window` aggregation (q37) cannot express: it emits LABELED
  * aggregates with custom merge logic and deterministic close order,
  * not just a collapsed window row.
  */
object StreamingSessionize {

  case class SEvent(user_id: Long, ts: Timestamp, value: Double)

  /** An open-session fragment: extent plus running aggregates. */
  case class Frag(startMs: Long, endMs: Long, n: Long, valueSum: Double)

  case class SessState(frags: List[Frag])

  /** A closed session, emitted exactly once. */
  case class Closed(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, value_sum: Double)

  /** Merge sorted-by-start fragments whose gap (floor-second, matching
    * the batch operator's unix_timestamp contract) is ≤ gapSeconds.
    */
  private[streaming] def coalesce(frags: List[Frag], gapSeconds: Long)
      : List[Frag] =
    frags.sortBy(f => (f.startMs, f.endMs)).foldLeft(List.empty[Frag]) {
      case (acc, f) => acc match {
        case h :: t if f.startMs / 1000 - h.endMs / 1000 <= gapSeconds =>
          Frag(h.startMs, math.max(h.endMs, f.endMs), h.n + f.n,
            h.valueSum + f.valueSum) :: t
        case _ => f :: acc
      }
    }.reverse

  /** @param watermarkDelay e.g. "10 minutes": bound on out-of-order
    *                       arrival; later events are dropped, which is
    *                       exactly what makes fragment close safe
    */
  def sessions(events: Dataset[SEvent], gapSeconds: Long,
      watermarkDelay: String): Dataset[Closed] = {
    require(gapSeconds > 0, "session gap must be positive")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Closed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id: Long, rows: Iterator[SEvent], state: GroupState[SessState]) =>
          val arrived = rows.map(e =>
            Frag(e.ts.getTime, e.ts.getTime, 1L, e.value)).toList
          val merged = coalesce(
            state.getOption.map(_.frags).getOrElse(Nil) ::: arrived,
            gapSeconds)
          // close what the watermark proves complete; watermark is 0
          // until the first micro-batch ends, which only delays closes
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) =
            merged.partition(f => f.endMs / 1000 + gapSeconds < wm / 1000)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessState(open))
            // wake when the earliest open fragment becomes closable;
            // max(wm+1s) keeps the timestamp legal if that instant is
            // already behind the watermark
            val due = (open.map(_.endMs).min / 1000 + gapSeconds + 1) * 1000
            state.setTimeoutTimestamp(math.max(due, wm + 1000))
          }
          closed.sortBy(_.startMs).map(f =>
            Closed(id, new Timestamp(f.startMs), new Timestamp(f.endMs),
              f.n, f.valueSum)).iterator
      }
  }
}
