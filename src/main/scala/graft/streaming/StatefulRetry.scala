package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2/T3 retry accounting as EXPLICIT streaming state: the reference
  * mutates a `failed_attempts` field on the queued document and
  * re-enqueues it (/root/reference/PodioApiGateway.py:153-159); here
  * the counter lives in `flatMapGroupsWithState` keyed state instead,
  * so the queue itself stays immutable and replayable.
  *
  * This is the engine's `KeyValueGroupedDataset` custom-state escape
  * hatch (SURVEY.md §2.7): used only where column-level streaming ops
  * (`dropDuplicatesWithinWatermark`, windowed aggs) cannot express the
  * semantics — a monotone per-key counter with reset-on-success is
  * exactly that case.
  *
  * Scale: state is one int per key with a NON-ZERO counter — a
  * success REMOVES the key's state (the reference deletes the queue
  * doc on success, PodioApiGateway.py:143-145), so state size tracks
  * in-flight failures, not every key ever seen; without the remove,
  * the store would grow monotonically for the stream's lifetime.
  * Ordering: attempts are time-sorted WITHIN a micro-batch; across
  * batches they fold in arrival order, mirroring the reference's
  * queue processing (a counter keyed on arrival, not event time — a
  * late-arriving old failure counts as a new failure).
  */
object StatefulRetry {

  /** One processing attempt for a queued item. */
  case class Attempt(item_id: Long, ts: Timestamp, ok: Boolean)

  /** Per-key state: consecutive-failure count. */
  case class RetryState(failures: Int)

  /** Emitted on every attempt: the running failure count and whether
    * the item just crossed the dead-letter threshold.
    */
  case class Verdict(item_id: Long, ts: Timestamp, failures: Int,
      dead: Boolean)

  /** Fold attempts into per-key failure counts; success resets the
    * counter (the reference re-enqueues with a fresh timestamp, so a
    * later success clears the item from the queue entirely —
    * PodioApiGateway.py:143-145).
    */
  def track(attempts: Dataset[Attempt], limit: Int = 10)
      : Dataset[Verdict] = {
    import attempts.sparkSession.implicits._
    attempts.groupByKey(_.item_id)
      .flatMapGroupsWithState[RetryState, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Attempt], state: GroupState[RetryState]) =>
          var st = state.getOption.getOrElse(RetryState(0))
          // getTime truncates to millis; getNanos breaks the tie so
          // micro-spaced attempts fold deterministically, not in
          // shuffle arrival order
          val out = rows.toSeq.sortBy(a => (a.ts.getTime, a.ts.getNanos))
            .map { a =>
            st = if (a.ok) RetryState(0) else RetryState(st.failures + 1)
            Verdict(id, a.ts, st.failures, dead = st.failures >= limit)
          }
          // a settled key (last attempt succeeded) carries no state:
          // keeping RetryState(0) forever would grow the store by one
          // entry per key EVER seen instead of per key in flight
          if (st.failures == 0) state.remove() else state.update(st)
          out.iterator
      }
  }
}
