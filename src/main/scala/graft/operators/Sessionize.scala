package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign each event the ordinal of the
  * session it belongs to, where a new session starts when the gap
  * since the key's previous event exceeds `gapSeconds`. The batch
  * complement of the streaming `session_window` aggregation (q37):
  * that one collapses a session to one row, this one LABELS every
  * event so downstream joins can attribute activity to sessions —
  * the reference's event-queue consumers group work the same way
  * (PodioApiGateway.py:195 polls per-queue bursts).
  *
  * Shape: ONE shuffle — both window passes (the lag mark and the
  * running sum) share the same partitioning and ordering, so Catalyst
  * plans a single Exchange + Sort with two stacked Window operators.
  * At 100 TB this is the minimum possible: sessionization is
  * inherently a per-key ordered scan; the key-hash shuffle is the
  * only data movement, and a key-bucketed layout (sources.Layout)
  * eliminates even that.
  *
  * Gap semantics: the gap compares floor-epoch seconds (the
  * `unix_timestamp` contract), so sub-second jitter inside the same
  * second never splits a session.
  */
object Sessionize {

  /** @param tiebreak total-orders simultaneous events (unique id) so
    *                 assignment is deterministic under shuffle */
  def assign(events: DataFrame, key: String, ts: String, tiebreak: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "session gap must be positive")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val prev = lag(col(ts), 1).over(w)
    // first event of a key (lag null) always opens session 1; a null
    // gap from a null ts would otherwise leak a null session_n
    val opens = when(prev.isNull ||
      (unix_timestamp(col(ts)) - unix_timestamp(prev)) > gapSeconds,
      lit(1)).otherwise(lit(0))
    events
      .withColumn("_graft_open", opens)
      .withColumn("session_n", sum(col("_graft_open"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_open")
  }
}
