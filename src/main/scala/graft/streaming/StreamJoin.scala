package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream enrichment join.
  *
  * The reference's event/item duality (PodioApiGateway.py:124: the
  * webhook event stream is enriched against item state that is itself
  * produced by a change feed) is, in Spark terms, a STREAM-STREAM
  * join: neither side is static, so the engine must buffer both sides
  * in state and needs a proof of when a buffered row can never match
  * again. That proof is the pair of watermarks plus the event-time
  * range condition below — Spark derives a state-eviction bound from
  * them, so executor state at 100 TB/day holds only the `lookback`
  * window of each side (plus watermark slack), not the whole history.
  *
  * Semantics: inner-join `events` rows to every `changes` row with the
  * same key whose timestamp falls in `[event_ts - lookback, event_ts]`
  * — "enrich each event with the item changes that could have caused
  * it". Append output mode; a result row is emitted as soon as both
  * inputs exist, and late rows past the watermark are dropped by the
  * state store, exactly as the batch interval join would have excluded
  * nothing (which is why the batch form of this same function — the
  * watermark node is a no-op under batch execution — is the oracle the
  * gate compares against).
  */
object StreamJoin {

  /** Join `events` (ts column `eventTs`) to `changes` (ts column
    * `changeTs`) on `key` with `changeTs` ∈ [eventTs − lookbackSec,
    * eventTs]. Column sets must be disjoint apart from `key`; the two
    * ts columns must be distinct names so both survive into the
    * output. Works identically on batch frames (watermarks eliminate)
    * — the correctness gate runs it that way against a plain SQL
    * interval join.
    *
    * `joinType` accepts "inner" (default) and "left_outer": the outer
    * form emits an event with null change columns once the watermark
    * PROVES no matching change can still arrive — the streaming
    * equivalent of "event with no recent item change", which an inner
    * join silently drops. The null-padded row is necessarily delayed
    * by the watermark bound (the engine cannot rule out a match
    * earlier); matched rows still emit immediately.
    */
  def enrich(events: DataFrame, changes: DataFrame, key: String,
      eventTs: String, changeTs: String, lookbackSec: Long,
      watermark: String, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"unsupported joinType $joinType (inner | left_outer)")
    require(eventTs != changeTs,
      "event and change timestamp columns must have distinct names")
    val overlap =
      (events.columns.toSet & changes.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across sides, found $overlap")
    require(!events.columns.contains("_ck") &&
      !changes.columns.contains("_ck"),
      "_ck is a reserved working name")
    require(lookbackSec >= 0, "lookback must be non-negative")
    val ev = events.withWatermark(eventTs, watermark)
    // key renamed on ONE side so the equi-join condition can name both
    // without ambiguity; dropped again after the join
    val ch = changes.withColumnRenamed(key, "_ck")
      .withWatermark(changeTs, watermark)
    ev.join(ch,
        col(key) === col("_ck") &&
          col(changeTs) >= col(eventTs) -
            expr(s"INTERVAL $lookbackSec SECONDS") &&
          col(changeTs) <= col(eventTs),
        joinType)
      .drop("_ck")
  }
}
