package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Conversion-funnel analysis: the furthest step of an ORDERED step
  * sequence each key reached — the longest prefix of `steps` that is
  * a subsequence of the key's time-ordered events (classic product-
  * analytics semantics: a purchase only counts if a view and a click
  * happened before it, in that order).
  *
  * Shape: one shuffle (the per-key groupBy), then a map-side fold over
  * the collected, sorted event array with `aggregate` — a greedy
  * subsequence match, which is maximal (greedy earliest-match finds a
  * prefix subsequence iff one exists), all Column expressions inside
  * whole-stage codegen, no UDF. Per-key event counts are bounded by
  * the key's own activity, the same memory envelope as any
  * collect_list sessionization; for keys with unbounded histories,
  * pre-filter to the analysis window first.
  */
object Funnel {

  /** One row per key: `stage` = how many of `steps` were completed in
    * order (0 to steps.length).
    *
    * @param tiebreak total-orders simultaneous events so the fold is
    *                 deterministic under shuffle (unique id column)
    */
  def stages(events: DataFrame, key: String, ts: String,
      tiebreak: String, eventCol: String, steps: Seq[String])
      : DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepArr = array(steps.map(lit): _*)
    events.groupBy(col(key))
      .agg(array_sort(collect_list(struct(
        col(ts).as("t"), col(tiebreak).as("tb"),
        col(eventCol).as("e")))).as("_evs"))
      // try_element_at: 1-based, null past the end — so a finished
      // funnel (st = steps.length) never advances and never throws
      // under ANSI, and the null comparison folds to "no match"
      .withColumn("stage",
        aggregate(col("_evs"), lit(0), (st, ev) =>
          when(ev.getField("e") === try_element_at(stepArr, st + 1),
            st + 1).otherwise(st)))
      .drop("_evs")
  }

  /** [[stages]] plus WHEN each stage was reached: `stage_ts(i)` is the
    * timestamp of the event the greedy match consumed for step i+1 —
    * i.e. the EARLIEST completion time of that step given the prior
    * steps, which is what time-to-convert means in product analytics.
    * Same single-shuffle fold; the accumulator widens from an int to
    * a (stage, timestamps) struct, still pure Column expressions.
    */
  def stagesTimed(events: DataFrame, key: String, ts: String,
      tiebreak: String, eventCol: String, steps: Seq[String])
      : DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepArr = array(steps.map(lit): _*)
    val tsType = events.schema(events.schema.fieldIndex(ts)).dataType
    // zero and merge-result struct types must agree exactly for the
    // higher-order aggregate to typecheck, hence the explicit cast
    val zero = struct(lit(0).as("st"),
      array().cast(ArrayType(tsType)).as("times"))
    events.groupBy(col(key))
      .agg(array_sort(collect_list(struct(
        col(ts).as("t"), col(tiebreak).as("tb"),
        col(eventCol).as("e")))).as("_evs"))
      .withColumn("_acc",
        aggregate(col("_evs"), zero, (acc, ev) =>
          when(ev.getField("e") ===
              try_element_at(stepArr, acc.getField("st") + 1),
            struct((acc.getField("st") + 1).as("st"),
              array_append(acc.getField("times"), ev.getField("t"))
                .as("times")))
          .otherwise(acc)))
      .select(col(key), col("_acc.st").as("stage"),
        col("_acc.times").as("stage_ts"))
  }
}
