package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key PARTIAL state
  * (sum/count/min/max components) that a delta batch can be merged
  * into without rescanning history — the materialized-view pattern.
  * The reference recomputes its reporting aggregates on every sync
  * cycle (a full re-extract per PodioApiWrapper.py:109 page loop); at
  * 100 TB the history scan is the whole cost, and this state makes an
  * update proportional to the DELTA: `partial(batch)` is one small
  * aggregation, `merge` is an aggregation over (stored state ∪ that),
  * both key-hash shuffles of already-aggregated rows.
  *
  * Algebra: every component is associative + commutative (sum of
  * sums, sum of counts, min of mins, max of maxes), so any merge tree
  * over any batch split yields the same state as one aggregation of
  * the full input — merge(partial(A), partial(B)) == partial(A ∪ B)
  * exactly (use decimal values if float-addition associativity
  * matters; see q66's oracle). AVG is NOT stored — it is not
  * mergeable — and is derived at read time in [[finish]].
  */
object IncrementalAgg {

  /** Aggregate a batch into mergeable per-key partial state. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      sum(col(valueCol)).as("agg_sum"),
      count(col(valueCol)).as("agg_cnt"),
      min(col(valueCol)).as("agg_min"),
      max(col(valueCol)).as("agg_max"))

  /** Merge partial states — union + re-aggregate, the associative
    * form that extends to any number of deltas with no join. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    val keys = states.head.columns
      .filterNot(Set("agg_sum", "agg_cnt", "agg_min", "agg_max"))
    states.reduce(_.unionByName(_)).groupBy(keys.map(col): _*).agg(
      sum(col("agg_sum")).as("agg_sum"),
      sum(col("agg_cnt")).as("agg_cnt"),
      min(col("agg_min")).as("agg_min"),
      max(col("agg_max")).as("agg_max"))
  }

  /** Derive the non-mergeable read-time aggregates (avg). A group
    * whose count is 0 (all-null values) yields a null avg, matching
    * what a direct AVG over the raw rows returns. */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("agg_avg",
      when(col("agg_cnt") > 0,
        col("agg_sum").cast("double") / col("agg_cnt")))

  /** COUNT DISTINCT is the one reporting aggregate with NO exact
    * mergeable partial state (a distinct set is as big as the data),
    * so the incremental path stores a DataSketches HLL sketch per key
    * instead: fixed bytes per key, and sketch union is associative +
    * commutative, so `distinctMerge(distinctPartial(A),
    * distinctPartial(B))` estimates A ∪ B without rescanning history —
    * the same algebra as [[partial]]/[[merge]], traded from exact to
    * ±~1.6% (lgK=12) standard error.
    */
  def distinctPartial(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("agg_hll"))

  /** Merge sketch states — union + re-union-aggregate, any merge tree
    * over any batch split yields the same estimates. */
  def distinctMerge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    val keys = states.head.columns.filterNot(_ == "agg_hll")
    states.reduce(_.unionByName(_)).groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("agg_hll")).as("agg_hll"))
  }

  /** Read-time estimate from the stored sketch. */
  def distinctFinish(state: DataFrame): DataFrame =
    state.withColumn("est_distinct",
      hll_sketch_estimate(col("agg_hll")))
}
