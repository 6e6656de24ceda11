package graft.meta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** A1 telemetry: the reference mutates `api_count`/`data_size`
  * counters on every call (/root/reference/PodioApiWrapper.py:17-18,
  * 40-42). The Spark-native form is `Dataset.observe` — named
  * aggregates accumulated DURING the action, no second scan, retrieved
  * from the query execution afterwards (or via a QueryExecutionListener
  * / StreamingQueryListener in a live pipeline).
  */
object Telemetry {

  /** Attach row/byte counters to a frame under `name` (octet length —
    * `length` on a string counts characters, not bytes).
    */
  def observed(df: DataFrame, name: String, payloadCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(length(col(payloadCol).cast("binary"))).as("n_bytes"))

  /** Read back the metrics row for `name`, populated only after an
    * action that executed THIS Dataset's own QueryExecution —
    * `df.collect()` or `df.write...`. Derived actions build a NEW
    * QueryExecution and leave this empty: `df.count()` re-plans as an
    * aggregate and `df.foreach`/`df.rdd` go through a separate
    * rddQueryExecution, so `metrics(df, ...)` after either returns
    * None. For metrics that must survive arbitrary downstream
    * plans (or streaming), register a QueryExecutionListener /
    * StreamingQueryListener keyed on the observation name — the
    * listener receives every execution, regardless of which Dataset
    * object triggered it.
    */
  def metrics(df: DataFrame, name: String): Option[Row] =
    df.queryExecution.observedMetrics.get(name)
}
