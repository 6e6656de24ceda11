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

  /** Read back the metrics row recorded by the LAST action on `df`. */
  def metrics(df: DataFrame, name: String): Option[Row] =
    df.queryExecution.observedMetrics.get(name)
}
