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

  /** Streaming late-data observability: the T8 watermark silently
    * discards rows that arrive after the bound, and NOTHING in the
    * pipeline surfaced how many — the data-loss audit a production
    * CDC feed needs (the reference has no answer either: its gateway
    * enqueues whatever arrives, PodioApiGateway.py:124, so late
    * updates are silently absorbed or lost downstream). A
    * [[StreamTelemetry]] listener accumulates, per query name, the
    * input-row count and the state stores' `numRowsDroppedByWatermark`
    * — the engine's own authoritative drop counter, summed across
    * stateful operators, with no second scan and no per-row cost.
    *
    * Listener delivery is asynchronous (Spark's listener bus), so
    * readings lag `processAllAvailable` by design — poll, don't
    * assert-immediately (see CdcPipelineSpec).
    */
  final class StreamTelemetry
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val input =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private val late =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val add: java.util.function.BiFunction[java.lang.Long,
        java.lang.Long, java.lang.Long] = (a, b) => a + b
      input.merge(name, Long.box(p.numInputRows), add)
      late.merge(name,
        Long.box(p.stateOperators.map(_.numRowsDroppedByWatermark).sum),
        add)
    }

    /** Total input rows seen by `queryName` so far. */
    def inputRows(queryName: String): Long =
      Option(input.get(queryName)).fold(0L)(_.longValue)

    /** Total rows the watermark discarded in `queryName` so far. */
    def lateDropped(queryName: String): Long =
      Option(late.get(queryName)).fold(0L)(_.longValue)
  }

  /** Register a [[StreamTelemetry]] on the session's stream manager
    * and return it (caller detaches with `removeListener` if needed).
    */
  def attachStreamTelemetry(
      spark: org.apache.spark.sql.SparkSession): StreamTelemetry = {
    val t = new StreamTelemetry
    spark.streams.addListener(t)
    t
  }
}
