package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 gets an entry in `queries`,
  * and (where ANSI-SQL-expressible) a DuckDB oracle in `oracleSql`.
  * Column names are aliased identically on both sides; every compared
  * query ends in ORDER BY on a unique key; floating aggregates are
  * rounded (FIXTURES.md determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * "Current CRM snapshot" (SURVEY.md §7.2): events as the CDC feed →
    * filter to create/update (F2) → SCD2 latest-version window (W1) →
    * per-user current state + aggregate. Exercises S1-as-batch, F2, W1,
    * A5, O1 in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase", "view"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("ts").as("last_ts"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * north-star dedup/similarity/text/multimodal operators.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ MlQueries.all ++ StatsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MlQueries.oracles ++ StatsQueries.oracles

  /** Optional per-entry evidence probes the bench runs UNTIMED after
    * the timing loop and emits under `observed` in the full JSON line
    * — for operators whose scale mechanism is data-dependent enough
    * that a prose caveat should be a measured number instead (r9
    * verdict item 6). Each probe returns flat named counters.
    */
  def evidence: Map[String, (SparkSession, String) => Map[String, Long]] =
    Map("q82_basket" -> RelationalQueries.q82PruneEvidence)

  /** The declared correctness gate of every query NOT in [[oracleSql]]
    * — machine-readable so the bench JSON can carry a per-entry `gate`
    * field instead of leaving the oracle/rows-only split to be derived
    * from prose. Values:
    *  - `rows+recall`: genuinely approximate ANN (random planes,
    *    fitted k-means, PQ codebook) with the per-query recall emitted
    *    as a column of the result itself;
    *  - `rows+error`: sketch entries carrying in-result error evidence
    *    against their exact sibling;
    *  - `rows+spec`: iterative entries gated by a ScalaTest equality
    *    against an independent implementation;
    *  - `rows+bytes`: byte-level output pinned byte-exact in a spec
    *    (the size arithmetic is oracle-gated separately as ns21b,
    *    the decoded-dimension rule as ns21c).
    * RegistryGuardSpec asserts this map and oracleSql exactly
    * partition the registry — a new query must declare its gate or
    * carry an oracle, never silently neither.
    */
  def rowsOnlyGate: Map[String, String] = Map(
    "q19b_approx_distinct" -> "rows+error",
    "q39b_approx_percentile" -> "rows+error",
    "q67b_winsorize_approx" -> "rows+error",
    "q69_hll_incremental" -> "rows+error",
    "ns21_resize" -> "rows+bytes",
  )
}
