package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-integrity audit the reference's whole
  * migration exists to fix (README.md:3-8: the legacy pipeline held
  * "85% data integrity"; you cannot manage what you do not measure).
  * One row per profiled column: row/non-null/distinct counts and
  * min/max rendered as strings so heterogeneous columns stack into
  * one frame.
  *
  * Shape: ONE aggregate pass computes every column's stats as a single
  * wide row (4 aggregates per column — Catalyst evaluates them in one
  * partial+final hash-agg over one scan), then `stack` unpivots to the
  * per-column layout. At 100 TB this is one full scan total, not one
  * per column; countDistinct rewrites to expand+agg, and the heavy
  * exact-distinct can be swapped for approx_count_distinct when a
  * bounded error is acceptable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr("__total",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nonnull, n_distinct, min_str, max_str)")
      .select(col("column_name"), col("__total").as("n_rows"),
        col("n_nonnull"),
        (col("__total") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
