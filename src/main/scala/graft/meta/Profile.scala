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
    require(cols.distinct.size == cols.size,
      s"duplicate columns in ${cols.mkString(", ")}")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    // internal aliases are INDEXED, and input references go through
    // backtick quoting — a profiler exists for arbitrary (legacy,
    // messy) schemas, so column names containing quotes, dots, or
    // backticks must not be interpolated into parsed SQL text
    def in(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(in(c)).as(s"_c${i}_nn"),
        countDistinct(in(c)).as(s"_c${i}_nd"),
        min(in(c)).cast("string").as(s"_c${i}_mn"),
        max(in(c)).cast("string").as(s"_c${i}_mx"))
    }
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val entries = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"),
        col(s"_c${i}_nn").as("n_nonnull"),
        col(s"_c${i}_nd").as("n_distinct"),
        col(s"_c${i}_mn").as("min_str"),
        col(s"_c${i}_mx").as("max_str"))
    }: _*)
    wide.select(col("_total"), explode(entries).as("e"))
      .select(col("e.column_name"), col("_total").as("n_rows"),
        col("e.n_nonnull").as("n_nonnull"),
        (col("_total") - col("e.n_nonnull")).as("n_nulls"),
        col("e.n_distinct").as("n_distinct"),
        col("e.min_str").as("min_str"), col("e.max_str").as("max_str"))
  }
}
