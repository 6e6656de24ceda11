package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a
  * pipeline runs before publishing a table (the pattern Deequ/Great
  * Expectations established). The reference validates records one at a
  * time inside its cleaner (clean_item's per-field type dispatch,
  * PodioApiWrapper.py:138); at 100 TB validation must instead be a
  * TABLE-level property computed in bulk: every check here compiles to
  * an aggregate expression and the whole suite evaluates in ONE
  * aggregation pass over the data (one scan, one partial+final agg —
  * adding a check adds a column, not a pass). Uniqueness is the one
  * exception that needs a distinct shuffle; it still shares the scan.
  *
  * `run` returns a row per check: (check_name, col_name, observed,
  * threshold, passed) — observed is the measured ratio/value, so a
  * failing gate
  * reports HOW failing, not just a boolean.
  */
object Expectations {

  sealed trait Check

  /** Fraction of non-null values in `column` must be >= `atLeast`. */
  final case class Completeness(column: String, atLeast: Double)
    extends Check

  /** Distinct ratio of the (possibly composite) key must be >=
    * `atLeast` (1.0 = exact primary-key uniqueness). */
  final case class Uniqueness(columns: Seq[String], atLeast: Double)
    extends Check

  /** Every non-null value must lie in [lo, hi]; observed is the
    * in-range fraction, and the check passes when it is 1. */
  final case class Between(column: String, lo: Double, hi: Double)
    extends Check

  /** Fraction of non-null values matching the anchored regex must be
    * >= `atLeast`. */
  final case class PatternRatio(column: String, regex: String,
    atLeast: Double) extends Check

  /** Fraction of non-null values in the allowed set must be >=
    * `atLeast`. */
  final case class InSet(column: String, allowed: Seq[String],
    atLeast: Double) extends Check

  /** Table row count must lie in [atLeast, atMost]. */
  final case class RowCount(atLeast: Long, atMost: Long) extends Check

  private case class Compiled(check: String, column: String,
    observed: Column, threshold: Double)

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den).otherwise(lit(1.0))

  private def compile(c: Check): Compiled = c match {
    case Completeness(col0, atLeast) => Compiled("completeness", col0,
      ratio(count(col(col0)), count(lit(1))), atLeast)
    case Uniqueness(cols, atLeast) => Compiled("uniqueness",
      cols.mkString(","),
      ratio(countDistinct(struct(cols.map(col): _*)), count(lit(1))),
      atLeast)
    case Between(col0, lo, hi) => Compiled("between", col0,
      ratio(count(when(col(col0).between(lo, hi), 1)),
        count(col(col0))), 1.0)
    case PatternRatio(col0, re, atLeast) => Compiled("pattern", col0,
      ratio(count(when(regexp_like(col(col0), lit(re)), 1)),
        count(col(col0))), atLeast)
    case InSet(col0, allowed, atLeast) => Compiled("in_set", col0,
      ratio(count(when(col(col0).isin(allowed: _*), 1)),
        count(col(col0))), atLeast)
    case RowCount(atLeast, atMost) => Compiled("row_count", "*",
      count(lit(1)).cast("double"), atLeast.toDouble)
  }

  /** Evaluate the suite in one aggregation pass; one report row per
    * check, in the caller's check order (check_idx makes the order a
    * column, so the report is self-describing under any re-sort).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val compiled = checks.map(compile)
    val aggs = compiled.zipWithIndex.map { case (cc, i) =>
      cc.observed.as(s"_obs$i")
    }
    val report = compiled.zipWithIndex.map { case (cc, i) =>
      val obs = col(s"_obs$i")
      val passed = checks(i) match {
        case RowCount(atLeast, atMost) =>
          obs >= atLeast.toDouble && obs <= atMost.toDouble
        case _ => obs >= cc.threshold
      }
      struct(lit(i).as("check_idx"), lit(cc.check).as("check_name"),
        lit(cc.column).as("col_name"), round(obs, 6).as("observed"),
        lit(cc.threshold).as("threshold"), passed.as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(report: _*)).as("r"))
      .select(col("r.*"))
  }
}
