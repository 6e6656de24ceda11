package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Registry-wide output-hygiene guards.
  *
  * Round-5's only red driver row (q66) was caused by the registry's
  * single UNROUNDED double column in an oracle-gated query: the
  * full-precision hash compare then surfaces whatever one-ulp
  * difference the oracle engine's build produces in a
  * decimal→double cast or division. The rule that kills the bug
  * class: every float/double column of every hash-gated query must
  * be decimal-rounded (we assert round(v, 6) == v for all rows —
  * true for anything that passed through round(_, ≤6), false for a
  * raw division/cast result). Rows-only entries (no oracleSql) are
  * exempt by construction — they are never hashed.
  */
class RegistryGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("no oracle-gated query emits an unrounded float/double column") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val floatCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType =>
          f.name
      }
      if (floatCols.isEmpty) Nil // schema check only — skip execution
      else {
        // one aggregate per query: count rows where any float col is
        // not fixed by round(_, 6) (<=> makes NaN/null self-equal)
        val bad = df.select(floatCols.map(c =>
          count(when(!(col(c) <=> round(col(c), 6)), 1))
            .as(c)): _*).head()
        floatCols.zipWithIndex.collect {
          case (c, i) if bad.getLong(i) > 0 => s"$name.$c"
        }
      }
    }
    assert(offenders.isEmpty,
      s"unrounded double in hash-gated output: ${offenders.mkString(", ")}")
  }
}
