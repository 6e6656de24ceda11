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

  test("decimal-derived averages are emitted as DECIMAL, not DOUBLE") {
    // r6 proved the stronger rule: even a ROUNDED double hash-diverges
    // across oracle-engine builds (their round()/cast differ by an
    // ulp), while a decimal hashes its exact unscaled integer. Any
    // avg/ratio column derived from decimal arithmetic in a hash-gated
    // query must therefore surface as DecimalType. The q66d2/q87d2
    // entries are the EXPLICIT driver-bisect diagnostics for the double
    // class and are exempt until the bisect concludes.
    val exempt = Set("q66d2_avg_double", "q87d2_avg_double")
    for (name <- Seq("q66_incremental_agg", "q87_incremental_mv")) {
      val f = SparkEntry.queries(name)(spark, dir)
        .schema.fields.find(_.name == "agg_avg").get
      assert(f.dataType.isInstanceOf[
          org.apache.spark.sql.types.DecimalType],
        s"$name.agg_avg must be DecimalType, was ${f.dataType}")
    }
    // q81's columns are all exact types by construction — keep it so
    val q81Floats = SparkEntry.queries("q81_rfm")(spark, dir)
      .schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType =>
          f.name
      }
    assert(q81Floats.isEmpty,
      s"q81_rfm must emit only exact types, found float cols: " +
        q81Floats.mkString(", "))
    assert(exempt.subsetOf(SparkEntry.oracleSql.keySet),
      "bisect diagnostics should stay registered until driver-green")
  }

  test("README registry counts match SparkEntry (no doc drift)") {
    // r6 verdict found README=158 vs registry=157: hand-maintained
    // counts drift. Parse the documented "N named queries, M with
    // DuckDB oracle SQL" out of README.md and pin them to the real
    // registry sizes so the docs cannot lie again.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """(\d+) named queries, (\d+) with DuckDB oracle SQL""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md no longer states the registry counts"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} queries, registry has " +
        s"${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-gated, registry has " +
        s"${SparkEntry.oracleSql.size}")
  }
}
