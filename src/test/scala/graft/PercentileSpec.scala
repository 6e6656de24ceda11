package graft

import org.apache.spark.sql.functions._

/** q39b's contract: approx_percentile (Greenwald-Khanna, accuracy
  * 10000) returns an OBSERVED value whose rank is within ε = 1/accuracy
  * of the requested quantile. Asserted against the exact sorted data
  * per group, with a +1 slack for the rank of a repeated value.
  */
class PercentileSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile rank error is within the GK bound vs exact") {
    val qs = Seq(("median_qty", "l_quantity", 0.5),
      ("p90_qty", "l_quantity", 0.9),
      ("q1_price", "l_extendedprice", 0.25))
    val approx = RelationalQueries.all("q39b_approx_percentile")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val li = Tables.lineitem(spark, dir)
    approx.foreach { case (flag, row) =>
      qs.foreach { case (alias, colName, q) =>
        val got = row.getAs[Double](alias)
        val vals = li.filter(col("l_returnflag") === flag)
          .select(col(colName).cast("double"))
          .collect().map(_.getDouble(0)).sorted
        val n = vals.length
        // rank window of the returned value among the exact data
        // (1e-6 tolerance: the query rounds to 4dp, the fixtures carry
        // 2dp money — rounding is a no-op but float repr isn't exact)
        val lo = vals.count(_ < got - 1e-6)
        val hi = vals.count(_ <= got + 1e-6)
        assert(hi > lo, s"$flag/$alias: approx value $got (rounded to " +
          "4dp) must be an observed value up to rounding")
        val target = q * n
        val eps = n / 10000.0 + 1 // GK bound + repeated-value slack
        assert(lo - eps <= target && target <= hi + eps,
          s"$flag/$alias: value $got covers ranks ($lo, $hi], target " +
            s"rank $target outside ±$eps")
      }
    }
  }

  test("q67b: winsorized mean from sketch bounds stays within 1% of " +
      "the exact-bounds mean, and the error column is self-reported") {
    val rows = RelationalQueries.all("q67b_winsorize_approx")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err >= 0 && err < 0.01,
        s"${r.getAs[String]("l_returnflag")}: rel_err $err out of bound")
    }
  }
}
