package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandJoin equals the nested-loop band join, including negative " +
      "values and bucket-boundary pairs") {
    // values straddle bucket edges (±width multiples) and zero
    val left = Seq((1L, -10.0), (2L, -4.9), (3L, 0.0), (4L, 4.99),
      (5L, 5.0), (6L, 12.3)).toDF("lid", "lv")
    val right = Seq((10L, -10.0), (11L, -5.0), (12L, -0.01), (13L, 5.0),
      (14L, 9.99), (15L, 17.2)).toDF("rid", "rv")
    val banded = RangeJoin.bandJoin(left, col("lv"), right, col("rv"), 5.0)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = left.crossJoin(right)
      .filter(abs(col("lv") - col("rv")) < 5.0)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
    // |a-b| == width is excluded (strict inequality): 3 vs 13
    assert(!banded.contains((3L, 13L)))
    // each qualifying pair appears exactly once (no bucket duplicates)
    val all = RangeJoin.bandJoin(left, col("lv"), right, col("rv"), 5.0)
      .select("lid", "rid").collect()
    assert(all.length === all.toSet.size)
  }

  test("bandJoin on testdata matches the broadcast nested-loop q12 plan") {
    // sf0.01: the band is empty at sf0.001 (too few parts near the
    // 900±5 price offset), which would vacuously pass the equality
    val dir = "/root/testdata/sf0.01"
    val part = graft.Tables.part(spark, dir)
    val supp = graft.Tables.supplier(spark, dir)
    val banded = RangeJoin.bandJoin(part,
      col("p_retailprice") - lit(900.0), supp, col("s_acctbal") % 100, 5.0)
      .select("p_partkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = part.crossJoin(supp)
      .filter(abs((col("p_retailprice") - lit(900.0))
        - (col("s_acctbal") % 100)) < 5)
      .select("p_partkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty)
  }
}
