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

  test("intervalJoin equals the nested-loop overlap join: edge-touching " +
      "pairs included, bucket-spanning intervals once, malformed dropped") {
    val left = Seq(
      (1L, 0L, 10L),     // overlaps r10 (touch at 10), r11
      (2L, 95L, 205L),   // spans 3 buckets at width 100; overlaps r12
      (3L, 500L, 400L),  // malformed: end < start — must vanish
      (4L, 300L, 301L))  // tiny; overlaps nothing
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 10L, 20L),   // touches l1 at exactly 10
      (11L, 5L, 7L),     // inside l1
      (12L, 200L, 210L), // touches l2 at 200..205
      (13L, 600L, 650L)) // overlaps only the malformed l3's reversal
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalJoin(left, col("ls"), col("le"),
      right, col("rs"), col("re"), bucketWidth = 100.0)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "canonical bucket must dedup")
    val brute = left.filter(col("le") >= col("ls")).crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === brute)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("intervalJoin property: random intervals at several bucket " +
      "widths always equal the brute-force overlap join") {
    val rnd = new scala.util.Random(20260813L)
    val left = (1L to 120L).map { id =>
      val s = rnd.nextInt(1000).toLong
      (id, s, s + rnd.nextInt(80))
    }.toDF("lid", "ls", "le")
    val right = (1000L to 1100L).map { id =>
      val s = rnd.nextInt(1000).toLong
      (id, s, s + rnd.nextInt(80))
    }.toDF("rid", "rs", "re")
    val brute = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    // widths far below, near, and far above the interval lengths —
    // replication factor and bucket occupancy differ wildly; results
    // must not
    for (w <- Seq(7.0, 80.0, 500.0)) {
      val got = RangeJoin.intervalJoin(left, col("ls"), col("le"),
        right, col("rs"), col("re"), w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"dupes at width $w")
      assert(got.toSet === brute, s"mismatch at width $w")
    }
  }

  test("intervalJoin on testdata matches the quadratic overlap join " +
      "(the q68 configuration)") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.Tables.events(spark, dir)
    def win(t: String, p: String) = ev
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"),
        unix_micros(col("ts")).as(s"${p}_s"),
        (unix_micros(col("ts"))
          + floor(col("value")).cast("long") * 1000000L).as(s"${p}_e"))
    val bucketed = RangeJoin.intervalJoin(
      win("signup", "i"), col("i_s"), col("i_e"),
      win("purchase", "j"), col("j_s"), col("j_e"), 600e6)
      .select("i_id", "j_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = win("signup", "i").crossJoin(win("purchase", "j"))
      .filter(col("i_s") <= col("j_e") && col("j_s") <= col("i_e"))
      .select("i_id", "j_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === brute)
    assert(bucketed.nonEmpty)
  }
}
