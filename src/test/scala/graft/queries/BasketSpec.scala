package graft.queries

import graft.{RelationalQueries, SparkSpec}
import org.apache.spark.sql.functions._

/** The A-priori item prune in [[RelationalQueries.basketLift]] on a
  * HIGH-CARDINALITY item column — the regime the bench fixture (25
  * brands, all clearing minSupport) structurally cannot exercise.
  * Two claims, proven separately:
  *  1. LOSSLESS: a pair cannot out-support its rarer member, so
  *     pruning sub-minSupport items before the pair join changes
  *     nothing — equality against an unpruned in-driver computation.
  *  2. BOUNDING: the pair join's fan-out drops from Σ C(n_i, 2) to
  *     Σ C(hot_i, 2) over orders — measured on a long-tail fixture
  *     where rare singleton items dominate every basket.
  */
class BasketSpec extends SparkSpec {

  import spark.implicits._

  // 200 orders; each holds 2 hot brands (pool of 4, every one far
  // above minSupport) + 3 rare brands unique to the order (600
  // singletons — the long tail). Deterministic, no Random.
  private val minSupport = 10L
  private lazy val rows: Seq[(Long, String)] =
    (1L to 200L).flatMap { ok =>
      val hot = Seq(s"hot${ok % 4}", s"hot${(ok + 1) % 4}")
      val rare = (0 until 3).map(i => s"rare_${ok}_$i")
      (hot ++ rare).map(b => (ok, b))
    }

  test("the item prune is lossless: pruned lift equals the unpruned " +
      "brute-force computation exactly") {
    val baskets = rows.toDF("ok", "brand")
    val got = RelationalQueries.basketLift(baskets, minSupport)
      .as[(String, String, Long, Double)].collect().toSeq
    // brute force WITHOUT the item prune: every in-order pair counted,
    // support filter applied only at the end
    val byOrder = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nOrders = byOrder.size.toLong
    val itemFreq = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val support = byOrder.values.toSeq
      .flatMap { bs =>
        for (a <- bs; b <- bs if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = support.toSeq
      .filter(_._2 >= minSupport)
      .map { case ((a, b), s) =>
        val lift = BigDecimal(
          s.toDouble * nOrders / (itemFreq(a) * itemFreq(b)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, s, lift)
      }
      .sortBy(x => (x._1, x._2))
    assert(got === expected && got.nonEmpty)
    // no rare brand can survive (singleton support), and the fixture
    // guarantees some hot pair does — the filter is doing real work
    assert(got.forall(r => r._1.startsWith("hot") && r._2.startsWith("hot")))
  }

  test("the item prune bounds the pair fan-out: candidate pairs drop " +
      "from sum C(n_i,2) to sum C(hot_i,2) on the long-tail fixture") {
    val baskets = rows.toDF("ok", "brand")
    val itemFreq = baskets.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_item"))
    val kept = baskets.join(
      itemFreq.filter(col("n_item") >= minSupport).select(col("brand")),
      Seq("brand"))
    def pairFanOut(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("ok")).agg(count(lit(1)).as("n"))
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
        .head().getLong(0)
    val unpruned = pairFanOut(baskets) // 200 * C(5,2) = 2000
    val pruned = pairFanOut(kept)      // 200 * C(2,2) = 200
    assert(unpruned === 2000L && pruned === 200L,
      s"fan-out $pruned of $unpruned — the prune is not bounding")
    // the bound scales with the long tail: were the prune absent, the
    // join would fan out 10x here and arbitrarily worse as the rare
    // cardinality grows per basket
    assert(pruned * 10 === unpruned)
  }
}
