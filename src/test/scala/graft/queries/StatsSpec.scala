package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computable cases for the statistical algebra behind the q89+
  * registry entries. The DuckDB gate proves cross-engine equality at
  * sf0.01; these prove the formulas themselves on inputs whose answers
  * are known a priori.
  */
class StatsSpec extends SparkSpec {

  import spark.implicits._

  /** The q90 midrank AUC, inlined over a (pos, score) frame. */
  private def auc(rows: Seq[(Long, Double)]): Double = {
    val df = rows.toDF("pos", "score")
      .withColumn("rnk", rank().over(Window.orderBy(col("score"))))
      .withColumn("nties",
        count(lit(1)).over(Window.partitionBy(col("score"))))
    val r = df.agg(sum(col("pos")).as("p"),
      (count(lit(1)) - sum(col("pos"))).as("n"),
      sum((col("rnk") + (col("nties") - 1) / 2.0) * col("pos"))
        .as("rs")).head()
    val (p, n, rs) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    (rs - p.toDouble * (p + 1) / 2.0) / (p.toDouble * n)
  }

  test("AUC is 1 for perfect separation, 0 for inverted, 0.5 for ties") {
    val perfect = Seq((0L, 1.0), (0L, 2.0), (1L, 3.0), (1L, 4.0))
    assert(auc(perfect) === 1.0)
    val inverted = perfect.map { case (p, s) => (1L - p, s) }
    assert(auc(inverted) === 0.0)
    val allTied = Seq((0L, 7.0), (1L, 7.0), (0L, 7.0), (1L, 7.0))
    assert(auc(allTied) === 0.5)
  }

  test("AUC matches the pair-counting definition on a mixed case") {
    val rows = Seq((1L, 3.0), (0L, 3.0), (1L, 5.0), (0L, 2.0), (0L, 5.0))
    // pairs (pos, neg): wins + half-ties over 2*3 pairs
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val expected = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
      (pos.size * neg.size)
    assert(math.abs(auc(rows) - expected) < 1e-12)
  }

  test("chi-square contributions are zero under exact independence") {
    // 2×2 table with perfectly proportional cells → exp == obs
    val rows = (Seq.fill(40)(("a", "x")) ++ Seq.fill(60)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("r", "c")
    val cells = rows.groupBy("r", "c").agg(count(lit(1)).as("obs"))
    val rt = rows.groupBy("r").agg(count(lit(1)).as("row_tot"))
    val ct = rows.groupBy("c").agg(count(lit(1)).as("col_tot"))
    val n = rows.count().toDouble
    val contrib = cells.join(rt, "r").join(ct, "c")
      .select(pow(col("obs") - col("row_tot") * col("col_tot") / n, 2) /
        (col("row_tot") * col("col_tot") / n))
      .as[Double].collect()
    assert(contrib.forall(_ === 0.0))
  }

  test("Wilson interval brackets the point estimate and is in [0,1]") {
    val rows = SparkEntry.queries("q91_conversion")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cvr, lo, hi) = (r.getAs[Double]("cvr"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      assert(lo >= 0.0 && hi <= 1.0 && lo < cvr && cvr < hi)
    }
  }

  test("q95 survival matches a naive driver-side Kaplan-Meier at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val seg = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val signup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val death = ev.filter(_._2 == "purchase").groupBy(_._1).flatMap {
      case (u, xs) => signup.get(u).flatMap { s0 =>
        val ds = xs.map(_._3).filter(_ >= s0)
        if (ds.isEmpty) None else Some(u -> ds.min)
      }
    }
    val obsEnd = ev.map(_._3).max
    val subj = signup.toSeq.flatMap { case (u, s0) =>
      seg.get(u).map { mkt =>
        death.get(u) match {
          case Some(d) => (mkt, d - s0, 1)
          case None    => (mkt, obsEnd - s0, 0)
        }
      }
    }
    val expected = subj.groupBy(_._1).toSeq.flatMap { case (mkt, xs) =>
      val steps = xs.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, ys) =>
        (t, ys.count(_._3 == 1).toLong, ys.size.toLong) }
      var atRisk = xs.size.toLong
      // exp of the running ln-sum, not a running product: bit-matches
      // the engine's distributed cumulative-product-via-logs identity
      var logSum = 0.0
      var dead = false
      steps.flatMap { case (t, d, tot) =>
        val row = if (d > 0) {
          if (d == atRisk) dead = true
          else logSum += math.log(1.0 - d.toDouble / atRisk)
          Some((mkt, t, atRisk, d,
            r6(if (dead) 0.0 else math.exp(logSum))))
        } else None
        atRisk -= tot
        row
      }
    }.sortBy(x => (x._1, x._2))
    assert(subj.nonEmpty && expected.nonEmpty)
    val got = graft.SparkEntry.queries("q95_survival")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
  }

  test("regression registry entry recovers a planted exact line") {
    // y = 3x + 7 exactly → slope 3, intercept 7, r2 1 regardless of x
    val df = (1 to 50).map(i => (i.toDouble, 3.0 * i + 7.0))
      .toDF("x", "y")
    val r = df.agg(
      round(regr_slope(col("y"), col("x")), 6).as("s"),
      round(regr_intercept(col("y"), col("x")), 6).as("i"),
      round(regr_r2(col("y"), col("x")), 6).as("r2")).head()
    assert(r.getDouble(0) === 3.0 && r.getDouble(1) === 7.0 &&
      r.getDouble(2) === 1.0)
  }

  private def ks(rows: Seq[(Double, Boolean)]) =
    StatsQueries.ksTwoSample(rows.toDF("v", "ia")).head()

  test("KS is 0 for identical samples and 1 for disjoint ranges") {
    val same = ks(Seq(1.0, 2.0, 3.0).flatMap(v =>
      Seq((v, true), (v, false))))
    assert(same.getAs[Double]("d_stat") === 0.0)
    assert(same.getAs[Double]("p_approx") === 1.0)
    // every a-value below every b-value → the ECDFs separate fully
    val disjoint = ks(Seq((1.0, true), (2.0, true), (10.0, false),
      (11.0, false)))
    assert(disjoint.getAs[Double]("d_stat") === 1.0)
    assert(disjoint.getAs[Long]("n_a") === 2L)
    assert(disjoint.getAs[Long]("n_b") === 2L)
  }

  test("KS matches a hand-computed mixed case (unequal sizes, ties " +
      "across groups)") {
    // a = {1, 2, 3}; b = {2, 4}. ECDF steps at v=1: |1/3−0|=1/3;
    // v=2: |2/3−1/2|=1/6; v=3: |1−1/2|=1/2 (the sup); v=4: |1−1|=0.
    val r = ks(Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (4.0, false)))
    assert(r.getAs[Double]("d_stat") === 0.5)
    val scaled = 0.5 * math.sqrt(3.0 * 2.0 / 5.0)
    assert(math.abs(r.getAs[Double]("ks_scaled") - scaled) < 5e-7)
    val p = math.min(1.0, 2.0 * math.exp(-2.0 * scaled * scaled))
    assert(math.abs(r.getAs[Double]("p_approx") - p) < 5e-7)
  }

  test("KS bucket decomposition equals the naive single-window form " +
      "on a pseudo-random sample, and survives a single-value domain") {
    // deterministic values via a hash mix — no Random (replay-safe)
    val rows = (1 to 400).map { i =>
      val v = ((i * 2654435761L) % 1000).toDouble / 10.0
      (v, i % 3 == 0)
    }
    val got = ks(rows)
    // naive: one cumulative window over distinct values
    val pv = rows.toDF("v", "ia").groupBy(col("v"))
      .agg(sum(when(col("ia"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("ia"), 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pv.agg(sum("na"), sum("nb")).as[(Long, Long)].head()
    val naive = pv
      .select((sum(col("na")).over(w) / lit(tot._1.toDouble) -
        sum(col("nb")).over(w) / lit(tot._2.toDouble)).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(got.getAs[Double]("d_stat") ===
      BigDecimal(naive).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // degenerate domain (every value identical): width floor guards
    // the bucket divisor; D must be exactly 0
    val flat = ks(Seq((5.0, true), (5.0, false), (5.0, true)))
    assert(flat.getAs[Double]("d_stat") === 0.0)
  }
}
