package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The band-theta-join optimizer rule: fires on the declarative
  * `abs(f(L) - g(R)) < w` pattern, turns the nested-loop plan into a
  * bucketed equi-join, and never changes results — including on the
  * NaN/null rows the residual predicate must still reject.
  */
class BandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def thetaJoin = Tables.part(spark, dir)
    .join(Tables.supplier(spark, dir),
      abs((col("p_retailprice") - lit(900.0)) - (col("s_acctbal") % 100)) < 5)
    .groupBy(col("s_suppkey"))
    .agg(count(lit(1)).as("n"))

  test("the q12-shaped theta join is rewritten to a bucketed equi-join " +
      "with identical results") {
    val rewritten = thetaJoin
    val optimized = rewritten.queryExecution.optimizedPlan.toString
    assert(optimized.contains("_graft_br"),
      "rule must have fired:\n" + optimized.take(900))
    assert(optimized.contains("Generate explode"),
      optimized.take(900))
    // no nested-loop join survives in the physical plan
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      physical.take(900))
    // identical results with the rule disabled
    val expected =
      try {
        spark.conf.set(BandJoinRewrite.confKey, "false")
        thetaJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally spark.conf.unset(BandJoinRewrite.confKey)
    val got = rewritten.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("NaN and null band values are rejected identically to the " +
      "nested-loop evaluation") {
    val l = Seq((1L, 10.0), (2L, Double.NaN), (3L, 10.4))
      .toDF("lid", "lv")
    val r = Seq((101L, Option(10.2)), (102L, Option.empty[Double]),
      (103L, Option(99.0))).toDF("rid", "rv")
    val joined = l.join(r, abs(col("lv") - col("rv")) < 0.5)
      .select("lid", "rid")
    assert(joined.queryExecution.optimizedPlan.toString
      .contains("_graft_br"), "rule must fire on this shape")
    val got = joined.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 101L), (3L, 101L)),
      "NaN/null rows must not match; close pairs must all match")
  }

  test("non-band conditions are left alone") {
    val l = Seq((1L, 10.0)).toDF("lid", "lv")
    val r = Seq((2L, 10.2)).toDF("rid", "rv")
    // one-sided inequality: not a band — no rewrite
    val oneSided = l.join(r, col("lv") < col("rv"))
    assert(!oneSided.queryExecution.optimizedPlan.toString
      .contains("_graft_br"))
    // composite condition: conservative, no rewrite
    val composite = l.join(r,
      abs(col("lv") - col("rv")) < 0.5 && col("lid") =!= col("rid"))
    assert(!composite.queryExecution.optimizedPlan.toString
      .contains("_graft_br"))
    // non-literal width: no rewrite
    val dynWidth = l.join(r, abs(col("lv") - col("rv")) < col("rv"))
    assert(!dynWidth.queryExecution.optimizedPlan.toString
      .contains("_graft_br"))
  }

  test("register() is idempotent and double injection (extensions + " +
      "experimental) still rewrites exactly once") {
    graft.functions.GraftExtensions.register(spark)
    graft.functions.GraftExtensions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq graft.plans.BandJoinRewrite) === 1,
      "repeated register() must not stack rule copies")
    // with BOTH the extensions-injected copy and the experimental copy
    // active, the join is bucketed once — one Generate, no nested
    // re-bucketing of an already-rewritten join
    val plan = thetaJoin.queryExecution.optimizedPlan.toString
    assert(plan.split("Generate explode").length - 1 === 1,
      "exactly one bucket explode expected:\n" + plan.take(900))
  }

  test("SQL-written band predicates reach the same rewrite") {
    Seq((1L, 10.0), (2L, 50.0)).toDF("lid", "lv")
      .createOrReplaceTempView("band_l")
    Seq((101L, 10.2), (102L, 99.0)).toDF("rid", "rv")
      .createOrReplaceTempView("band_r")
    try {
      val q = spark.sql(
        "SELECT lid, rid FROM band_l JOIN band_r ON abs(lv - rv) < 0.5")
      assert(q.queryExecution.optimizedPlan.toString.contains("_graft_br"),
        "rule must fire on SQL-origin plans")
      assert(q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ===
        Set((1L, 101L)))
    } finally {
      spark.catalog.dropTempView("band_l")
      spark.catalog.dropTempView("band_r")
    }
  }

  test("<= band keeps exact-boundary pairs (|a-b| == w) through the " +
      "bucket prefilter") {
    val l = Seq((1L, 10.0), (2L, 3.0)).toDF("lid", "lv")
    val r = Seq((101L, 12.5), (102L, 0.5)).toDF("rid", "rv")
    val joined = l.join(r, abs(col("lv") - col("rv")) <= 2.5)
      .select("lid", "rid")
    assert(joined.queryExecution.optimizedPlan.toString
      .contains("_graft_br"), "rule must fire on <= bands")
    // |10.0-12.5| = 2.5 exactly and |3.0-0.5| = 2.5 exactly: both kept
    assert(joined.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet === Set((1L, 101L), (2L, 102L)))
  }

  test("Long operands abstain: Double buckets round beyond 2^53, so " +
      "the rewrite would drop qualifying pairs the residual can't recover") {
    // |a - b| = 1 < 1.5 exactly, but cast(a as double) rounds to a+1:
    // the floor buckets would differ by 2 and the 3-bucket replication
    // would miss the pair — the rule must leave this join alone
    val big = 9007199254740994L // 2^53 + 2
    val l = Seq((1L, big + 1)).toDF("lid", "lv")
    val r = Seq((2L, big)).toDF("rid", "rv")
    val joined = l.join(r, abs(col("lv") - col("rv")) < 1.5)
      .select("lid", "rid")
    assert(!joined.queryExecution.optimizedPlan.toString
      .contains("_graft_br"), "must not rewrite Long operands")
    assert(joined.collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet === Set((1L, 2L)))
  }

  test("Integer operands abstain: non-ANSI Subtract/Abs wrap on " +
      "overflow, so the original plan matches pairs the exact Double " +
      "buckets would never generate") {
    // under non-ANSI, abs(Int.MinValue - 0) wraps to Int.MinValue
    // (negative) < 5 and the nested-loop plan MATCHES the pair, while
    // the rewrite's exact Double buckets put the operands ~2^31/W
    // apart and would silently drop it; under ANSI (this session's
    // default) the original plan THROWS where the rewrite would
    // silently succeed. Both ways the rewrite would change observable
    // behavior, so the rule must leave integer bands alone.
    def joined = {
      val l = Seq((1L, Int.MinValue), (2L, 3)).toDF("lid", "lv")
      val r = Seq((101L, 0), (102L, 4)).toDF("rid", "rv")
      l.join(r, abs(col("lv") - col("rv")) < 5).select("lid", "rid")
    }
    assert(!joined.queryExecution.optimizedPlan.toString
      .contains("_graft_br"), "must not rewrite Integer operands")
    // ANSI regime: the overflow surfaces as the error ANSI promises
    // (SparkArithmeticException is private[spark]; match on the class
    // of the throwable Spark actually surfaces)
    val thrown = intercept[Exception] { joined.collect() }
    assert(thrown.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"expected the ANSI overflow error, got: ${thrown.getMessage.take(200)}")
    // non-ANSI regime: the wrapped pair (1,101) IS in the original
    // semantics — the abstention preserves it; (1,102) wraps to
    // +2147483644 ≥ 5 → rejected; close pairs (2,101)/(2,102) match.
    // Rebuild the Dataset after the conf flip — a cached
    // QueryExecution would silently re-run the ANSI plan.
    val got =
      try {
        spark.conf.set("spark.sql.ansi.enabled", "false")
        joined.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      } finally spark.conf.unset("spark.sql.ansi.enabled")
    assert(got === Set((1L, 101L), (2L, 101L), (2L, 102L)))
  }

  test("a skew-heavy band join's rewritten equi-join gets AQE " +
      "skew-split — the stated reason the rewrite beats BNLJ at scale") {
    // Half the left rows share ONE band value (one hot bucket, like a
    // default/sentinel price in real data). The rewrite turns the
    // band predicate into a hash-partitioned equi-join on the bucket
    // key, which is exactly the shape AQE's OptimizeSkewedJoin can
    // split; a BroadcastNestedLoopJoin has no such escape hatch.
    val pad = "x" * 64
    def left = spark.range(60000).select(
      col("id").as("lid"),
      when(col("id") % 2 === 0, lit(500.0))
        .otherwise(col("id").cast("double") * 7.3).as("lv"),
      lit(pad).as("lpad"))
    def right = spark.range(1000).select(
      col("id").as("rid"),
      (col("id").cast("double") % 50 + 480.0).as("rv"),
      lit(pad).as("rpad"))
    def banded = left.join(right, abs(col("lv") - col("rv")) < 2.0)
      .select("lid", "rid")
    val confs = Seq(
      // force SMJ: skew splitting only applies to shuffle joins
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale the 256MB default thresholds down to fixture size —
      // the hot partition is ~1MB here, ~GBs at 100TB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // the shared test session runs local[4] → 4 shuffle partitions,
      // where the hot bucket is only ~4x the median (every partition
      // carries a quarter of the uniform rows) and the default 5x
      // factor can't see it; 32 partitions restores the production
      // session's granularity where the hot bucket dominates
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = banded
      assert(df.queryExecution.optimizedPlan.toString.contains("_graft_br"),
        "rewrite must fire before skew handling can apply")
      // execute df's OWN plan (count() builds a new QueryExecution,
      // which would leave this one un-run and its AQE plan unfinalized)
      val n = df.queryExecution.executedPlan.execute().count()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE must have split the hot bucket:\n" + finalPlan.take(1200))
      // results unchanged by the skew split: compare against the
      // rule-off nested-loop count under default AQE confs
      val expected =
        try {
          saved.foreach { case (k, _) => spark.conf.unset(k) }
          spark.conf.set(BandJoinRewrite.confKey, "false")
          banded.count()
        } finally spark.conf.unset(BandJoinRewrite.confKey)
      assert(n === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("boundary completeness: every |a-b| just inside / at / outside " +
      "the width behaves exactly like the residual predicate") {
    val width = 2.0
    val l = (0 until 40).map(i => (i.toLong, i * 0.7)).toDF("lid", "lv")
    val r = (0 until 40).map(i => (1000L + i, i * 0.9 - 3.0))
      .toDF("rid", "rv")
    val band = l.join(r, abs(col("lv") - col("rv")) < width)
      .select("lid", "rid")
    assert(band.queryExecution.optimizedPlan.toString.contains("_graft_br"))
    val got = band.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // reference: driver-side brute force
    val lv = (0 until 40).map(i => i.toLong -> i * 0.7)
    val rv = (0 until 40).map(i => (1000L + i) -> (i * 0.9 - 3.0))
    val expected = (for {
      (li, lx) <- lv; (ri, rx) <- rv if math.abs(lx - rx) < width
    } yield (li, ri)).toSet
    assert(got === expected)
  }
}
