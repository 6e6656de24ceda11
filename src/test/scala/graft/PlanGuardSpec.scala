package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape regression guards: the scale properties the round
  * reviews keep re-verifying by hand, pinned as assertions so a
  * refactor cannot silently undo them.
  *
  *  - predicate/projection pushdown reaches the parquet scan
  *  - the hot aggregate path stays inside whole-stage codegen
  *  - no SF-proportional table ever regains a broadcast hint (the
  *    round-2 class of executor-OOM-at-100×); only the fixed-size
  *    dims region (5 rows) and nation (25 rows) may carry one
  */
class PlanGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  private def hintCount(name: String): Int =
    run(name).queryExecution.analyzed.collect {
      case h: ResolvedHint => h
    }.length

  test("q2: filter and projection push down to the parquet scan") {
    val plan = run("q2_filtered_scan").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(600))
    assert(!plan.contains("PushedFilters: []"),
      "pushdown must carry the actual predicates:\n" + plan.take(600))
    // projection pruning: untouched wide columns never reach the scan
    assert(!plan.contains("l_comment"), "ReadSchema must be pruned")
  }

  test("q1: the aggregate pipeline runs inside whole-stage codegen") {
    // codegen spans only appear in the FINAL AQE plan — execute this
    // QueryExecution's own physical plan first (the Bench/Plans rule)
    val df = run("q1_agg")
    df.queryExecution.executedPlan.execute().count()
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators print as "*(n) HashAggregate..." in the
    // final plan tree; the un-starred form means interpreted mode
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined,
      plan.take(900))
  }

  test("SF-proportional joins carry no frozen broadcast hints; " +
      "fixed-size-dim hints are the only ones allowed") {
    // these were the round-2/round-3 findings: hints here OOM at 100×
    Seq("q6_lookup_join", "q12_theta_join", "q40_fk_explode",
      "q48_multi_join").foreach { q =>
      assert(hintCount(q) === 0, s"$q must leave strategy to AQE")
    }
    // q49 hints exactly its two fixed-size dims (region, nation)
    assert(hintCount("q49_star_join") === 2)
    assert(hintCount("q7_catalog_join") === 2)
  }

  test("a selective dim filter injects a runtime bloom filter on the " +
      "fact side once the scan clears the size gate") {
    // Runtime bloom filters ship with GraftSession's defaults but gate
    // on a 10GB application-side scan — exactly right at 100TB (a
    // selective dim predicate prunes the fact shuffle) and free at
    // bench scale. This pins that the gate is the ONLY thing between
    // our star-join shape and the filter: lower it and injection must
    // fire on plain declarative code, no hints.
    val gate = "spark.sql.optimizer.runtime.bloomFilter" +
      ".applicationSideScanSizeThreshold"
    val bhj = "spark.sql.autoBroadcastJoinThreshold"
    val saved = Seq(gate, bhj).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(gate, "0")
      spark.conf.set(bhj, "-1") // broadcast joins skip the bloom path
      val cust = Tables.customer(spark, dir)
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      val j = Tables.orders(spark, dir)
        .join(cust, org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        "expected a runtime bloom filter on the fact side:\n" + opt.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ns29/ns31: the per-doc term count and the corpus frequency " +
      "table share ONE tokenize exchange (ReusedExchange), so the " +
      "expensive explode+hash scan runs once") {
    // exchange reuse is an AQE runtime decision — execute the plan
    // (Plans.scala's own-QueryExecution rule), THEN read it
    val qe = run("ns29_lm_score").queryExecution
    qe.executedPlan.execute().count()
    val plan = qe.executedPlan.toString
    // (the executed-plan string re-prints materialized stage subtrees,
    // so node-count checks are meaningless — the reuse marker is the
    // guard: with it present the tokenize stage materialized once)
    assert(plan.contains("ReusedExchange"),
      "freq branch must reuse the groupBy(doc_id, h) exchange:\n" +
        plan.take(1500))
  }
}
