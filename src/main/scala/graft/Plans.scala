package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-transparency dump → PLANS.md, two sections (in this order):
  *
  *  1. Executed FINAL AQE plans at sf0.1 for the join-heavy queries —
  *     AQE picks join strategies from RUNTIME sizes, so the plan that
  *     matters (did customer broadcast? did the skew split?) only
  *     exists after execution at the benchmark scale factor. These
  *     queries run for real (seconds each) and the dumped plan says
  *     `isFinalPlan=true`.
  *  2. `explain` (AQE initial) for EVERY registry query at sf0.001 —
  *     cheap, broad: pushdown/pruning/shuffle shape is reviewable
  *     without running anything.
  */
object Plans {

  /** The queries whose join-strategy choices are scale-dependent and
    * worth the cost of a real sf0.1 execution (the round-2 verdict's
    * q6/q40/q48/q49 forced-broadcast findings plus the heavy ML
    * pipelines whose exchanges dominate the bench).
    */
  val finalPlanQueries: Seq[String] = Seq(
    "q6_lookup_join", "q8_revenue_brand", "q12_theta_join",
    "q12b_range_join", "q6b_bucketed_join", "q48b_bucketed_join",
    "q63_zorder_scan",
    "q40_fk_explode", "q48_multi_join", "q49_star_join",
    "ns2_dedup_jaccard", "ns3_dedup_minhash", "ns22_corpus_prep",
    "ns23_contamination", "ns26_release",
    "ns30_contamination_bloom", "ns31_budget_select", "q68_interval_join",
    "q74_stream_enrich", "ns35_dup_paragraphs", "q67b_winsorize_approx",
    "q80_incremental_join", "q82_basket",
    // round-6 heavies: the oriented wedge join, the blocked
    // edit-distance join, and the prefix-filtered set-sim join are the
    // three most expensive new shapes at sf0.1 — their runtime join
    // strategies are the thing to audit
    "q93_triangles", "q79_fuzzy_dedup", "ns39_prefix_join",
    // round-10: the capped simhash band join (the guaranteed-linear
    // skew tier), the end-to-end training-export chain, and the
    // fold-then-compact served-index lifecycle
    "ns5c_simhash_capped", "ns64_train_export", "ns8h_sim_ivf_folded",
    // round-7: the quantized ANN serving path (ADC candidate join +
    // exact re-score) and the cell-pruned semantic dedup pair scan
    "ns7d_sim_ivfpq", "ns44_semdedup",
    // round-8: the broadcast-pruned posting join behind BM25 and the
    // frontier/anti-join rounds of BFS — both join-strategy-sensitive
    "ns46_bm25", "q101_reachability",
    // the weighted-relaxation rounds (improved-frontier joins) and the
    // two-retriever fusion: whether the semantic side's query filter
    // reaches below the cross-join is visible only in the real plan
    "q102_shortest_paths", "ns50_hybrid_rrf",
    // round-9: the tombstoned serving paths — the thing to audit is
    // the tombstone anti-join's runtime strategy (AQE should
    // broadcast the id-sized build side) on both the lexical and the
    // vector index
    "ns46d_bm25_deleted", "ns8f_sim_ivf_deleted")

  private def section(sb: StringBuilder, spark: SparkSession,
      dir: String, names: Seq[String], execute: Boolean): Unit =
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      sb.append(s"\n## $name\n\n```\n")
      try {
        val df = fn(spark, dir)
        // run THIS QueryExecution's physical plan directly: count()
        // re-plans as a derived aggregate and foreach/rdd go through a
        // separate rddQueryExecution, so neither finalizes the AQE plan
        // we're about to print (the same only-your-own-QueryExecution
        // rule as Telemetry.metrics)
        if (execute) df.queryExecution.executedPlan.execute().count()
        val plan = df.queryExecution.executedPlan.toString
        val lines = plan.split("\n")
        sb.append(lines.take(60).mkString("\n"))
        if (lines.length > 60) sb.append(s"\n... (${lines.length - 60} more lines)")
      } catch { case e: Throwable =>
        // String.valueOf: a null-message Throwable (bare NPE) must
        // produce one failed entry, not kill the whole dump from
        // inside the catch block
        sb.append(s"(plan failed: ${String.valueOf(e.getMessage).take(200)})")
      }
      sb.append("\n```\n")
    }

  /** Measured z-order proof: run the q63 predicate over the z-ordered
    * orders table AND over a leading-column-sorted baseline of the same
    * file count, then print each parquet scan's numFiles/numOutputRows
    * metrics. Rows output by the scan = rows surviving row-group
    * skipping (PushedFilters prune row groups by min-max before any
    * decode), so the delta IS the skipping, measured — the span
    * statistics in LayoutSpec only predict it.
    */
  private def zOrderSection(sb: StringBuilder, spark: SparkSession,
      dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.meta.PlanIntrospection.fileScanMetrics
    try {
      val pred = col("o_custkey") >= 100 &&
        col("o_totalprice").between(100000, 150000)
      // building the registry query writes the z-table on first use;
      // measure the raw scan (no ORDER BY: q63's global sort would run
      // the scan a second time for range sampling, doubling the metric)
      SparkEntry.queries("q63_zorder_scan")(spark, dir)
      val zDf = spark.read.parquet(RelationalQueries
        .zOrderedTablePath(spark, dir, "orders_zorder")).filter(pred)
      val linPath = java.nio.file.Files
        .createTempDirectory("graft_zproof").toString + "/lin"
      Tables.orders(spark, dir)
        .repartitionByRange(32, col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.parquet(linPath)
      val linDf = spark.read.parquet(linPath).filter(pred)
      val ((zF, zR), (lF, lR)) =
        (fileScanMetrics(zDf), fileScanMetrics(linDf))
      val total = Tables.orders(spark, dir).count()
      sb.append(s"\nPredicate: o_custkey >= 100 AND o_totalprice IN " +
        s"[100000, 150000] over ${total} orders rows, 32 files each " +
        "layout.\n\n" +
        "| layout | files listed | rows read after row-group skip |\n" +
        "| --- | --- | --- |\n" +
        s"| z-order (o_custkey, o_totalprice) | $zF | $zR |\n" +
        s"| lexicographic sort o_custkey | $lF | $lR |\n\n" +
        s"Skipping ratio: z-order reads ${100 * zR / math.max(1, total)}% " +
        s"of rows, the leading-column sort ${100 * lR / math.max(1, total)}% " +
        "(its file min-max can only cut on o_custkey, and the q63 " +
        "o_custkey band is deliberately near-vacuous).\n")
    } catch { case e: Throwable =>
      sb.append(s"(z-order proof failed: " +
        s"${String.valueOf(e.getMessage).take(200)})\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.md")
    // same env override as Bench (SPARK_GRAFT_SF_DIR names the bench
    // SF dir; its parent holds the sibling SFs) so the dump measures
    // the right data on machines where testdata lives elsewhere
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    // getAbsoluteFile first: a single-segment relative dir has a null
    // getParentFile, which would silently resolve sf0.001 against CWD
    val smallDir = new java.io.File(new java.io.File(benchDir)
      .getAbsoluteFile.getParentFile, "sf0.001").getPath
    val spark = GraftSession.create("local[8]", "graft-plans",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans\n\n")
    sb.append("Generated by `graft.Plans`. Things to look for: " +
      "`PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` for " +
      "dim joins, partial+final `HashAggregate` pairs, and the absence " +
      "of unexpected `Exchange`s.\n")
    sb.append("\n# Section 1 — final AQE plans at sf0.1 (executed)\n\n")
    sb.append("Join strategies below are AQE's runtime choices at the " +
      "benchmark scale factor (`isFinalPlan=true`); no SF-proportional " +
      "table carries a broadcast hint, so what you see is what a " +
      "100×-larger input would re-decide, not a hint frozen at dev " +
      "scale.\n")
    section(sb, spark, benchDir,
      finalPlanQueries.filter(SparkEntry.queries.contains), execute = true)
    sb.append("\n# Section 1b — z-order row-group skipping at bench SF " +
      "(measured)\n")
    zOrderSection(sb, spark, benchDir)
    sb.append("\n# Section 2 — AQE initial plans at sf0.001 (all queries)\n")
    section(sb, spark, smallDir,
      SparkEntry.queries.keys.toSeq.sorted, execute = false)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"PLANS_WRITTEN=$out")
    spark.stop()
  }
}
