package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Statistical-analytics registry: closed-form model fitting,
  * ranking-quality and significance testing, and whole-graph
  * statistics — the "analyst asks a modeling question of the CRM data"
  * tier above the relational registry (reference anchor: the filtered
  * read API `get_filtered_items` at PodioApiWrapper.py:104 feeds exactly
  * this kind of downstream analysis; the engine runs it in place).
  *
  * Everything here is exact distributed algebra — single-pass
  * aggregates, broadcast-sized marginals, or fixed-depth join chains —
  * no sampling, no driver-side math beyond literal constants. Floating
  * outputs are rounded to 6 dp on both engine sides (FIXTURES.md
  * determinism rules).
  */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------- q89 OLS regression

  /** Per-brand ordinary-least-squares fit of extended price on
    * quantity via the SQL-standard regr_* aggregates — one pass, five
    * running sums per group (count, Σx, Σy, Σxy, Σx²), all map-side
    * combinable; nothing about the shape changes at 100 TB beyond the
    * shuffle of ~50 brand keys.
    */
  val q89Regression: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        regr_count(col("l_extendedprice"), col("l_quantity"))
          .cast("long").as("n_pts"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
          .as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6)
          .as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
          .as("r2"),
        round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6)
          .as("avg_x"),
        round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 6)
          .as("avg_y"))
      .orderBy(col("p_brand"))

  val q89RegressionSql: String =
    """SELECT p_brand,
      |  regr_count(l_extendedprice, l_quantity)::BIGINT AS n_pts,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6)
      |    AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
      |  round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY p_brand""".stripMargin

  // ------------------------------------------------------- q90 ROC-AUC

  /** Per-segment ROC-AUC of `value` as a purchase classifier, via the
    * Mann-Whitney rank-sum identity: AUC = (Σ rank⁺ − P(P+1)/2)/(P·N)
    * with midranks for ties (rank() + (ties−1)/2 — every term is a
    * half-integer, so the double sums are exact below 2^52 and the
    * single final division is the only rounding site).
    *
    * Scale shape: the rank window partitions by segment, so one
    * segment = one sort partition. At 100 TB the continuation is the
    * same monotone-bucket decomposition used by Corpus.ntileByScore
    * (bucket histogram → offset prefix-sum → within-bucket window);
    * the rank-sum ALGEBRA this query gates is unchanged by that
    * substitution, which is why the window form is the registry entry.
    */
  val q90Auc: Q = (s, dir) => {
    val scored = Tables.events(s, dir)
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("pos"),
        col("value").as("score"))
    val ranked = scored
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("segment")).orderBy(col("score"))))
      .withColumn("nties", count(lit(1)).over(
        Window.partitionBy(col("segment"), col("score"))))
    ranked.groupBy(col("segment"))
      .agg(sum(col("pos")).as("n_pos"),
        (count(lit(1)) - sum(col("pos"))).as("n_neg"),
        sum((col("rnk") + (col("nties") - 1) / 2.0) * col("pos"))
          .as("rank_sum"))
      .select(col("segment"), col("n_pos"), col("n_neg"),
        round((col("rank_sum") -
            col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0) /
          (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))
      .orderBy(col("segment"))
  }

  val q90AucSql: String =
    """WITH scored AS (
      |  SELECT c_mktsegment AS segment,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
      |    value AS score
      |  FROM events JOIN customer ON user_id = c_custkey
      |), ranked AS (
      |  SELECT segment, pos,
      |    rank() OVER (PARTITION BY segment ORDER BY score) AS rnk,
      |    count(*) OVER (PARTITION BY segment, score) AS nties
      |  FROM scored
      |)
      |SELECT segment, sum(pos)::BIGINT AS n_pos,
      |  (count(*) - sum(pos))::BIGINT AS n_neg,
      |  round((sum((rnk + (nties - 1) / 2.0) * pos)
      |      - CAST(sum(pos) AS DOUBLE) * (sum(pos) + 1) / 2.0)
      |    / (CAST(sum(pos) AS DOUBLE) * (count(*) - sum(pos))), 6)
      |    AS auc
      |FROM ranked GROUP BY 1 ORDER BY segment""".stripMargin

  // ------------------------- q91 conversion: Wilson CI + z vs pooled

  /** Per-segment conversion rate with a Wilson 95% interval and a
    * two-proportion z-statistic against the pooled rate. One groupBy
    * for the per-segment counts; the pooled totals are a 1-row
    * broadcast; all the interval arithmetic is per-row Column math on
    * 5 rows. The z = 1.96 critical value is a shared literal on both
    * engine sides, so the comparison is bit-deterministic after the
    * 6-dp round.
    */
  val q91Conversion: Q = (s, dir) => {
    val seg = Tables.events(s, dir)
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_conv"))
    val tot = seg.agg(sum(col("n_events")).as("n_tot"),
      sum(col("n_conv")).as("x_tot"))
    val z = lit(1.96)
    val p = col("n_conv") / col("n_events").cast("double")
    val n = col("n_events").cast("double")
    val center = p + z * z / (lit(2.0) * n)
    val half = z * sqrt((p * (lit(1.0) - p) + z * z / (lit(4.0) * n)) / n)
    val denom = lit(1.0) + z * z / n
    val p0 = col("x_tot") / col("n_tot").cast("double")
    seg.crossJoin(broadcast(tot))
      .select(col("segment"), col("n_events"), col("n_conv"),
        round(p, 6).as("cvr"),
        round((center - half) / denom, 6).as("wilson_lo"),
        round((center + half) / denom, 6).as("wilson_hi"),
        round((p - p0) / sqrt(p0 * (lit(1.0) - p0) *
          (lit(1.0) / n + lit(1.0) / col("n_tot").cast("double"))), 6)
          .as("z_vs_pool"))
      .orderBy(col("segment"))
  }

  val q91ConversionSql: String =
    """WITH seg AS (
      |  SELECT c_mktsegment AS segment, count(*)::BIGINT AS n_events,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      ::BIGINT AS n_conv
      |  FROM events JOIN customer ON user_id = c_custkey GROUP BY 1
      |), tot AS (
      |  SELECT sum(n_events)::BIGINT AS n_tot,
      |    sum(n_conv)::BIGINT AS x_tot FROM seg
      |)
      |SELECT segment, n_events, n_conv,
      |  round(n_conv / CAST(n_events AS DOUBLE), 6) AS cvr,
      |  round(((n_conv / CAST(n_events AS DOUBLE))
      |      + 1.96 * 1.96 / (2.0 * n_events)
      |      - 1.96 * sqrt(((n_conv / CAST(n_events AS DOUBLE))
      |          * (1.0 - (n_conv / CAST(n_events AS DOUBLE)))
      |          + 1.96 * 1.96 / (4.0 * n_events)) / n_events))
      |    / (1.0 + 1.96 * 1.96 / n_events), 6) AS wilson_lo,
      |  round(((n_conv / CAST(n_events AS DOUBLE))
      |      + 1.96 * 1.96 / (2.0 * n_events)
      |      + 1.96 * sqrt(((n_conv / CAST(n_events AS DOUBLE))
      |          * (1.0 - (n_conv / CAST(n_events AS DOUBLE)))
      |          + 1.96 * 1.96 / (4.0 * n_events)) / n_events))
      |    / (1.0 + 1.96 * 1.96 / n_events), 6) AS wilson_hi,
      |  round(((n_conv / CAST(n_events AS DOUBLE))
      |      - (x_tot / CAST(n_tot AS DOUBLE)))
      |    / sqrt((x_tot / CAST(n_tot AS DOUBLE))
      |      * (1.0 - (x_tot / CAST(n_tot AS DOUBLE)))
      |      * (1.0 / n_events + 1.0 / n_tot)), 6) AS z_vs_pool
      |FROM seg CROSS JOIN tot ORDER BY segment""".stripMargin

  // ------------------------------- q92 chi-square independence test

  /** Chi-square test of independence between customer nation and event
    * type: the full contingency table with observed counts, expected
    * counts under independence (row·col/N), and each cell's χ²
    * contribution. The marginals are two tiny aggregates broadcast
    * back onto the cells — at 100 TB the only full-data pass is the
    * one groupBy building the observed cells; everything after
    * operates on |nations| × |event types| rows.
    */
  val q92ChiSquare: Q = (s, dir) => {
    val joined = Tables.events(s, dir)
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("event_type"))
    val cells = joined.groupBy(col("n_name"), col("event_type"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = joined.groupBy(col("n_name"))
      .agg(count(lit(1)).as("row_tot"))
    val colTot = joined.groupBy(col("event_type"))
      .agg(count(lit(1)).as("col_tot"))
    val tot = joined.agg(count(lit(1)).as("n"))
    val expected = col("row_tot") * col("col_tot") / col("n").cast("double")
    cells
      .join(broadcast(rowTot), Seq("n_name"))
      .join(broadcast(colTot), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("n_name"), col("event_type"), col("obs"),
        round(expected, 6).as("exp"),
        round(pow(col("obs") - expected, 2) / expected, 6)
          .as("contrib"))
      .orderBy(col("n_name"), col("event_type"))
  }

  val q92ChiSquareSql: String =
    """WITH joined AS (
      |  SELECT n_name, event_type
      |  FROM events JOIN customer ON user_id = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |), cells AS (
      |  SELECT n_name, event_type, count(*)::BIGINT AS obs
      |  FROM joined GROUP BY 1, 2
      |), rt AS (SELECT n_name, count(*)::BIGINT AS row_tot
      |  FROM joined GROUP BY 1),
      |ct AS (SELECT event_type, count(*)::BIGINT AS col_tot
      |  FROM joined GROUP BY 1),
      |tot AS (SELECT count(*)::BIGINT AS n FROM joined)
      |SELECT n_name, event_type, obs,
      |  round(row_tot * col_tot / CAST(n AS DOUBLE), 6) AS exp,
      |  round(pow(obs - row_tot * col_tot / CAST(n AS DOUBLE), 2)
      |    / (row_tot * col_tot / CAST(n AS DOUBLE)), 6) AS contrib
      |FROM cells JOIN rt USING (n_name) JOIN ct USING (event_type)
      |CROSS JOIN tot ORDER BY n_name, event_type""".stripMargin

  // ----------------------------------------- q93 triangle statistics

  /** Triangle census of the part co-purchase graph (parts connected
    * iff some order contains both): exact triangle count and global
    * clustering coefficient via [[Graph.triangleStats]]'s
    * degree-ordered node-iterator. The oracle restates the count with
    * the simpler lexicographic orientation (p1 < p2 < p3 three-way
    * join) — a different enumeration order of the SAME set, so equal
    * counts also certify the degree-ordering logic.
    */
  val q93Triangles: Q = (s, dir) => {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    Graph.triangleStats(Graph.coOccurrenceEdges(op, "ok", "pk"))
  }

  val q93TrianglesSql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), edges AS (
      |  SELECT DISTINCT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |), deg AS (
      |  SELECT pk, count(*)::BIGINT AS d FROM (
      |    SELECT p1 AS pk FROM edges
      |    UNION ALL SELECT p2 FROM edges) GROUP BY 1
      |), tri AS (
      |  SELECT count(*)::BIGINT AS n_triangles FROM edges e1
      |  JOIN edges e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
      |  JOIN edges e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
      |), st AS (
      |  SELECT count(*)::BIGINT AS n_nodes,
      |    CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg
      |)
      |SELECT n_nodes,
      |  (SELECT count(*) FROM edges)::BIGINT AS n_edges,
      |  n_wedges, n_triangles,
      |  round(3.0 * n_triangles / n_wedges, 6) AS global_cc
      |FROM st CROSS JOIN tri""".stripMargin

  /** Edge-sampled approximate triangle count
    * ([[Graph.triangleStatsSampled]], p = 1/2, seed 12345) — exact
    * q93 is Θ(wedges) definitionally, and the degree-skew tier
    * measured wedge volume growing at exp 1.42, so at 100× the
    * budgeted tool is DOULION-style sparsify-then-count. The hash
    * sampling is deterministic (60-bit md5 of seed_p1_p2), so unlike
    * rand()-sampled estimators the WHOLE thing hash-gates: the
    * oracle redraws the identical subgraph and restates the
    * estimator and its in-result error column (`rse_indep`, the
    * q19b/q69 evidence discipline). GraphSpec pins empirical
    * unbiasedness over a seed sweep on closed-form fixtures.
    */
  val q93bTrianglesSampled: Q = (s, dir) => {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    Graph.triangleStatsSampled(Graph.coOccurrenceEdges(op, "ok", "pk"),
      keepNum = 1, keepDen = 2, seed = 12345L)
  }

  val q93bTrianglesSampledSql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), edges AS (
      |  SELECT DISTINCT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |), kept AS (
      |  SELECT p1, p2 FROM edges
      |  WHERE ('0x' || substr(md5('12345_' || CAST(p1 AS VARCHAR)
      |    || '_' || CAST(p2 AS VARCHAR)), 1, 15))::BIGINT % 2 < 1
      |), tri AS (
      |  SELECT count(*)::BIGINT AS tri_sampled FROM kept e1
      |  JOIN kept e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
      |  JOIN kept e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
      |)
      |SELECT (SELECT count(*) FROM edges)::BIGINT AS n_edges_full,
      |  (SELECT count(*) FROM kept)::BIGINT AS n_edges_kept,
      |  1 AS keep_num, 2 AS keep_den, tri_sampled,
      |  round(tri_sampled / 0.125::DOUBLE, 2) AS est_triangles,
      |  CASE WHEN tri_sampled > 0 THEN
      |    round(sqrt((1 - 0.125::DOUBLE) / tri_sampled), 6)
      |  END AS rse_indep
      |FROM tri""".stripMargin

  // --------------------------------------------------- q94 PageRank

  /** Three power iterations of damped PageRank on the part
    * co-purchase graph, normalized so 1.0 = the uniform share (see
    * [[Graph.pageRank]] for the scale shape). The oracle unrolls the
    * identical three rounds as chained CTEs — fixed iteration count is
    * what makes the semantics ANSI-expressible at all.
    */
  val q94PageRank: Q = (s, dir) => {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    Graph.pageRank(Graph.coOccurrenceEdges(op, "ok", "pk"),
        iters = 3, damping = 0.85)
      .withColumnRenamed("node", "part_key")
      .orderBy(col("part_key"))
  }

  val q94PageRankSql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), eu AS (
      |  SELECT DISTINCT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |), edges AS (
      |  SELECT p1 AS src, p2 AS dst FROM eu
      |  UNION ALL SELECT p2, p1 FROM eu
      |), deg AS (
      |  SELECT src AS node, count(*)::BIGINT AS deg
      |  FROM edges GROUP BY 1
      |), nn AS (SELECT count(*)::BIGINT AS n FROM deg),
      |pr0 AS (
      |  SELECT node, deg, 1.0 / n AS pr FROM deg CROSS JOIN nn
      |), pr1 AS (
      |  SELECT d.node, d.deg, 0.15 / n + 0.85 * coalesce(s.mass, 0)
      |    AS pr
      |  FROM deg d CROSS JOIN nn
      |  LEFT JOIN (SELECT e.dst AS node, sum(p.pr / p.deg) AS mass
      |    FROM edges e JOIN pr0 p ON e.src = p.node GROUP BY 1) s
      |    ON d.node = s.node
      |), pr2 AS (
      |  SELECT d.node, d.deg, 0.15 / n + 0.85 * coalesce(s.mass, 0)
      |    AS pr
      |  FROM deg d CROSS JOIN nn
      |  LEFT JOIN (SELECT e.dst AS node, sum(p.pr / p.deg) AS mass
      |    FROM edges e JOIN pr1 p ON e.src = p.node GROUP BY 1) s
      |    ON d.node = s.node
      |), pr3 AS (
      |  SELECT d.node, d.deg, 0.15 / n + 0.85 * coalesce(s.mass, 0)
      |    AS pr
      |  FROM deg d CROSS JOIN nn
      |  LEFT JOIN (SELECT e.dst AS node, sum(p.pr / p.deg) AS mass
      |    FROM edges e JOIN pr2 p ON e.src = p.node GROUP BY 1) s
      |    ON d.node = s.node
      |)
      |SELECT node AS part_key, deg, round(pr * n, 6) AS pr_norm
      |FROM pr3 CROSS JOIN nn ORDER BY part_key""".stripMargin

  // ------------------------------------ q95 Kaplan-Meier survival

  /** Kaplan-Meier survival curves per segment for time-from-signup to
    * first purchase, with right-censoring at the end of the
    * observation window (users who never purchase after signup
    * contribute their observed time to the risk sets but no death
    * step). The product-limit estimator is computed as
    * exp(Σ ln(1 − d/n)) over cumulative windows — a distributed
    * cumulative PRODUCT via the log identity, since neither engine has
    * a product aggregate — with two guards: risk-set rows where the
    * whole set dies (d = n) would be ln(0), so they are excluded from
    * the sum and a cumulative flag pins the curve to exactly 0.0 from
    * that step on.
    *
    * Scale shape: per-user reduction (3 small aggregates), one
    * broadcast observation-end row, then all windows run over the
    * per-(segment, time) GROUPED risk table — rows = distinct event
    * times, not subjects — partitioned by segment.
    */
  val q95Survival: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val death = ev.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts") >= col("signup_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("death_ts"))
    val obsEnd = ev.agg(max(col("ts")).as("end_ts"))
    val subj = su.join(death, Seq("user_id"), "left")
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .crossJoin(broadcast(obsEnd))
      .select(col("c_mktsegment").as("segment"),
        when(col("death_ts").isNotNull, 1L).otherwise(0L).as("event"),
        when(col("death_ts").isNotNull,
          col("death_ts").cast("long") - col("signup_ts").cast("long"))
          .otherwise(col("end_ts").cast("long") -
            col("signup_ts").cast("long")).as("t_s"))
    val grp = subj.groupBy(col("segment"), col("t_s"))
      .agg(sum(col("event")).as("d"),
        (count(lit(1)) - sum(col("event"))).as("c"))
    val tot = grp.groupBy(col("segment"))
      .agg(sum(col("d") + col("c")).as("n0"))
    val wPrev = Window.partitionBy(col("segment")).orderBy(col("t_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("segment")).orderBy(col("t_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp.join(tot, Seq("segment"))
      .withColumn("n_risk", (col("n0") -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .cast("long"))
      .withColumn("surv",
        when(max(when(col("d") === col("n_risk"), 1).otherwise(0))
          .over(wCum) === 1, lit(0.0))
        .otherwise(exp(sum(
          when(col("d") > 0 && col("d") < col("n_risk"),
            log(lit(1.0) - col("d") / col("n_risk").cast("double")))
            .otherwise(lit(0.0))).over(wCum))))
      .filter(col("d") > 0)
      .select(col("segment"), col("t_s"), col("n_risk"), col("d"),
        round(col("surv"), 6).as("surv"))
      .orderBy(col("segment"), col("t_s"))
  }

  val q95SurvivalSql: String =
    """WITH su AS (
      |  SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), death AS (
      |  SELECT e.user_id, min(e.ts) AS death_ts
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
      |  GROUP BY 1
      |), obs_end AS (SELECT max(ts) AS end_ts FROM events),
      |subj AS (
      |  SELECT c_mktsegment AS segment,
      |    CASE WHEN death_ts IS NOT NULL THEN 1 ELSE 0 END AS event,
      |    CASE WHEN death_ts IS NOT NULL
      |      THEN date_diff('second', signup_ts, death_ts)
      |      ELSE date_diff('second', signup_ts, end_ts) END AS t_s
      |  FROM su LEFT JOIN death USING (user_id)
      |  JOIN customer ON user_id = c_custkey CROSS JOIN obs_end
      |), grp AS (
      |  SELECT segment, t_s, sum(event)::BIGINT AS d,
      |    (count(*) - sum(event))::BIGINT AS c
      |  FROM subj GROUP BY 1, 2
      |), tot AS (
      |  SELECT segment, sum(d + c)::BIGINT AS n0 FROM grp GROUP BY 1
      |), risk AS (
      |  SELECT g.segment, t_s, d,
      |    CAST(n0 - coalesce(sum(d + c) OVER (PARTITION BY g.segment
      |      ORDER BY t_s ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      1 PRECEDING), 0) AS BIGINT) AS n_risk
      |  FROM grp g JOIN tot ON g.segment = tot.segment
      |), km AS (
      |  SELECT segment, t_s, d, n_risk,
      |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY segment ORDER BY t_s) = 1 THEN 0.0
      |      ELSE exp(sum(CASE WHEN d > 0 AND d < n_risk
      |        THEN ln(1 - d / CAST(n_risk AS DOUBLE)) ELSE 0.0 END)
      |        OVER (PARTITION BY segment ORDER BY t_s)) END AS surv
      |  FROM risk
      |)
      |SELECT segment, t_s, n_risk, d, round(surv, 6) AS surv
      |FROM km WHERE d > 0 ORDER BY segment, t_s""".stripMargin

  // ------------------------------------ q96 KMV audience overlap

  /** Audience overlap from KMV sketches — the distinct users behind
    * each event type's high-value slice (value ≥ 95) summarized by
    * [[graft.functions.KmvSketch]], then every audience pair's union
    * AND intersection cardinality estimated from the two k-long
    * summaries alone. This is the set-operation question HLL (q69)
    * cannot answer: intersections of HLLs don't compose, KMV sketches
    * do. Exact counts ride along in the same result so the output
    * itself documents the estimation error.
    *
    * Scale shape: the only full-data pass is the distinct (audience,
    * user) reduction; the sketch aggregation ships ≤ k longs per
    * audience per partition (map-side combine), and all pairwise
    * estimator arithmetic runs on the |audiences|-row aggregated frame
    * with native array functions — at 100 TB the pair stage touches
    * kilobytes. The exact-intersection columns are the oracle anchor
    * (one self-join of the distinct frame); a production caller at
    * scale would drop them and keep only the sketch path.
    *
    * The estimator is deterministic given the md5-based hash60, so the
    * naive SQL restatement (rank ≤ k per audience = the same sketch)
    * reproduces it bit-for-bit — this is hash-gated, not rows+recall.
    */
  val q96KmvOverlap: Q = (s, dir) => {
    val k = 64
    val su = Tables.events(s, dir)
      .filter(col("value") >= 95.0)
      .select(col("event_type").as("seg"), col("user_id"))
      .distinct()
    val sh = su.withColumn(
      "h", graft.ml.HashUtils.hash60(col("user_id").cast("string")))
    val kmv = udaf(new graft.functions.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val sk = sh.groupBy(col("seg"))
      .agg(kmv(col("h")).as("sk"), count(lit(1)).as("n"))
    val ex = su.select(col("seg").as("seg_a"), col("user_id"))
      .join(su.select(col("seg").as("seg_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("exact_inter"))
    // the estimator arithmetic is the shared KmvSketch.overlapEstimates
    // (63·2^60 is exact in a double, so its literal equals the oracle's
    // 63 * pow(2.0, 60) bit-for-bit; nu < k collapses to exact algebra)
    val ov = graft.functions.KmvSketch
      .overlapEstimates(sk.select(col("seg"), col("sk")), "seg", k)
      .select(col("key_a").as("seg_a"), col("key_b").as("seg_b"),
        col("est_union").as("est_u"), col("est_inter").as("est_i"))
    ov.join(sk.select(col("seg").as("seg_a"), col("n").as("n_a")),
        Seq("seg_a"))
      .join(sk.select(col("seg").as("seg_b"), col("n").as("n_b")),
        Seq("seg_b"))
      .join(ex, Seq("seg_a", "seg_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        col("exact_inter"),
        (col("n_a") + col("n_b") - col("exact_inter")).as("exact_union"),
        round(col("est_u"), 6).as("est_union"),
        round(col("est_i"), 6).as("est_inter"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  val q96KmvOverlapSql: String =
    """WITH su AS (
      |  SELECT DISTINCT event_type AS seg, user_id FROM events
      |  WHERE value >= 95.0
      |), sh AS (
      |  SELECT seg, user_id,
      |    ('0x'||substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
      |  FROM su
      |), ranked AS (
      |  SELECT seg, h,
      |    row_number() OVER (PARTITION BY seg ORDER BY h) AS r,
      |    count(*) OVER (PARTITION BY seg) AS n
      |  FROM sh
      |), sk AS (SELECT seg, h FROM ranked WHERE r <= 64),
      |ns AS (SELECT seg, max(n) AS n FROM ranked GROUP BY 1),
      |pairs AS (
      |  SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b
      |  FROM ns a JOIN ns b ON a.seg < b.seg
      |), ex AS (
      |  SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS exact_inter
      |  FROM su a JOIN su b
      |    ON a.user_id = b.user_id AND a.seg < b.seg
      |  GROUP BY 1, 2
      |), uni AS (
      |  SELECT seg_a, seg_b, h,
      |    row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS r
      |  FROM (SELECT DISTINCT p.seg_a, p.seg_b, s.h
      |        FROM pairs p JOIN sk s
      |          ON s.seg = p.seg_a OR s.seg = p.seg_b)
      |), uk AS (
      |  SELECT seg_a, seg_b, max(h) AS u_max, count(*) AS nu
      |  FROM uni WHERE r <= 64 GROUP BY 1, 2
      |), cc AS (
      |  SELECT u.seg_a, u.seg_b, count(*) AS c
      |  FROM uni u
      |  JOIN sk sa ON sa.seg = u.seg_a AND sa.h = u.h
      |  JOIN sk sb ON sb.seg = u.seg_b AND sb.h = u.h
      |  WHERE u.r <= 64 GROUP BY 1, 2
      |)
      |SELECT p.seg_a, p.seg_b, p.n_a::BIGINT AS n_a,
      |  p.n_b::BIGINT AS n_b,
      |  coalesce(ex.exact_inter, 0)::BIGINT AS exact_inter,
      |  (p.n_a + p.n_b - coalesce(ex.exact_inter, 0))::BIGINT
      |    AS exact_union,
      |  round(CASE WHEN uk.nu < 64 THEN uk.nu::DOUBLE
      |    ELSE 63 * pow(2.0, 60) / ((uk.u_max + 1)::DOUBLE) END, 6)
      |    AS est_union,
      |  round(CASE WHEN uk.nu < 64 THEN coalesce(cc.c, 0)::DOUBLE
      |    ELSE (coalesce(cc.c, 0)::DOUBLE / 64) *
      |      (63 * pow(2.0, 60) / ((uk.u_max + 1)::DOUBLE)) END, 6)
      |    AS est_inter
      |FROM pairs p
      |JOIN uk ON p.seg_a = uk.seg_a AND p.seg_b = uk.seg_b
      |LEFT JOIN cc ON p.seg_a = cc.seg_a AND p.seg_b = cc.seg_b
      |LEFT JOIN ex ON p.seg_a = ex.seg_a AND p.seg_b = ex.seg_b
      |ORDER BY 1, 2""".stripMargin

  // -------------------------- q97 next-event transition matrix

  /** First-order Markov transition matrix over each user's event
    * stream: P(next event type | current), with the top-3 most likely
    * next steps per state — the "what does a user do after X"
    * question behind session-based recommendation.
    *
    * Scale shape: the lead() window partitions by user (bounded
    * per-user history, no global sort); the transition counts then
    * collapse to a |types|²-row frame, so the probability and ranking
    * windows run over a handful of rows no matter the input size.
    */
  val q97Transitions: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cnts = Tables.events(s, dir)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val wTot = Window.partitionBy(col("cur"))
    val wRnk = Window.partitionBy(col("cur"))
      .orderBy(col("cnt").desc, col("nxt"))
    cnts
      .withColumn("p", round(col("cnt") / sum(col("cnt")).over(wTot), 6))
      .withColumn("rk", row_number().over(wRnk).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("cur"), col("nxt"), col("cnt"), col("p"), col("rk"))
      .orderBy(col("cur"), col("rk"))
  }

  val q97TransitionsSql: String =
    """WITH tr AS (
      |  SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events
      |), cnts AS (
      |  SELECT cur, nxt, count(*)::BIGINT AS cnt
      |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2
      |), ranked AS (
      |  SELECT cur, nxt, cnt,
      |    round(cnt / CAST(sum(cnt) OVER (PARTITION BY cur) AS DOUBLE),
      |      6) AS p,
      |    row_number() OVER (PARTITION BY cur
      |      ORDER BY cnt DESC, nxt) AS rk
      |  FROM cnts
      |)
      |SELECT cur, nxt, cnt, p, rk FROM ranked
      |WHERE rk <= 3 ORDER BY cur, rk""".stripMargin

  // --------------------------- q98 calibration / lift by decile

  /** Score-decile calibration and lift: users ranked by mean event
    * value, cut into exact global deciles via Corpus.ntileByScore (the
    * bucket-histogram decomposition — no single-task global sort),
    * then per-decile conversion to "made a high-value purchase", lift
    * vs the base rate, and cumulative capture. The model-evaluation
    * companion of q90's AUC: AUC says whether the score ranks, this
    * says where the cutoff pays.
    *
    * The score is rounded to 6 dp BEFORE bucketing so both engines
    * bucket identical doubles; the decile frame is 10 rows, so the
    * cumulative window is driver-trivial (the same benign
    * no-partition window as ns33's histogram).
    */
  val q98Calibration: Q = (s, dir) => {
    val su = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(round(avg(col("value")), 6).as("score"),
        max(when(col("event_type") === "purchase" &&
          col("value") >= 95.0, 1L).otherwise(0L)).as("pos"))
    val tiled = graft.ml.Corpus.ntileByScore(su, "score", "user_id", 10)
    val agg = tiled.groupBy(col("tile"))
      .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
    val tot = agg.agg(sum(col("n_users")).as("nt"),
      sum(col("n_pos")).as("pt"))
    val wCum = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.crossJoin(broadcast(tot))
      .select(col("tile"), col("n_users"), col("n_pos"),
        round(col("n_pos") / col("n_users").cast("double"), 6).as("cvr"),
        round((col("n_pos") / col("n_users").cast("double")) /
          (col("pt") / col("nt").cast("double")), 6).as("lift"),
        round(sum(col("n_pos")).over(wCum) / col("pt").cast("double"), 6)
          .as("capture"))
      .orderBy(col("tile"))
  }

  val q98CalibrationSql: String =
    """WITH su AS (
      |  SELECT user_id, round(avg(value), 6) AS score,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 95.0
      |      THEN 1 ELSE 0 END)::BIGINT AS pos
      |  FROM events GROUP BY 1
      |), tiled AS (
      |  SELECT pos, ntile(10) OVER (ORDER BY score DESC,
      |    ('0x'||substr(md5(user_id::VARCHAR),1,15))::BIGINT,
      |    user_id)::INT AS tile
      |  FROM su
      |), agg AS (
      |  SELECT tile, count(*)::BIGINT AS n_users,
      |    sum(pos)::BIGINT AS n_pos
      |  FROM tiled GROUP BY 1
      |), tot AS (
      |  SELECT sum(n_users)::BIGINT AS nt, sum(n_pos)::BIGINT AS pt
      |  FROM agg
      |)
      |SELECT tile, n_users, n_pos,
      |  round(n_pos / CAST(n_users AS DOUBLE), 6) AS cvr,
      |  round((n_pos / CAST(n_users AS DOUBLE)) /
      |    (pt / CAST(nt AS DOUBLE)), 6) AS lift,
      |  round(sum(n_pos) OVER (ORDER BY tile ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW) / CAST(pt AS DOUBLE), 6)
      |    AS capture
      |FROM agg CROSS JOIN tot ORDER BY tile""".stripMargin

  // ----------------------- q99 logistic regression (gradient descent)

  /** Binary logistic fit of order status on standardized total price —
    * the engine's iterative-optimization flagship
    * (Classify.logisticRegression): 15 full-batch GD steps, each one
    * aggregate pass with the coefficients inlined as literals, only a
    * 2-double gradient row ever reaching the driver. Rows-gated (the
    * loop is not SQL-expressible); ClassifySpec gates exactness
    * against an independent naive implementation and separability.
    */
  val q99Logit: Q = (s, dir) =>
    graft.ml.Classify.logisticRegression(
      Tables.orders(s, dir).select(col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0)
          .as("label")),
      "label", Seq("o_totalprice"))

  /** The logistic SERVING chain, hash-gated (the fitted-literals
    * graduation, q99's twin of ns42b): run the REAL 15-step fit, then
    * score every order with the fit's ROUNDED model row
    * ([[graft.ml.Classify.logisticScore]] — map-only, model as plan
    * literals). The oracle restates σ(w0 + w1·(x−mu)/sd) with the
    * sf0.01 row pinned ([[graft.FittedModels]]), so coefficient drift
    * in the fit fails the gate loudly and the scoring math itself is
    * cross-engine-proven; only the GD loop stays rows+spec.
    */
  val q99bLogitScore: Q = (s, dir) => {
    val fit = graft.ml.Classify.logisticRegression(
      Tables.orders(s, dir).select(col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0)
          .as("label")),
      "label", Seq("o_totalprice")).head()
    graft.ml.Classify.logisticScore(
      Tables.orders(s, dir), "o_orderkey",
      fit.getAs[Double]("w0"),
      Seq(("o_totalprice", fit.getAs[Double]("w1"),
        fit.getAs[Double]("mu_o_totalprice"),
        fit.getAs[Double]("sd_o_totalprice"))))
      .orderBy(col("o_orderkey"))
  }

  /** q99's pinned-fit hash gate (the ns42/ns49 graduation): the GD
    * loop cannot restate, but its rounded model row is deterministic
    * — the oracle is the pinned row, the scoring semantics gate is
    * q99b, and exactness-vs-naive stays in ClassifySpec.
    */
  val q99LogitSql: String = {
    import graft.FittedModels._
    def d(x: Double) = java.lang.Double.toString(x) + "::DOUBLE"
    s"""SELECT ${logitN}::BIGINT AS n, ${d(logitW0)} AS w0,
      |  ${d(logitW1)} AS w1, ${d(logitMu)} AS mu_o_totalprice,
      |  ${d(logitSd)} AS sd_o_totalprice, ${d(logitLogLoss)} AS log_loss,
      |  ${d(logitAccuracy)} AS accuracy""".stripMargin
  }

  val q99bLogitScoreSql: String = {
    val m = s"(${graft.FittedModels.logitW0} + " +
      s"${graft.FittedModels.logitW1} * ((o_totalprice::DOUBLE - " +
      s"${graft.FittedModels.logitMu}) / ${graft.FittedModels.logitSd}))"
    s"""SELECT o_orderkey,
      |  round(1.0::DOUBLE / (1.0::DOUBLE + exp(-$m)), 6) AS p,
      |  (1.0::DOUBLE / (1.0::DOUBLE + exp(-$m)) >= 0.5)::INT AS pred
      |FROM orders ORDER BY o_orderkey""".stripMargin
  }

  // -------------------- q100 Kolmogorov–Smirnov two-sample drift test

  /** Exact two-sample KS: D = sup over x of |F_a(x) − F_b(x)| between
    * the ECDFs of `v` where `ia` is true vs false. Input needs columns
    * (v: double, ia: boolean). Output is one row: n_a, n_b, d_stat,
    * ks_scaled = D·sqrt(n_a·n_b/(n_a+n_b)), and the asymptotic
    * two-sided p ≈ min(1, 2·exp(−2·ks_scaled²)) — PSI's (q85)
    * distribution-free exact sibling for drift detection.
    *
    * The sup over a total order is the house global-order problem
    * (SURVEY §9): naively one cumulative window over every distinct
    * value — a single task sorting the domain. Decomposition: distinct
    * values aggregate first (per-value n_a/n_b), quantize into 1024
    * fixed-width buckets off a broadcast (min, max) row, a 1024-row
    * histogram window yields each bucket's starting cumulative counts,
    * and the per-value cumulative sums run only WITHIN buckets —
    * thousands-way parallel, bit-identical to the naive window (the
    * oracle states the naive form). The bucket ids never surface, so
    * float boundary placement cannot affect the result. Division of
    * exact integer cumulative counts is IEEE-identical on both
    * engines; only exp carries a ulp, absorbed by the 6 dp round.
    * An empty side leaves the statistic undefined and surfaces as the
    * IEEE NaN (0/0 on the empty group's ECDF), never a wrong number.
    */
  def ksTwoSample(xs: DataFrame): DataFrame = {
    val nBuckets = 1024
    val pv = xs.groupBy(col("v")).agg(
      sum(when(col("ia"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("ia"), 1L).otherwise(0L)).as("nb"))
    val bounds = pv.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // degenerate single-value domains collapse into bucket 0 via the
    // width floor (no divide-by-zero, result unaffected)
    val width = greatest((col("mx") - col("mn")) / lit(nBuckets.toDouble),
      lit(java.lang.Double.MIN_NORMAL))
    val bucketed = pv.crossJoin(broadcast(bounds))
      .withColumn("_bkt", least(
        floor((col("v") - col("mn")) / width).cast("long"),
        lit(nBuckets - 1L)))
      .drop("mn", "mx")
    val wOff = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤1024 rows: the no-partition window is constant-size (ns33's
    // histogram precedent), never data-sized
    val offsets = bucketed.groupBy(col("_bkt"))
      .agg(sum(col("na")).as("_ba"), sum(col("nb")).as("_bb"))
      .select(col("_bkt"),
        coalesce(sum(col("_ba")).over(wOff), lit(0L)).as("_offa"),
        coalesce(sum(col("_bb")).over(wOff), lit(0L)).as("_offb"))
    val tot = pv.agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
    val wCum = Window.partitionBy(col("_bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scaled = bucketed.join(broadcast(offsets), Seq("_bkt"))
      .select(col("v"),
        (sum(col("na")).over(wCum) + col("_offa")).as("ca"),
        (sum(col("nb")).over(wCum) + col("_offb")).as("cb"))
      .crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(col("ca") / col("n_a").cast("double") -
          col("cb") / col("n_b").cast("double"))).as("d"))
    scaled.select(col("n_a"), col("n_b"),
        round(col("d"), 6).as("d_stat"),
        // n_a·n_b multiplies as DOUBLE: two ~3e9-row sides would wrap
        // a long product silently (the BandJoinRewrite overflow rule)
        round(col("d") * sqrt(col("n_a").cast("double") * col("n_b") /
          (col("n_a") + col("n_b")).cast("double")), 6).as("ks_scaled"),
        round(least(lit(1.0), lit(2.0) * exp(lit(-2.0) *
          pow(col("d") * sqrt(col("n_a").cast("double") * col("n_b") /
            (col("n_a") + col("n_b")).cast("double")), 2))), 6)
          .as("p_approx"))
  }

  /** Order-value distribution drift between the BUILDING and MACHINERY
    * market segments (exact KS over o_totalprice). */
  val q100KsDrift: Q = (s, dir) =>
    ksTwoSample(Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("o_totalprice").as("v"),
        (col("c_mktsegment") === "BUILDING").as("ia")))

  val q100KsDriftSql: String =
    """WITH xs AS (
      |  SELECT o_totalprice AS v, (c_mktsegment = 'BUILDING') AS ia
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |), pv AS (
      |  SELECT v,
      |    sum(CASE WHEN ia THEN 1 ELSE 0 END)::BIGINT AS na,
      |    sum(CASE WHEN NOT ia THEN 1 ELSE 0 END)::BIGINT AS nb
      |  FROM xs GROUP BY 1
      |), cum AS (
      |  SELECT
      |    sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS ca,
      |    sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cb
      |  FROM pv
      |), tot AS (
      |  SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b FROM pv
      |), d AS (
      |  SELECT n_a, n_b,
      |    max(abs(ca / CAST(n_a AS DOUBLE) - cb / CAST(n_b AS DOUBLE)))
      |      AS dd
      |  FROM cum CROSS JOIN tot GROUP BY 1, 2
      |)
      |SELECT n_a, n_b, round(dd, 6) AS d_stat,
      |  round(dd * sqrt(n_a::DOUBLE * n_b / CAST(n_a + n_b AS DOUBLE)),
      |    6) AS ks_scaled,
      |  round(least(1.0, 2.0 * exp(-2.0 * pow(dd * sqrt(n_a::DOUBLE *
      |    n_b / CAST(n_a + n_b AS DOUBLE)), 2))), 6) AS p_approx
      |FROM d""".stripMargin

  // --------------------------- q101 multi-source BFS / reachability

  /** Minimum co-purchase distance from "anchor" parts (every 500th
    * part key) to every part reachable within 4 hops over the STRONG
    * co-purchase graph — edges kept only when the pair shares ≥ 2
    * orders ([[Graph.coOccurrenceEdgesMinSupport]]), which turns the
    * dense accidental-co-occurrence clique soup into a sparse signal
    * graph where hop distance means something. The oracle unrolls the
    * same 4 frontier expansions as chained CTEs and takes min(depth)
    * per node — fixed depth is what keeps BFS ANSI-restatable.
    */
  val q101Reachability: Q = (s, dir) => {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val strong = Graph.coOccurrenceEdgesMinSupport(op, "ok", "pk",
      minSupport = 2L)
    val seeds = op.select(col("pk").as("node")).distinct()
      .filter(col("node") % 500 === 0)
    Graph.bfsHops(strong, seeds, maxDepth = 4)
      .withColumnRenamed("node", "part_key")
      .orderBy(col("part_key"))
  }

  val q101ReachabilitySql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e0 AS (
      |  SELECT a.pk AS p1, b.pk AS p2
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), edges AS (
      |  SELECT p1 AS s, p2 AS t FROM e0
      |  UNION ALL SELECT p2, p1 FROM e0
      |), f0 AS (
      |  SELECT DISTINCT pk AS node, 0 AS d FROM op WHERE pk % 500 = 0
      |), f1 AS (
      |  SELECT DISTINCT t AS node, 1 AS d
      |  FROM f0 JOIN edges ON s = f0.node
      |), f2 AS (
      |  SELECT DISTINCT t AS node, 2 AS d
      |  FROM f1 JOIN edges ON s = f1.node
      |), f3 AS (
      |  SELECT DISTINCT t AS node, 3 AS d
      |  FROM f2 JOIN edges ON s = f2.node
      |), f4 AS (
      |  SELECT DISTINCT t AS node, 4 AS d
      |  FROM f3 JOIN edges ON s = f3.node
      |), allf AS (
      |  SELECT * FROM f0 UNION ALL SELECT * FROM f1
      |  UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
      |  UNION ALL SELECT * FROM f4
      |)
      |SELECT node AS part_key, min(d)::INT AS hops
      |FROM allf GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------ q102 bounded weighted shortest paths

  /** Minimum-cost co-purchase distance from the q101 anchor parts to
    * every part reachable within 4 edges, where an edge costs
    * `ceil(10 / support)` — strong pairs (many shared orders) are
    * cheap to cross, marginal ones (support 2) cost 5 — over the same
    * strong co-purchase graph as q101 ([[Graph
    * .coOccurrenceEdgesWithSupport]], support ≥ 2). Weighted distance
    * ranks "how commercially close" two parts are, where q101's hop
    * count only ranks "whether". Costs are integers so every distance
    * is exact arithmetic (no float-sum ordering in the gate), and the
    * division is IEEE-identical in both engines so the ceil never
    * straddles. The engine side is [[Graph.shortestPathsBounded]]
    * (frontier-pruned Bellman-Ford); the oracle unrolls the UNPRUNED
    * textbook form — 4 chained relax-all CTEs with a running min —
    * which the frontier pruning provably equals (see the operator's
    * Scaladoc), so hash-equality gates the pruning argument itself.
    */
  val q102ShortestPaths: Q = (s, dir) => {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val weighted = Graph.coOccurrenceEdgesWithSupport(op, "ok", "pk",
        minSupport = 2L)
      .select(col("p1"), col("p2"),
        ceil(lit(10.0) / col("support")).as("w"))
    val seeds = op.select(col("pk").as("node")).distinct()
      .filter(col("node") % 500 === 0)
    Graph.shortestPathsBounded(weighted, seeds, rounds = 4)
      .withColumnRenamed("node", "part_key")
      .orderBy(col("part_key"))
  }

  val q102ShortestPathsSql: String =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), e0 AS (
      |  SELECT a.pk AS p1, b.pk AS p2,
      |    CAST(ceil(10.0::DOUBLE / count(*)) AS BIGINT) AS w
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), edges AS (
      |  SELECT p1 AS s, p2 AS t, w FROM e0
      |  UNION ALL SELECT p2, p1, w FROM e0
      |), d0 AS (
      |  SELECT DISTINCT pk AS node, 0::BIGINT AS dist
      |  FROM op WHERE pk % 500 = 0
      |), d1 AS (
      |  SELECT node, min(dist)::BIGINT AS dist FROM (
      |    SELECT node, dist FROM d0
      |    UNION ALL SELECT t, dist + w FROM d0 JOIN edges ON s = d0.node
      |  ) GROUP BY 1
      |), d2 AS (
      |  SELECT node, min(dist)::BIGINT AS dist FROM (
      |    SELECT node, dist FROM d1
      |    UNION ALL SELECT t, dist + w FROM d1 JOIN edges ON s = d1.node
      |  ) GROUP BY 1
      |), d3 AS (
      |  SELECT node, min(dist)::BIGINT AS dist FROM (
      |    SELECT node, dist FROM d2
      |    UNION ALL SELECT t, dist + w FROM d2 JOIN edges ON s = d2.node
      |  ) GROUP BY 1
      |), d4 AS (
      |  SELECT node, min(dist)::BIGINT AS dist FROM (
      |    SELECT node, dist FROM d3
      |    UNION ALL SELECT t, dist + w FROM d3 JOIN edges ON s = d3.node
      |  ) GROUP BY 1
      |)
      |SELECT node AS part_key, dist FROM d4 ORDER BY 1""".stripMargin

  // ------------------------------------ q103 embedding-space drift

  /** Embedding-distribution drift ([[graft.ml.Similarity
    * .embeddingDrift]]): the label < 5 half of the embedding corpus as
    * the reference snapshot, the label ≥ 5 half as the "new crawl" —
    * labels cluster in embedding space (ns48's Rocchio separates
    * them), so the two halves genuinely differ and the per-direction
    * PSI terms carry real signal. Four fixed JL directions; the
    * oracle inlines the same literal planes (the ns45 pattern),
    * re-derives the reference deciles with quantile_cont, and
    * restates the binning + PSI arithmetic — so the drift report is
    * hash-gated end to end.
    */
  val q103EmbedDrift: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    graft.ml.Similarity.embeddingDrift(
      emb.filter(col("label") < 5), emb.filter(col("label") >= 5),
      outDim = 4, dim = 64)
  }

  val q103EmbedDriftSql: String = {
    val planes = graft.ml.Similarity.projectionPlanes(4, 64)
    val legs = (side: String) => planes.zipWithIndex.map {
      case (p, i) =>
        val lits = p.map(v => java.lang.Double.toString(v)).mkString(", ")
        s"""  SELECT $i AS proj_dim,
           |    round(list_dot_product(embedding::DOUBLE[], [$lits]), 6)
           |      AS x FROM $side""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ref0 AS (
      |  SELECT embedding FROM embeddings WHERE label < 5
      |), cur0 AS (
      |  SELECT embedding FROM embeddings WHERE label >= 5
      |), pr AS (
      |${legs("ref0")}
      |), pc AS (
      |${legs("cur0")}
      |), e AS (
      |  SELECT proj_dim, quantile_cont(x,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      |  FROM pr GROUP BY 1
      |), rb AS (
      |  SELECT pr.proj_dim,
      |    len(list_filter(qs, v -> v < x))::INT AS bin,
      |    count(*)::BIGINT AS ref_cnt
      |  FROM pr JOIN e USING (proj_dim) GROUP BY 1, 2
      |), cb AS (
      |  SELECT pc.proj_dim,
      |    len(list_filter(qs, v -> v < x))::INT AS bin,
      |    count(*)::BIGINT AS cur_cnt
      |  FROM pc JOIN e USING (proj_dim) GROUP BY 1, 2
      |), t AS (
      |  SELECT r.proj_dim, r.n_ref, c.n_cur FROM
      |    (SELECT proj_dim, count(*)::DOUBLE AS n_ref FROM pr
      |     GROUP BY 1) r
      |  JOIN (SELECT proj_dim, count(*)::DOUBLE AS n_cur FROM pc
      |     GROUP BY 1) c ON r.proj_dim = c.proj_dim
      |)
      |SELECT t.proj_dim, coalesce(rb.bin, cb.bin) AS bin,
      |  coalesce(ref_cnt, 0) AS ref_cnt,
      |  coalesce(cur_cnt, 0) AS cur_cnt,
      |  round(coalesce(ref_cnt, 0) / n_ref, 6) AS p_ref,
      |  round(coalesce(cur_cnt, 0) / n_cur, 6) AS p_cur,
      |  round((coalesce(cur_cnt, 0) / n_cur -
      |    coalesce(ref_cnt, 0) / n_ref) *
      |    ln(greatest(coalesce(cur_cnt, 0) / n_cur, 0.000001) /
      |      greatest(coalesce(ref_cnt, 0) / n_ref, 0.000001)), 6)
      |    AS psi_term
      |FROM rb FULL JOIN cb
      |  ON rb.proj_dim = cb.proj_dim AND rb.bin = cb.bin
      |JOIN t ON t.proj_dim = coalesce(rb.proj_dim, cb.proj_dim)
      |ORDER BY 1, 2""".stripMargin
  }

  def all: Map[String, Q] = Map(
    "q89_regression" -> q89Regression,
    "q90_auc" -> q90Auc,
    "q91_conversion" -> q91Conversion,
    "q92_chi_square" -> q92ChiSquare,
    "q93_triangles" -> q93Triangles,
    "q93b_triangles_sampled" -> q93bTrianglesSampled,
    "q94_pagerank" -> q94PageRank,
    "q95_survival" -> q95Survival,
    "q96_kmv_overlap" -> q96KmvOverlap,
    "q97_transitions" -> q97Transitions,
    "q98_calibration" -> q98Calibration,
    "q99_logit" -> q99Logit,
    "q99b_logit_score" -> q99bLogitScore,
    "q100_ks_drift" -> q100KsDrift,
    "q101_reachability" -> q101Reachability,
    "q102_shortest_paths" -> q102ShortestPaths,
    "q103_embed_drift" -> q103EmbedDrift,
  )

  def oracles: Map[String, String] = Map(
    "q89_regression" -> q89RegressionSql,
    "q90_auc" -> q90AucSql,
    "q91_conversion" -> q91ConversionSql,
    "q92_chi_square" -> q92ChiSquareSql,
    "q93_triangles" -> q93TrianglesSql,
    "q93b_triangles_sampled" -> q93bTrianglesSampledSql,
    "q94_pagerank" -> q94PageRankSql,
    "q95_survival" -> q95SurvivalSql,
    "q96_kmv_overlap" -> q96KmvOverlapSql,
    "q97_transitions" -> q97TransitionsSql,
    "q98_calibration" -> q98CalibrationSql,
    "q99_logit" -> q99LogitSql,
    "q99b_logit_score" -> q99bLogitScoreSql,
    "q100_ks_drift" -> q100KsDriftSql,
    "q101_reachability" -> q101ReachabilitySql,
    "q102_shortest_paths" -> q102ShortestPathsSql,
    "q103_embed_drift" -> q103EmbedDriftSql,
  )
}
