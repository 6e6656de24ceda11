package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The operator-inventory query registry (SURVEY.md §2).
  *
  * Each entry is a named DataFrame query over the driver testdata plus —
  * where expressible — an equivalent DuckDB oracle SQL string. Names,
  * aliases, ordering and rounding are deliberately identical on both
  * sides so the driver's column-sorted hash compare matches
  * (FIXTURES.md determinism rules: ORDER BY unique keys, rounded
  * floats, UTC, sorted arrays before joins).
  *
  * Scale notes are inline per query; the common posture: only the
  * fixed-size dims (region: 5 rows, nation: 25 rows) carry broadcast
  * hints — customer/supplier/part/orders grow with scale factor, so
  * their join strategies are left to AQE's runtime size estimates
  * (broadcast while small, shuffled-hash/sort-merge beyond).
  * Aggregations rely on partial+final hash agg (map-side combine), and
  * filters/projections sit directly on the parquet scan so pushdown +
  * pruning reach the reader.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- aggs

  /** A1/A4 + TPC-H Q1 shape: filtered scan → partial+final hash agg.
    * Six output groups regardless of input size — shuffle is tiny.
    */
  val q1Agg: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1997-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= '1997-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** S3/F1: filtered + projected scan. Both predicate and projection
    * push to the parquet reader (PushedFilters / ReadSchema).
    */
  val q2FilteredScan: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("quantity"),
        round(col("l_extendedprice"), 2).as("extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q2FilteredScanSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(l_quantity, 2) AS quantity,
      |  round(l_extendedprice, 2) AS extendedprice
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** F2/F3: event-type routing predicate (the reference's
    * `type in ['item.update','item.create']`, PodioApiGateway.py:120).
    */
  val q3EventFilter: Q = (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase") && col("value") > 90)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_id"))

  val q3EventFilterSql: String =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value
      |FROM events
      |WHERE event_type IN ('click', 'purchase') AND value > 90
      |ORDER BY event_id""".stripMargin

  /** P3/X8/X9: composite-key build + split (the reference's
    * `f'{space_id}.{app_id}'`, PodioApiWrapper.py:201,260).
    */
  val q4CompositeKey: Q = (s, dir) =>
    Tables.nation(s, dir)
      .select(col("n_nationkey"),
        concat_ws(".", col("n_regionkey"), col("n_nationkey"))
          .as("space_app_id"),
        col("n_name"))
      .withColumn("region_part",
        element_at(split(col("space_app_id"), "\\."), 1).cast("int"))
      .orderBy(col("n_nationkey"))

  val q4CompositeKeySql: String =
    """SELECT n_nationkey,
      |  n_regionkey || '.' || n_nationkey AS space_app_id,
      |  n_name,
      |  CAST(string_split(n_regionkey || '.' || n_nationkey, '.')[1] AS INT) AS region_part
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** P4: projection with default (coalesce), the reference's
    * `return_type or type` (PodioApiWrapper.py:226-234).
    */
  val q5ProjDefault: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
        .as("status_label"))
      .groupBy(col("status_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_label"))

  val q5ProjDefaultSql: String =
    """SELECT coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY status_label""".stripMargin

  // --------------------------------------------------------------- joins

  /** J1: stream→store lookup/enrichment join (the reference's per-event
    * item fetch, PodioApiGateway.py:124). No broadcast hint: customer
    * grows linearly with scale factor (it is NOT a fixed-size dim like
    * region/nation), so a forced broadcast would OOM at 100× — AQE
    * picks broadcast-hash while customer is small and shuffled-hash /
    * sort-merge once it isn't.
    */
  val q6LookupJoin: Q = (s, dir) =>
    Tables.events(s, dir)
      .join(Tables.customer(s, dir),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_name"), col("c_mktsegment"),
        col("event_type"))
      .orderBy(col("event_id"))

  val q6LookupJoinSql: String =
    """SELECT event_id, c_name, c_mktsegment, event_type
      |FROM events JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin

  /** Materialize a frame as a catalog-registered bucketed table once
    * per session (idempotent by table name — Bench's repeat runs and
    * every later query in the same JVM reuse the first write) and
    * return it. The name embeds the source dir so scale factors never
    * collide in the warehouse.
    */
  private def bucketedTable(s: SparkSession, dir: String, base: String,
      df: => DataFrame, key: String, buckets: Int): DataFrame = {
    val name = (base + "_" + dir).replaceAll("[^A-Za-z0-9]+", "_")
    if (!s.catalog.tableExists(name)) {
      // the in-memory catalog dies with the JVM but the warehouse
      // directory survives — a stale location from a previous run
      // would fail the managed-table create, so clear it first
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        name.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.sources.Layout.writeBucketed(df, name, key, buckets)
    }
    s.table(name)
  }

  /** q6 over [[graft.sources.Layout.writeBucketed]] tables — the
    * co-located-join layout proof at registry/bench scale (previously
    * only LayoutSpec showed it, at toy scale): events and customer are
    * bucketed 8-ways on the join key, so the join reads co-numbered
    * bucket files with NO Exchange on either side — at 1000 executors
    * that is the difference between an all-to-all of the fact table
    * and none. The `merge` hint pins sort-merge: at bench SF AQE would
    * broadcast the small side, but the regime this query demonstrates
    * is both-sides-too-big-to-broadcast, where bucketing is what
    * deletes the shuffle. Same oracle as q6: layout must never change
    * results.
    */
  val q6bBucketedJoin: Q = (s, dir) => {
    val ev = bucketedTable(s, dir, "events_bkt",
      Tables.events(s, dir), "user_id", 8)
    val cust = bucketedTable(s, dir, "customer_bkt",
      Tables.customer(s, dir).withColumnRenamed("c_custkey", "user_id"),
      "user_id", 8)
    ev.hint("merge").join(cust, Seq("user_id"))
      .select(col("event_id"), col("c_name"), col("c_mktsegment"),
        col("event_type"))
      .orderBy(col("event_id"))
  }

  /** J2: catalog correlation — the org→space→app 3-level nested loop
    * (PodioApiWrapper.py:248-267) as chained broadcast equi-joins.
    */
  val q7CatalogJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        // exact decimal sum + ONE double division gives both engines
        // the identical double; the 1e-9 nudge then keeps round()
        // off .xx5 boundaries, where Spark (HALF_UP on the shortest
        // decimal repr) and DuckDB (round of the binary value)
        // structurally disagree — and avg of 2-decimal money over
        // small groups lands on those boundaries often
        round(sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
          / count(lit(1)) + lit(1e-9), 2).as("avg_acctbal"))
      .orderBy(col("r_name"), col("n_name"))

  val q7CatalogJoinSql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |    / count(*) + 1e-9, 2) AS avg_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** J3: fact⋈fact revenue rollup — part is SF-proportional, so the
    * join strategy is left to AQE (broadcast while small, shuffled
    * beyond that); agg is partial+final.
    */
  val q8RevenueBrand: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  val q8RevenueBrandSql: String =
    """SELECT p_brand,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** J4: anti-join — queue coalescing shape (PodioApiGateway.py:144-145):
    * customers with no high-value order.
    */
  val q9AntiJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  // NOT EXISTS, not NOT IN: NOT IN returns zero rows if the subquery
  // ever yields a NULL key, silently diverging from left_anti — the
  // null-safe form states the anti-join semantics the Spark side has
  val q9AntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |     AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Semi-join: customers having at least one high-value order. */
  val q10SemiJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val q10SemiJoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Cross join (tiny dims only — a cartesian product is only sane when
    * one side fits in a broadcast).
    */
  val q11CrossJoin: Q = (s, dir) =>
    Tables.region(s, dir).crossJoin(broadcast(Tables.nation(s, dir)))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("r_name"))

  val q11CrossJoinSql: String =
    """SELECT r_name, count(*) AS n_pairs
      |FROM region CROSS JOIN nation
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Theta (non-equi band) join, written DECLARATIVELY — the
    * [[graft.plans.BandJoinRewrite]] optimizer rule recognizes the
    * `abs(x - y) < w` pattern and rewrites it to the bucketed
    * equi-join automatically (PLANS.md section 1 shows the executed
    * rewritten plan: Generate + hash join, no nested loop). q12b is
    * the same bucketing reached explicitly through the
    * RangeJoin.bandJoin API; both gate against the same oracle. No
    * broadcast hint: supplier is SF-proportional (q6/q40/q48/q49
    * reasoning).
    */
  val q12ThetaJoin: Q = (s, dir) =>
    Tables.part(s, dir)
      .join(Tables.supplier(s, dir),
        abs((col("p_retailprice") - lit(900.0)) - (col("s_acctbal") % 100)) < 5)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_parts_in_band"))
      .orderBy(col("s_suppkey"))

  val q12ThetaJoinSql: String =
    """SELECT s_suppkey, count(*) AS n_parts_in_band
      |FROM part JOIN supplier
      |  ON abs((p_retailprice - 900.0) - (s_acctbal % 100)) < 5
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /** Column profiling (graft.meta.Profile): per-column row/non-null/
    * distinct counts and min/max over the customer table — the
    * data-integrity audit the reference's migration story centers on.
    * One scan, stack-unpivoted.
    */
  val q55Profile: Q = (s, dir) =>
    graft.meta.Profile.profile(Tables.customer(s, dir),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"))
      .orderBy(col("column_name"))

  val q55ProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count($c) AS n_nonnull, count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  min($c)::VARCHAR AS min_str, max($c)::VARCHAR AS max_str
         |FROM customer""".stripMargin
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Referential-integrity audit (graft.meta.Integrity): orphan counts
    * for every FK edge of the star schema — Profile's sibling in the
    * data-integrity toolkit.
    */
  val q56RefIntegrity: Q = (s, dir) =>
    graft.meta.Integrity.audit(s, dir)
      .orderBy(col("relation"))

  val q56RefIntegritySql: String = {
    def one(rel: String, child: String, ck: String, parent: String,
        pk: String) =
      s"""SELECT '$rel' AS relation,
         |  (SELECT count(*) FROM $child WHERE $ck IS NOT NULL) AS n_child_rows,
         |  (SELECT count(*) FROM $child c WHERE c.$ck IS NOT NULL
         |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
         |    AS n_orphans""".stripMargin
    Seq(
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      one("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      one("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      one("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      one("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      one("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** Key-uniqueness audit (graft.meta.Integrity.keyAudit): duplicate
    * primary keys per table — the incoming half of the q56 edge audit.
    */
  val q57KeyAudit: Q = (s, dir) =>
    graft.meta.Integrity.keyAudit(s, dir)
      .orderBy(col("table_name"))

  val q57KeyAuditSql: String = {
    def one(table: String, key: String) =
      s"""SELECT '$table' AS table_name,
         |  count(*) AS n_dup_keys,
         |  coalesce(sum(n - 1), 0)::BIGINT AS n_surplus_rows
         |FROM (SELECT $key, count(*) AS n FROM $table
         |      WHERE $key IS NOT NULL GROUP BY $key HAVING count(*) > 1)""".stripMargin
    Seq(
      ("region", "r_regionkey"), ("nation", "n_nationkey"),
      ("customer", "c_custkey"), ("supplier", "s_suppkey"),
      ("part", "p_partkey"), ("orders", "o_orderkey"),
      ("events", "event_id"), ("documents", "doc_id"),
      ("embeddings", "vec_id"))
      .map { case (t, k) => one(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** q12's band predicate through the bucketed range join
    * (graft.operators.RangeJoin) — the scale path promised in q12's
    * doc: an equi-join on width-quantized buckets + residual filter
    * instead of a broadcast nested loop. Gated against the SAME oracle
    * as q12; identical output is the operator's contract.
    */
  val q12bRangeJoin: Q = (s, dir) =>
    graft.operators.RangeJoin.bandJoin(
      Tables.part(s, dir), col("p_retailprice") - lit(900.0),
      Tables.supplier(s, dir), col("s_acctbal") % 100, width = 5.0)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_parts_in_band"))
      .orderBy(col("s_suppkey"))

  /** Left outer join with empty-group preservation. */
  val q13OuterJoin: Q = (s, dir) =>
    Tables.nation(s, dir)
      .join(Tables.customer(s, dir),
        col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_name"))

  val q13OuterJoinSql: String =
    """SELECT n_name, count(c_custkey) AS n_customers
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------- aggregation variants

  /** count(DISTINCT) — expands to two-phase agg in Spark. */
  val q14DistinctAgg: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag"))

  val q14DistinctAggSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP grouping sets (A3's nested grouping generalized). */
  val q15Rollup: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"), col("n"))
      .orderBy(col("region"), col("nation"))

  val q15RollupSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation, count(*) AS n
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** CUBE grouping sets. */
  val q16Cube: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q16CubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** A5: min_by/max_by — oldest/newest event per user (the queue-head
    * scan, PodioApiGateway.py:190, grouped per key).
    */
  val q17MinBy: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("first_event_id"),
        max_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("last_event_id"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  // event_id is part of the ordering struct so tied timestamps resolve
  // deterministically in both engines (FIXTURES.md determinism rule).
  // DuckDB min_by has no struct ordering overload; lexicographic
  // struct min/max + field extraction is equivalent.
  val q17MinBySql: String =
    """SELECT user_id,
      |  (min({'ts': ts, 'e': event_id})).e AS first_event_id,
      |  (max({'ts': ts, 'e': event_id})).e AS last_event_id,
      |  count(*) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** A6: sorted collect — deterministic string_agg (X2 + determinism
    * rule: sort before joining).
    */
  val q18StringAgg: Q = (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(concat_ws(",", array_sort(collect_set(col("c_mktsegment"))))
        .as("segments"))
      .orderBy(col("c_nationkey"))

  val q18StringAggSql: String =
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Statistical aggregates. */
  val q19StatsAgg: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"))
      .orderBy(col("l_returnflag"))

  val q19StatsAggSql: String =
    """SELECT l_returnflag, round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price,
      |  round(stddev_samp(l_extendedprice), 2) AS sd_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HLL approximate distinct — no exact oracle (approx result); the
    * driver records a rows-only check. At 100 TB this replaces exact
    * countDistinct wherever a ±2% answer is acceptable: one pass, no
    * distinct expansion.
    */
  val q19bApproxDistinct: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  // ------------------------------------------------------------- windows

  /** W1: the SCD2 current-flag window (PodioApiGateway.py:128-137). */
  val q20Scd2Current: Q = (s, dir) =>
    graft.scd.Versioning.withCurrentFlag(
      Tables.events(s, dir), "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))

  val q20Scd2CurrentSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1 THEN 1 ELSE 0 END AS current
      |FROM events ORDER BY event_id""".stripMargin

  /** The hot-key route for the current flag
    * ([[graft.scd.Versioning.withCurrentFlagAgg]]): a per-key window
    * serializes one key's whole history on a single core, so a
    * business key holding a constant fraction of events (the
    * `--skew-events` 45%-hot regime) caps the wall clock at that
    * key's size; the aggregate+join form combines the hot key
    * map-side and parallelizes fully. Gated on q20's exact oracle —
    * identical output is the contract (version pairs are unique per
    * key by the merge path's event_id dedup).
    */
  val q20bScd2CurrentAgg: Q = (s, dir) =>
    graft.scd.Versioning.withCurrentFlagAgg(
      Tables.events(s, dir), "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))

  /** Hard-forget for the SCD2 world ([[graft.scd.Versioning.forget]]
    * — r15 verdict item 3): the persisted version-history table is
    * built once (q20's current-flag pipeline), then a GDPR erasure of
    * every `user_id % 13 = 5` key physically rewrites it through the
    * staged-uuid-swap, and the read-back gates against the oracle's
    * closed-form restatement: the current flags computed over the
    * FULL history, minus the forgotten keys' rows — erasure removes
    * whole keys and never re-flags survivors (their one-current
    * invariant is VersioningSpec's half, along with the audit/queue
    * cascade, idempotent replay, and crash-mid-rewrite convergence).
    * Runs the forget EVERY call: the second call in a JVM removes 0
    * rows and rewrites nothing — idempotence exercised live under the
    * hash gate.
    */
  val ns70Scd2Forget: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_forget")
    if (zOrderedWritten.add(path))
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"))
        .write.mode("overwrite").parquet(path)
    val ids = Tables.events(s, dir)
      .filter(col("user_id") % 13 === 5)
      .select(col("user_id")).distinct()
    // loud fixture guard (the ns68 discipline): an empty erase set
    // would gate nothing — fail on testdata drift, don't hash-diverge
    require(!ids.isEmpty,
      "ns70 fixture drift: no user_id % 13 == 5 in events")
    graft.scd.Versioning.forget(s, ids,
      graft.scd.Versioning.ForgetTargets(historyPath = Some(path)),
      key = "user_id")
    s.read.parquet(path)
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))
  }

  val ns70Scd2ForgetSql: String =
    """SELECT event_id, user_id, current FROM (
      |  SELECT event_id, user_id,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) = 1 THEN 1 ELSE 0 END
      |      AS current
      |  FROM events)
      |WHERE user_id % 13 <> 5 ORDER BY event_id""".stripMargin

  /** [[ns70Scd2Forget]] over a HIVE-PARTITIONED history (partitioned
    * by event_type — the 100 TB layout, where the erase rewrites ONLY
    * the dirty partition directories via the input_file_name dirty
    * set and the per-directory staged swap): gated on ns70's exact
    * oracle, the q63 house rule — layout must never change answers.
    * Every partition is dirty on this fixture (the forgotten keys'
    * events span all types), so the partition-pruned rewrite is
    * exercised for real rather than vacuously; the
    * only-dirty-dirs-rewrite and fully-dead-partition mechanics are
    * VersioningSpec's half.
    */
  val ns70bScd2ForgetPart: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_forget_part")
    if (zOrderedWritten.add(path))
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"),
          col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
    val ids = Tables.events(s, dir)
      .filter(col("user_id") % 13 === 5)
      .select(col("user_id")).distinct()
    require(!ids.isEmpty,
      "ns70b fixture drift: no user_id % 13 == 5 in events")
    graft.scd.Versioning.forget(s, ids,
      graft.scd.Versioning.ForgetTargets(historyPath = Some(path)),
      key = "user_id")
    s.read.parquet(path)
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))
  }

  val ns70bScd2ForgetPartSql: String = ns70Scd2ForgetSql

  /** [[ns70Scd2Forget]] over a TWO-level Hive layout (event_type /
    * shard — the realistic deep 100 TB history shape): the erase
    * finds and rewrites only the dirty LEAF directories at depth 2
    * through the same input_file_name attribution, validated against
    * the tree walk's per-level columns (a ragged or mixed layout
    * refuses before a partial erasure — VersioningSpec's half, along
    * with deep key-level whole-directory deletion and emptied-branch
    * sweeps). Gated on ns70's exact oracle: layout depth must never
    * change answers.
    */
  val ns70cScd2ForgetDeep: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_forget_deep")
    if (zOrderedWritten.add(path))
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"),
          col("event_type"), pmod(col("event_id"), lit(3)).as("shard"))
        .write.mode("overwrite").partitionBy("event_type", "shard")
        .parquet(path)
    val ids = Tables.events(s, dir)
      .filter(col("user_id") % 13 === 5)
      .select(col("user_id")).distinct()
    require(!ids.isEmpty,
      "ns70c fixture drift: no user_id % 13 == 5 in events")
    graft.scd.Versioning.forget(s, ids,
      graft.scd.Versioning.ForgetTargets(historyPath = Some(path)),
      key = "user_id")
    s.read.parquet(path)
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))
  }

  val ns70cScd2ForgetDeepSql: String = ns70Scd2ForgetSql

  /** The erasure-cascade COMPLIANCE LEDGER
    * ([[graft.scd.Versioning.forget]]'s `ledgerPath` — the ns68c
    * discipline mirrored for the CRM world): the erase is run TWICE
    * (the second call is the crash-repair replay, removing 0 rows)
    * against a fresh history, and the ledger must hold exactly ONE
    * row whose `cascade_sig` = md5(sorted ids | table roles) the
    * oracle restates closed-form — idempotent absorption and the
    * audit answer ("these ids, these tables, erasure durable") in one
    * hash-gated read. VersioningSpec drives the multi-table and
    * crash-ordering halves.
    */
  val ns70dForgetLedger: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_forget_led")
    val ledger = zOrderedTablePath(s, dir, "forget_ledger")
    if (zOrderedWritten.add(path)) {
      // fresh JVM: rebuild the history AND reset the ledger, so the
      // gate's two cascades are provably this run's only rows
      val lp = new org.apache.hadoop.fs.Path(ledger)
      lp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(lp, true)
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"))
        .write.mode("overwrite").parquet(path)
    }
    val ids = Tables.events(s, dir)
      .filter(col("user_id") % 13 === 5)
      .select(col("user_id")).distinct()
    require(!ids.isEmpty,
      "ns70d fixture drift: no user_id % 13 == 5 in events")
    val t = graft.scd.Versioning.ForgetTargets(historyPath = Some(path))
    graft.scd.Versioning.forget(s, ids, t, key = "user_id",
      ledgerPath = Some(ledger))
    graft.scd.Versioning.forget(s, ids, t, key = "user_id",
      ledgerPath = Some(ledger))
    s.read.parquet(ledger)
      .select(col("cascade_sig"), col("n_ids"),
        concat_ws(",", col("tables")).as("tables"))
      .orderBy(col("cascade_sig"))
  }

  /** The streaming erasure QUEUE applied incrementally
    * ([[graft.streaming.ErasureIngest]]): requests stream in
    * continuously and cheaply (exactly-once `ingest_batch=` appends),
    * the maintenance window runs ONE batched forget over everything
    * pending — here two request batches each followed by a drain, so
    * the second drain proves request-keyed pending tracking (only the
    * new requests apply; the first batch's drained marks absorb).
    * Gated closed-form: current flags over the full history minus
    * BOTH request sets. ErasureIngestSpec drives the replay,
    * recycled-id, crash-mid-drain, and re-consent halves.
    */
  val ns70eErasureQueue: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_erase_q")
    val queue = zOrderedTablePath(s, dir, "erase_queue")
    if (zOrderedWritten.add(path)) {
      // fresh JVM: reset the queue with the history, so the two
      // drains below are provably this run's only cascades
      val qp = new org.apache.hadoop.fs.Path(queue)
      qp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(qp, true)
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"))
        .write.mode("overwrite").parquet(path)
    }
    val t = graft.scd.Versioning.ForgetTargets(historyPath = Some(path))
    val r1 = Tables.events(s, dir).filter(col("user_id") % 13 === 5)
      .select(col("user_id")).distinct()
    val r2 = Tables.events(s, dir).filter(col("user_id") % 17 === 3)
      .select(col("user_id")).distinct()
    require(!r1.isEmpty && !r2.isEmpty,
      "ns70e fixture drift: empty erase-request sets in events")
    graft.streaming.ErasureIngest.enqueueBatch(r1, 0L, queue, "user_id")
    graft.streaming.ErasureIngest.drain(s, queue, t, key = "user_id")
    graft.streaming.ErasureIngest.enqueueBatch(r2, 1L, queue, "user_id")
    graft.streaming.ErasureIngest.drain(s, queue, t, key = "user_id")
    s.read.parquet(path)
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))
  }

  val ns70eErasureQueueSql: String =
    """SELECT event_id, user_id, current FROM (
      |  SELECT event_id, user_id,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) = 1 THEN 1 ELSE 0 END
      |      AS current
      |  FROM events)
      |WHERE user_id % 13 <> 5 AND user_id % 17 <> 3
      |ORDER BY event_id""".stripMargin

  /** [[ns70eErasureQueue]]'s PHYSICAL half
    * ([[graft.streaming.ErasureIngest.compactQueue]]): after the
    * first two drains, the sweep empties the fully-drained request
    * partitions to their replay markers and reclaims their marks —
    * then a THIRD request batch enqueues and drains through the swept
    * queue. Gated on the closed-form restatement over all three
    * request sets: physical reclaim of the queue must be
    * answer-invisible end to end (the ns68b discipline). The
    * marker/guard/crash halves are ErasureIngestSpec's.
    */
  val ns70fErasureCompacted: Q = (s, dir) => {
    val path = zOrderedTablePath(s, dir, "scd2_history_erase_qc")
    val queue = zOrderedTablePath(s, dir, "erase_queue_c")
    if (zOrderedWritten.add(path)) {
      val qp = new org.apache.hadoop.fs.Path(queue)
      qp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(qp, true)
      graft.scd.Versioning.withCurrentFlag(
        Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("current"))
        .write.mode("overwrite").parquet(path)
    }
    val t = graft.scd.Versioning.ForgetTargets(historyPath = Some(path))
    def req(m: Int, r: Int) = Tables.events(s, dir)
      .filter(col("user_id") % m === r)
      .select(col("user_id")).distinct()
    require(!req(13, 5).isEmpty && !req(17, 3).isEmpty &&
      !req(19, 7).isEmpty,
      "ns70f fixture drift: empty erase-request sets in events")
    graft.streaming.ErasureIngest.enqueueBatch(req(13, 5), 0L, queue,
      "user_id")
    graft.streaming.ErasureIngest.drain(s, queue, t, key = "user_id")
    graft.streaming.ErasureIngest.enqueueBatch(req(17, 3), 1L, queue,
      "user_id")
    graft.streaming.ErasureIngest.drain(s, queue, t, key = "user_id")
    graft.streaming.ErasureIngest.compactQueue(s, queue)
    graft.streaming.ErasureIngest.enqueueBatch(req(19, 7), 2L, queue,
      "user_id")
    graft.streaming.ErasureIngest.drain(s, queue, t, key = "user_id")
    s.read.parquet(path)
      .select(col("event_id"), col("user_id"), col("current"))
      .orderBy(col("event_id"))
  }

  val ns70fErasureCompactedSql: String =
    """SELECT event_id, user_id, current FROM (
      |  SELECT event_id, user_id,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) = 1 THEN 1 ELSE 0 END
      |      AS current
      |  FROM events)
      |WHERE user_id % 13 <> 5 AND user_id % 17 <> 3
      |  AND user_id % 19 <> 7
      |ORDER BY event_id""".stripMargin

  val ns70dForgetLedgerSql: String =
    """WITH ids AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 5
      |)
      |SELECT md5(array_to_string(list_sort(list(user_id::VARCHAR)), ',')
      |    || '|history') AS cascade_sig,
      |  count(*) AS n_ids, 'history' AS tables
      |FROM ids
      |ORDER BY cascade_sig""".stripMargin

  /** Aggregate-over-frame: per-user running sum ordered by event time. */
  val q21RunningSum: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q21RunningSumSql: String =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Analytic lag/lead + elapsed-seconds math (X13). */
  val q22LagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        (unix_timestamp(col("ts")) -
          unix_timestamp(lag(col("ts"), 1).over(w))).as("secs_since_prev"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q22LagLeadSql: String =
    """SELECT user_id, event_id,
      |  lag(event_id, 1) OVER w AS prev_event_id,
      |  lead(event_id, 1) OVER w AS next_event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT)
      |    - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS secs_since_prev
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Ranking functions with ties. */
  val q23Rank: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        rank().over(w).as("bal_rank"),
        dense_rank().over(w).as("bal_dense_rank"))
      .orderBy(col("c_custkey"))
  }

  val q23RankSql: String =
    """SELECT c_custkey, c_mktsegment,
      |  rank() OVER w AS bal_rank,
      |  dense_rank() OVER w AS bal_dense_rank
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
      |ORDER BY c_custkey""".stripMargin

  /** Top-k per group via row_number filter (the standard Spark top-k
    * idiom — no global sort, partition-local heaps after one shuffle).
    */
  val q24TopkPerGroup: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q24TopkPerGroupSql: String =
    """SELECT o_custkey, rk, o_orderkey, totalprice FROM (
      |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  // ------------------------------------------------ sort / limit / sets

  /** O3: global top-k — Spark plans TakeOrderedAndProject (per-partition
    * heaps, no full sort).
    */
  val q25TopkGlobal: Q = (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))

  val q25TopkGlobalSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** U1: set operators — intersect/except/union in one plan. */
  val q26SetOps: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    building.intersect(o).union(auto.except(o)).orderBy(col("c_custkey"))
  }

  val q26SetOpsSql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | INTERSECT SELECT o_custkey FROM orders)
      |UNION ALL
      |(SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      | EXCEPT SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** dropDuplicates ≡ SELECT DISTINCT. */
  val q27Distinct: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q27DistinctSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------- scalar functions

  /** X1: HTML strip with the reference's exact regex
    * (PodioApiWrapper.py:65), round-tripped through synthetic tags.
    */
  val q28HtmlStrip: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        graft.etl.CleanFields.stripHtml(
          concat(lit("<b>"), col("p_name"), lit("</b>"))).as("stripped"))
      .orderBy(col("p_partkey"))

  val q28HtmlStripSql: String =
    """SELECT p_partkey,
      |  regexp_replace('<b>' || p_name || '</b>', '<.*?>', '', 'g') AS stripped
      |FROM part ORDER BY p_partkey""".stripMargin

  /** X2: split → sort → comma-join (deterministic multi-value join). */
  val q29WordSort: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"),
        concat_ws(",", array_sort(split(col("p_name"), " ")))
          .as("sorted_words"))
      .orderBy(col("p_partkey"))

  val q29WordSortSql: String =
    """SELECT p_partkey,
      |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words
      |FROM part ORDER BY p_partkey""".stripMargin

  /** X4: date extraction/formatting/arithmetic. */
  val q30DateFuncs: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("2024-01-01"))).as("days_since_2024"))
      .orderBy(col("o_orderkey"))

  val q30DateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS order_year,
      |  CAST(month(o_orderdate) AS INT) AS order_month,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  date_diff('day', DATE '2024-01-01', o_orderdate::DATE) AS days_since_2024
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** X5: try_cast cascade with fallback (the `calculation` float-else-
    * string branch, PodioApiWrapper.py:82-88).
    */
  val q31TryCast: Q = (s, dir) =>
    Tables.supplier(s, dir)
      .select(col("s_suppkey"),
        regexp_extract(col("s_name"), "([0-9]+)", 1).as("digits"),
        coalesce(
          regexp_extract(col("s_name"), "([0-9]+)", 1).try_cast("int"),
          lit(-1)).as("parsed_or_default"))
      .orderBy(col("s_suppkey"))

  val q31TryCastSql: String =
    """SELECT s_suppkey,
      |  regexp_extract(s_name, '([0-9]+)', 1) AS digits,
      |  coalesce(try_cast(regexp_extract(s_name, '([0-9]+)', 1) AS INT), -1)
      |    AS parsed_or_default
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** X7: microsecond timestamp formatting (the reference's
    * '%Y-%m-%d %H:%M:%S.%f', PodioApiGateway.py:83).
    */
  val q32TsFormat: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
      .orderBy(col("event_id"))

  val q32TsFormatSql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
      |FROM events ORDER BY event_id""".stripMargin

  /** X12: JSON extraction from the events props payload. */
  val q33Json: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q33JsonSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The flagship snapshot (SparkEntry.entry) with its oracle: per-user
    * latest event state via the SCD2 window.
    */
  val q34Snapshot: Q = (s, dir) =>
    graft.scd.Versioning.latestSnapshot(
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase", "view")),
      "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_type").as("last_event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
        round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"))

  val q34SnapshotSql: String =
    """SELECT user_id, event_type AS last_event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
      |  round(value, 2) AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type IN ('click', 'purchase', 'view'))
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** P1's when-chain dispatch shape: CASE routing on event_type. */
  val q35CaseDispatch: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        when(col("event_type") === "purchase", lit("revenue"))
          .when(col("event_type").isin("click", "view"), lit("engagement"))
          .when(col("event_type") === "signup", lit("growth"))
          .otherwise(lit("ops")).as("category"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("category"))

  val q35CaseDispatchSql: String =
    """SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
      |  WHEN event_type IN ('click', 'view') THEN 'engagement'
      |  WHEN event_type = 'signup' THEN 'growth'
      |  ELSE 'ops' END AS category, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY category""".stripMargin

  /** T8: tumbling event-time window aggregation (batch form of the
    * streaming windowed count — same expression runs under readStream
    * with a watermark, see graft.streaming.CdcPipeline.windowedCounts).
    */
  val q36TumblingWindow: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  val q36TumblingWindowSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** T8 completion: SLIDING (hopping) windows — q36 covers tumbling
    * and q37 sessions; the third standard event-time window shape is
    * the 1-hour window every 30 minutes, where each event lands in
    * exactly len/slide = 2 windows. Spark's `window(ts, len, slide)`
    * Expand-s each row into its windows before one aggregation (one
    * pass, no self-join); the oracle restates that with an explicit
    * 2-window unnest in pure integer-µs arithmetic (both engines
    * align window starts to the epoch, which 30 min divides).
    */
  val q75SlidingWindow: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))

  val q75SlidingWindowSql: String =
    """SELECT (epoch_us(ts) - epoch_us(ts) % 1800000000)
      |    - i * 1800000000 AS w_start_us,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events, unnest([0, 1]) AS t(i)
      |GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin

  /** UNPIVOT (wide→long melt): the inverse of q38's pivot and the
    * standard reshape before per-metric aggregation/plotting. Spark's
    * `unpivot` plans one Expand pass (metrics × rows emitted in a
    * single scan, no per-metric union re-scan, which is what the
    * oracle's UNION ALL restatement would cost done literally). The
    * value column is rounded like every gated double (registry
    * guard); metric order inside a row is made deterministic by the
    * final sort.
    */
  val q76Unpivot: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"),
        col("l_discount").cast("double").as("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount")),
        "metric", "value")
      .withColumn("value", round(col("value"), 6))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  val q76UnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, round(value, 6) AS value
      |FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
      |    l_quantity::DOUBLE AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
      |    l_extendedprice::DOUBLE FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount',
      |    l_discount::DOUBLE FROM lineitem
      |)
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Rolling time-range aggregate: per-user 7-day trailing sum/count
    * via a RANGE window frame over integer-µs event time — the "rolling
    * revenue / rolling activity" shape a CRM reports on. RANGE (not
    * ROWS) so ties at the boundary are peers on both engines.
    *
    * Scale: one hash partition on the high-cardinality user_id, one
    * WindowExec pass with a running frame — no self-join, no
    * per-row rescan of the partition, no global sort.
    */
  val q77RollingRange: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, 0) // 7 days in µs, inclusive
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        round(sum(col("value")).over(w), 2).as("roll_sum_7d"),
        count(lit(1)).over(w).as("roll_cnt_7d"))
      .orderBy(col("event_id"))
  }

  val q77RollingRangeSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  round(sum(value) OVER w, 2) AS roll_sum_7d,
      |  count(*) OVER w AS roll_cnt_7d
      |FROM events WHERE user_id IS NOT NULL
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Join-key skew profiler: per-key-count distribution summaries for
    * the FK columns the engine's joins shuffle on. skew_ratio =
    * max_cnt / mean_cnt is the number AQE's skew-join threshold and
    * the salting bucket count are tuned from — profiling it is the
    * data-engineering step BEFORE the 100 TB join, run here with the
    * same two-level aggregation (per-key partial+final count, then a
    * scalar summary — nothing data-sized ever reaches one task).
    */
  val q78SkewProfile: Q = (s, dir) => {
    def profile(df: org.apache.spark.sql.DataFrame, key: String,
        name: String) =
      df.filter(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("total_rows"),
          max(col("c")).as("max_cnt"),
          round(avg(col("c")), 4).as("avg_cnt"),
          round(max(col("c")) * count(lit(1)) /
            sum(col("c")).cast("double"), 4).as("skew_ratio"))
        .select(lit(name).as("key_name"), col("n_keys"),
          col("total_rows"), col("max_cnt"), col("avg_cnt"),
          col("skew_ratio"))
    profile(Tables.events(s, dir), "user_id", "events.user_id")
      .unionAll(profile(Tables.lineitem(s, dir), "l_orderkey",
        "lineitem.l_orderkey"))
      .unionAll(profile(Tables.lineitem(s, dir), "l_partkey",
        "lineitem.l_partkey"))
      .unionAll(profile(Tables.orders(s, dir), "o_custkey",
        "orders.o_custkey"))
      .orderBy(col("key_name"))
  }

  val q78SkewProfileSql: String =
    """WITH p1 AS (SELECT count(*) AS c FROM events
      |    WHERE user_id IS NOT NULL GROUP BY user_id),
      |  p2 AS (SELECT count(*) AS c FROM lineitem
      |    WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey),
      |  p3 AS (SELECT count(*) AS c FROM lineitem
      |    WHERE l_partkey IS NOT NULL GROUP BY l_partkey),
      |  p4 AS (SELECT count(*) AS c FROM orders
      |    WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
      |SELECT * FROM (
      |  SELECT 'events.user_id' AS key_name, count(*) AS n_keys,
      |    sum(c)::BIGINT AS total_rows, max(c) AS max_cnt,
      |    round(avg(c), 4) AS avg_cnt,
      |    round(max(c) * count(*) / sum(c)::DOUBLE, 4) AS skew_ratio
      |  FROM p1
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey', count(*), sum(c)::BIGINT, max(c),
      |    round(avg(c), 4), round(max(c) * count(*) / sum(c)::DOUBLE, 4)
      |  FROM p2
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey', count(*), sum(c)::BIGINT, max(c),
      |    round(avg(c), 4), round(max(c) * count(*) / sum(c)::DOUBLE, 4)
      |  FROM p3
      |  UNION ALL
      |  SELECT 'orders.o_custkey', count(*), sum(c)::BIGINT, max(c),
      |    round(avg(c), 4), round(max(c) * count(*) / sum(c)::DOUBLE, 4)
      |  FROM p4
      |) ORDER BY key_name""".stripMargin

  /** Fuzzy entity resolution on customer names: every pair of c_name
    * values within Levenshtein distance 1 — the CRM "possible duplicate
    * account" report — found by Dedup.editDistancePairs' symmetric-
    * delete blocking (never the quadratic the oracle restates).
    */
  val q79FuzzyDedup: Q = (s, dir) =>
    // cap=64 > the fixture's max variant bucket (38 at sf0.1), so the
    // exact quadratic oracle stays valid while the plan exercises the
    // 100 TB fan-out bound (see editDistancePairs' recall contract)
    graft.ml.Dedup.editDistancePairs(Tables.customer(s, dir), "c_name",
      maxVariantDf = Some(64))
      .select(col("s1").as("name_a"), col("s2").as("name_b"))
      // no orderBy: the gate sorts rows itself, and a global sort's
      // rangepartitioning SAMPLING pass would re-execute the whole
      // join pipeline a second time (~40% of the query's cost here —
      // the one output in the registry big enough over an expensive
      // enough upstream for that to matter)

  val q79FuzzyDedupSql: String =
    """SELECT a.c_name AS name_a, b.c_name AS name_b
      |FROM customer a JOIN customer b
      |  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY name_a, name_b""".stripMargin

  /** Incremental JOIN-view maintenance (IncrementalJoin): the stored
    * orders⋈lineitem view absorbs insert-only deltas on BOTH sides via
    * the three delta quadrants — the old×old quadrant (at 100 TB, the
    * whole cost) is never re-joined. The oracle is the full join of the
    * union, so the gate proves the quadrant algebra produces every row
    * exactly once. Splits are arbitrary mod classes on independent
    * columns so all three quadrants are non-empty.
    */
  val q80IncrementalJoin: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .withColumnRenamed("o_orderkey", "orderkey")
    val l = Tables.lineitem(s, dir)
      .withColumnRenamed("l_orderkey", "orderkey")
    val (oldA, dA) = (o.filter(col("orderkey") % 5 =!= 0),
      o.filter(col("orderkey") % 5 === 0))
    val (oldB, dB) = (l.filter(col("l_suppkey") % 7 =!= 0),
      l.filter(col("l_suppkey") % 7 === 0))
    val view = oldA.join(oldB, Seq("orderkey"))
    graft.operators.IncrementalJoin.maintain(view,
      graft.operators.IncrementalJoin.delta(oldA, dA, oldB, dB,
        Seq("orderkey")))
      .select(col("orderkey"), col("l_linenumber"), col("o_custkey"),
        col("l_partkey"), round(col("l_extendedprice"), 2).as("price"),
        col("o_orderpriority"))
      .orderBy(col("orderkey"), col("l_linenumber"))
  }

  val q80IncrementalJoinSql: String =
    """SELECT o_orderkey AS orderkey, l_linenumber, o_custkey,
      |  l_partkey, round(l_extendedprice, 2) AS price, o_orderpriority
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |ORDER BY orderkey, l_linenumber""".stripMargin

  /** RFM segmentation — the CRM scoring classic: per customer,
    * Recency (latest order time), Frequency (order count), Monetary
    * (exact decimal revenue), each cut into quintiles by the EXACT
    * global ntile (Corpus.ntileByScore — the monotone-bucket
    * decomposition, never a single-partition global window), composed
    * into the familiar 3-digit RFM code. Ties are broken by the shared
    * md5 hash60 of the customer key so both engines walk the identical
    * total order.
    */
  val q81Rfm: Q = (s, dir) => {
    val byCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      // recency is emitted as the RAW max timestamp (not epoch
      // micros): r6's hash-red persisted with every column already an
      // exact type, so the de-risk is to drop the oracle-side
      // epoch_us() call entirely — a timestamp value compares as the
      // same naive instant in both engines with zero arithmetic. The
      // micros sibling below exists only to feed the numeric ntile.
      .agg(max(col("o_orderdate")).as("recency"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("monetary"))
      // o_orderdate is TIMESTAMP_NTZ; the session is pinned UTC so
      // unix_micros(cast) is order-isomorphic to the raw timestamp —
      // the tile computed on micros equals a tile ordered by recency
      .withColumn("recency_us",
        unix_micros(col("recency").cast("timestamp")))
    // Three INDEPENDENT ntile branches joined on the key — chaining
    // them (tile(tile(tile(df)))) nests each pass's 3 references to
    // its input and the plan grows exponentially with depth (67 scans
    // / 939 plan lines measured vs ~15/200 here); sibling branches
    // stay linear and the repeated byCust aggregation dedups to one
    // execution via ReusedExchange.
    def tiles(scoreCol: String, name: String) =
      graft.ml.Corpus.ntileByScore(
        byCust.select(col("o_custkey"), col(scoreCol)),
        scoreCol, "o_custkey", 5)
        .select(col("o_custkey"), col("tile").as(name))
    byCust
      .join(tiles("recency_us", "r_tile"), Seq("o_custkey"))
      .join(tiles("frequency", "f_tile"), Seq("o_custkey"))
      .join(tiles("monetary", "m_tile"), Seq("o_custkey"))
      .select(col("o_custkey"), col("recency"), col("frequency"),
        // tile is computed on the exact DECIMAL; the SURFACED value
        // is a 2dp-rounded double — the r7 bisect proved decimal
        // output columns hash-diverge at the driver (q81d3 red)
        round(col("monetary").cast("double"), 2).as("monetary"),
        col("r_tile"), col("f_tile"), col("m_tile"),
        (col("r_tile") * 100 + col("f_tile") * 10 + col("m_tile"))
          .as("rfm_code"))
      .orderBy(col("o_custkey"))
  }

  val q81RfmSql: String =
    """WITH byc AS (
      |  SELECT o_custkey, max(o_orderdate) AS recency,
      |    count(*)::BIGINT AS frequency,
      |    sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS monetary,
      |    ('0x'||substr(md5(o_custkey::VARCHAR),1,15))::BIGINT AS h
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey, recency, frequency,
      |  round(monetary::DOUBLE, 2) AS monetary,
      |  r_tile, f_tile, m_tile,
      |  r_tile*100 + f_tile*10 + m_tile AS rfm_code
      |FROM (
      |  SELECT o_custkey, recency, frequency, monetary,
      |    ntile(5) OVER (ORDER BY recency DESC, h, o_custkey)::INT
      |      AS r_tile,
      |    ntile(5) OVER (ORDER BY frequency DESC, h, o_custkey)::INT
      |      AS f_tile,
      |    ntile(5) OVER (ORDER BY monetary DESC, h, o_custkey)::INT
      |      AS m_tile
      |  FROM byc
      |)
      |ORDER BY o_custkey""".stripMargin

  /** Market-basket brand co-occurrence with support + lift — which
    * part brands are ordered together. Per-order distinct brands are
    * paired within the order (fan-out bounded by basket size, never a
    * corpus-wide quadratic), with the A-priori prune applied first:
    * a pair can only reach min support if BOTH items do, so low-
    * support brands are dropped before pairing — at 100 TB that prune
    * (a broadcast semi-join of a tiny frequent-item list) is what
    * keeps the pair space tractable.
    */
  /** Pairwise basket lift with the A-priori item prune: only items
    * whose own frequency reaches `minSupport` enter the pair self-join
    * (a pair cannot out-support its rarer member, so the prune is
    * LOSSLESS — BasketSpec proves equality with the unpruned form and
    * measures the candidate-pair reduction on a high-cardinality item
    * column, where the prune is the difference between Σ C(hot_i, 2)
    * and Σ C(n_i, 2) pair fan-out). `baskets` needs distinct
    * (ok, brand) rows. On the bench fixture (25 brands, all clearing
    * minSupport) the prune is structurally a no-op — BASELINE.md
    * documents that honestly; the spec's synthetic long-tail column is
    * where it earns its place.
    */
  def basketLift(baskets: DataFrame, minSupport: Long): DataFrame = {
    val nOrders = baskets.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemFreq = baskets.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_item"))
    val kept = baskets.join(
      broadcast(itemFreq.filter(col("n_item") >= minSupport)
        .select(col("brand"))), Seq("brand"))
    kept.as("a").join(kept.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"),
        col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .join(broadcast(itemFreq.select(col("brand").as("brand_a"),
        col("n_item").as("n_a"))), Seq("brand_a"))
      .join(broadcast(itemFreq.select(col("brand").as("brand_b"),
        col("n_item").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("support"),
        round(col("support") * col("n_orders") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  val q82Basket: Q = (s, dir) => {
    val baskets = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
    basketLift(baskets, minSupport = 50L)
  }

  /** q82 with its fact⋈dim join routed through
    * [[graft.operators.SaltedJoin]] (salts = 8, salted on the
    * orderkey) — the manual skew tool as a GATED production path, not
    * a shelf operator: under a power-law part popularity (the
    * --skew-graph corpus puts the head part in ~46% of orders) the
    * partkey shuffle sends one key's entire fact volume to one
    * reducer wherever AQE can't split (non-sort-merge plans,
    * aggregate-feeding exchanges); the salt spreads it over 8 with
    * the dim side replicated 8×. Output contract identical to q82 —
    * gated on q82's own oracle (the q6b/ns46b same-oracle
    * discipline), so the salt is proven semantics-free.
    */
  val q82bBasketSalted: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p_partkey"),
        col("l_orderkey").as("ok"))
    val baskets = graft.operators.SaltedJoin.inner(
        li,
        Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        "p_partkey", salts = 8, saltCols = Seq("ok"))
      .select(col("ok"), col("p_brand").as("brand"))
      .distinct()
    basketLift(baskets, minSupport = 50L)
  }

  /** Bench evidence probe for q82 (r9 verdict item 6): the A-priori
    * prune is structurally a no-op on this 25-brand fixture
    * (BASELINE.md documents it in prose; BasketSpec proves the
    * mechanism on a synthetic long tail) — this makes the caveat
    * MEASURABLE in the bench JSON instead of prose. Candidate volume
    * is Σ_basket C(items, 2) with and without the frequency cut;
    * `candidates_pruned` is their difference (0 on the fixture, by
    * measurement). One aggregate over the basket table, untimed, run
    * by the bench after the timing loop.
    */
  def q82PruneEvidence(s: SparkSession, dir: String): Map[String, Long] = {
    // the basket derivation (lineitem×part join + distinct) is the
    // probe's expensive stage — cache it so the item and candidate
    // aggregates share one materialization (r10 review finding)
    val baskets = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
      .cache()
    try {
      val itemFreq = baskets.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_item"))
      val items = itemFreq.agg(
        count(lit(1)).as("t"),
        count(when(col("n_item") >= 50L, 1)).as("k")).head()
      val kept = itemFreq.filter(col("n_item") >= 50L)
      val per = baskets
        .join(broadcast(kept.select(col("brand"), lit(1).as("k"))),
          Seq("brand"), "left")
        .groupBy(col("ok"))
        .agg(count(lit(1)).as("n_all"), count(col("k")).as("n_kept"))
      val r = per.agg(
        coalesce(sum(expr("(n_all * (n_all - 1)) div 2")), lit(0L))
          .as("before"),
        coalesce(sum(expr("(n_kept * (n_kept - 1)) div 2")), lit(0L))
          .as("after")).head()
      val (before, after) = (r.getLong(0), r.getLong(1))
      Map(
        "items_total" -> items.getLong(0),
        "items_kept" -> items.getLong(1),
        "candidates_before" -> before,
        "candidates_after" -> after,
        "candidates_pruned" -> (before - after))
    } finally {
      baskets.unpersist()
      ()
    }
  }

  val q82BasketSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), item AS (
      |  SELECT brand, count(*)::BIGINT AS n_item FROM baskets GROUP BY 1
      |), tot AS (
      |  SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM baskets
      |), pairs AS (
      |  SELECT a.brand AS brand_a, b.brand AS brand_b,
      |    count(*)::BIGINT AS support
      |  FROM baskets a JOIN baskets b
      |    ON a.ok = b.ok AND a.brand < b.brand
      |  WHERE a.brand IN (SELECT brand FROM item WHERE n_item >= 50)
      |    AND b.brand IN (SELECT brand FROM item WHERE n_item >= 50)
      |  GROUP BY 1, 2 HAVING count(*) >= 50
      |)
      |SELECT brand_a, brand_b, support,
      |  round(support * n_orders / (ia.n_item * ib.n_item)::DOUBLE, 6)
      |    AS lift
      |FROM pairs
      |JOIN item ia ON ia.brand = brand_a
      |JOIN item ib ON ib.brand = brand_b
      |CROSS JOIN tot
      |ORDER BY brand_a, brand_b""".stripMargin

  /** Declarative data-quality gate (meta.Expectations): two tables'
    * publish-contract suites — completeness, key uniqueness, regex
    * conformance, domain membership, value bounds, row count — each
    * suite ONE aggregation pass regardless of check count. The value
    * bound on events is deliberately tighter than the data so the
    * report exercises its failing branch (observed < 1, passed =
    * false); the oracle restates every check as a scalar aggregate.
    */
  val q83Expectations: Q = (s, dir) => {
    import graft.meta.Expectations._
    val cust = run(Tables.customer(s, dir), Seq(
      RowCount(100L, 100000000L),
      Uniqueness(Seq("c_custkey"), 1.0),
      Completeness("c_name", 1.0),
      PatternRatio("c_name", "^Customer#[0-9]+$", 0.99),
      InSet("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
        "HOUSEHOLD", "MACHINERY"), 1.0),
      Between("c_acctbal", -1000.0, 10000.0)))
      .withColumn("table_name", lit("customer"))
    val ev = run(Tables.events(s, dir), Seq(
      Uniqueness(Seq("event_id"), 1.0),
      Completeness("user_id", 0.9),
      InSet("event_type", Seq("click", "view", "purchase", "signup",
        "error"), 1.0),
      Between("value", 0.0, 100.0)))
      .withColumn("table_name", lit("events"))
    cust.unionByName(ev)
      .select(col("table_name"), col("check_idx"), col("check_name"),
        col("col_name"), col("observed"), col("threshold"),
        col("passed"))
      .orderBy(col("table_name"), col("check_idx"))
  }

  val q83ExpectationsSql: String =
    """SELECT * FROM (
      |  SELECT 'customer' AS table_name, 0 AS check_idx,
      |    'row_count' AS check_name, '*' AS col_name,
      |    round(count(*)::DOUBLE, 6) AS observed, 100.0::DOUBLE AS threshold,
      |    count(*) >= 100 AND count(*) <= 100000000 AS passed
      |  FROM customer
      |  UNION ALL
      |  SELECT 'customer', 1, 'uniqueness', 'c_custkey',
      |    round(count(DISTINCT c_custkey)::DOUBLE / count(*), 6), 1.0::DOUBLE,
      |    count(DISTINCT c_custkey)::DOUBLE / count(*) >= 1.0
      |  FROM customer
      |  UNION ALL
      |  SELECT 'customer', 2, 'completeness', 'c_name',
      |    round(count(c_name)::DOUBLE / count(*), 6), 1.0::DOUBLE,
      |    count(c_name)::DOUBLE / count(*) >= 1.0
      |  FROM customer
      |  UNION ALL
      |  SELECT 'customer', 3, 'pattern', 'c_name',
      |    round(count(CASE WHEN regexp_matches(c_name,
      |      '^Customer#[0-9]+$') THEN 1 END)::DOUBLE
      |      / count(c_name), 6), 0.99::DOUBLE,
      |    count(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$')
      |      THEN 1 END)::DOUBLE / count(c_name) >= 0.99
      |  FROM customer
      |  UNION ALL
      |  SELECT 'customer', 4, 'in_set', 'c_mktsegment',
      |    round(count(CASE WHEN c_mktsegment IN ('AUTOMOBILE',
      |      'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY')
      |      THEN 1 END)::DOUBLE / count(c_mktsegment), 6), 1.0::DOUBLE,
      |    count(CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING',
      |      'FURNITURE', 'HOUSEHOLD', 'MACHINERY') THEN 1 END)::DOUBLE
      |      / count(c_mktsegment) >= 1.0
      |  FROM customer
      |  UNION ALL
      |  SELECT 'customer', 5, 'between', 'c_acctbal',
      |    round(count(CASE WHEN c_acctbal BETWEEN -1000.0 AND 10000.0
      |      THEN 1 END)::DOUBLE / count(c_acctbal), 6), 1.0::DOUBLE,
      |    count(CASE WHEN c_acctbal BETWEEN -1000.0 AND 10000.0
      |      THEN 1 END)::DOUBLE / count(c_acctbal) >= 1.0
      |  FROM customer
      |  UNION ALL
      |  SELECT 'events', 0, 'uniqueness', 'event_id',
      |    round(count(DISTINCT event_id)::DOUBLE / count(*), 6), 1.0::DOUBLE,
      |    count(DISTINCT event_id)::DOUBLE / count(*) >= 1.0
      |  FROM events
      |  UNION ALL
      |  SELECT 'events', 1, 'completeness', 'user_id',
      |    round(count(user_id)::DOUBLE / count(*), 6), 0.9::DOUBLE,
      |    count(user_id)::DOUBLE / count(*) >= 0.9
      |  FROM events
      |  UNION ALL
      |  SELECT 'events', 2, 'in_set', 'event_type',
      |    round(count(CASE WHEN event_type IN ('click', 'view',
      |      'purchase', 'signup', 'error') THEN 1 END)::DOUBLE
      |      / count(event_type), 6), 1.0::DOUBLE,
      |    count(CASE WHEN event_type IN ('click', 'view', 'purchase',
      |      'signup', 'error') THEN 1 END)::DOUBLE
      |      / count(event_type) >= 1.0
      |  FROM events
      |  UNION ALL
      |  SELECT 'events', 3, 'between', 'value',
      |    round(count(CASE WHEN value BETWEEN 0.0 AND 100.0
      |      THEN 1 END)::DOUBLE / count(value), 6), 1.0::DOUBLE,
      |    count(CASE WHEN value BETWEEN 0.0 AND 100.0
      |      THEN 1 END)::DOUBLE / count(value) >= 1.0
      |  FROM events
      |)
      |ORDER BY table_name, check_idx""".stripMargin

  /** Last-touch marketing attribution: each purchase is credited to
    * the user's most recent marketing touch (click/view/signup) within
    * a 7-day lookback — purchases with no touch in the window are
    * 'direct'. Pure reuse of AsOfJoin.asofBackward with tolerance
    * (one key-partitioned union+window pass, no per-purchase rescan),
    * then a per-channel rollup of count and exact decimal revenue.
    */
  val q84Attribution: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val touches = ev
      .filter(col("event_type").isin("click", "view", "signup"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type").as("touch_type"))
    graft.operators.AsOfJoin.asofBackward(
      purchases, touches,
      leftKey = "user_id", rightKey = "user_id",
      leftTime = "ts", rightTime = "ts",
      payload = Seq("touch_type"), tiebreak = "event_id",
      tolerance = Some("INTERVAL 7 DAYS"))
      .groupBy(coalesce(col("asof_touch_type"), lit("direct"))
        .as("channel"))
      .agg(count(lit(1)).as("purchases"),
        // exact decimal sum internally; surfaced as a 2dp-rounded
        // double — no DecimalType may reach a hash-gated output
        // (r7 bisect: driver's DuckDB hash-canonicalizes decimals
        // differently; rounded doubles are build-stable)
        round(sum(col("value").cast("decimal(18,2)")).cast("double"),
          2).as("revenue"))
      .orderBy(col("channel"))
  }

  val q84AttributionSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE user_id IS NOT NULL AND event_type = 'purchase'
      |), t AS (
      |  SELECT event_id, user_id, ts, event_type FROM events
      |  WHERE user_id IS NOT NULL
      |    AND event_type IN ('click', 'view', 'signup')
      |), att AS (
      |  SELECT p.value,
      |    (SELECT (max({'ts': t.ts, 'e': t.event_id,
      |        'et': t.event_type})).et
      |     FROM t WHERE t.user_id = p.user_id AND t.ts <= p.ts
      |       AND t.ts >= p.ts - INTERVAL 7 DAY) AS ch
      |  FROM p
      |)
      |SELECT coalesce(ch, 'direct') AS channel,
      |  count(*)::BIGINT AS purchases,
      |  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS revenue
      |FROM att GROUP BY channel ORDER BY channel""".stripMargin

  /** Distribution-drift detection (PSI — population stability index):
    * bin the metric by the REFERENCE period's deciles, compare the
    * current period's bin shares, psi_term = (p_cur − p_ref) ·
    * ln(p_cur/p_ref) per bin (Σ > 0.2 is the conventional "retrain /
    * investigate" alarm). The decile edges are a 9-element broadcast
    * literal, binning is a pure map stage, and each side is one
    * aggregation pass — monitoring 100 TB costs two scans. Exact
    * ref-deciles share q39's percentile caveat; the ε floor keeps
    * empty current bins finite and is restated identically in the
    * oracle.
    */
  val q85Drift: Q = (s, dir) => {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).select(col("ts"), col("value"))
    val ref = ev.filter(col("ts") < split)
    val cur = ev.filter(col("ts") >= split)
    val edges = ref.agg(percentile(col("value"),
      lit((1 to 9).map(_ / 10.0).toArray)).as("qs"))
    def binCounts(df: DataFrame, cntName: String) =
      df.crossJoin(broadcast(edges))
        .select(size(filter(col("qs"), e => e < col("value")))
          .as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cntName))
    val totals = ref.agg(count(lit(1)).as("n_ref"))
      .crossJoin(cur.agg(count(lit(1)).as("n_cur")))
    val eps = lit(1e-6)
    binCounts(ref, "ref_cnt")
      .join(binCounts(cur, "cur_cnt"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        round(col("ref_cnt") / col("n_ref").cast("double"), 6)
          .as("p_ref"),
        round(col("cur_cnt") / col("n_cur").cast("double"), 6)
          .as("p_cur"),
        round((col("cur_cnt") / col("n_cur").cast("double") -
          col("ref_cnt") / col("n_ref").cast("double")) *
          log(greatest(col("cur_cnt") / col("n_cur").cast("double"),
            eps) /
            greatest(col("ref_cnt") / col("n_ref").cast("double"),
              eps)), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  val q85DriftSql: String =
    """WITH ref AS (
      |  SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-15'
      |), cur AS (
      |  SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-15'
      |), e AS (
      |  SELECT quantile_cont(value,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      |  FROM ref
      |), rb AS (
      |  SELECT len(list_filter(qs, x -> x < value))::INT AS bin,
      |    count(*)::BIGINT AS ref_cnt FROM ref, e GROUP BY 1
      |), cb AS (
      |  SELECT len(list_filter(qs, x -> x < value))::INT AS bin,
      |    count(*)::BIGINT AS cur_cnt FROM cur, e GROUP BY 1
      |), t AS (
      |  SELECT (SELECT count(*) FROM ref)::DOUBLE AS n_ref,
      |    (SELECT count(*) FROM cur)::DOUBLE AS n_cur
      |)
      |SELECT coalesce(rb.bin, cb.bin) AS bin,
      |  coalesce(ref_cnt, 0) AS ref_cnt,
      |  coalesce(cur_cnt, 0) AS cur_cnt,
      |  round(coalesce(ref_cnt, 0) / n_ref, 6) AS p_ref,
      |  round(coalesce(cur_cnt, 0) / n_cur, 6) AS p_cur,
      |  round((coalesce(cur_cnt, 0) / n_cur -
      |    coalesce(ref_cnt, 0) / n_ref) *
      |    ln(greatest(coalesce(cur_cnt, 0) / n_cur, 0.000001) /
      |      greatest(coalesce(ref_cnt, 0) / n_ref, 0.000001)), 6)
      |    AS psi_term
      |FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin CROSS JOIN t
      |ORDER BY bin""".stripMargin

  /** Robust outlier detection: flag events whose MAD-based robust
    * z-score (0.6745·(v − median)/MAD — the consistent-estimator
    * form) exceeds 3.5 within their event type. Median/MAD, not
    * mean/stddev: a CRM's value column is exactly where the outliers
    * ARE, and moment-based z-scores let the outliers inflate their own
    * yardstick. Two 5-row aggregates broadcast back over one fact
    * scan; the oracle restates MAD manually (median of abs deviations)
    * so both engines walk the identical arithmetic. Exact per-group
    * percentile carries q39's scale caveat — at 100 TB swap in
    * approx_percentile exactly as q39b/q67b do.
    */
  val q86Outliers: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val stats = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5))
        .as("mad"))
    val z = lit(0.6745) * (col("value") - col("med")) / col("mad")
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("mad") > 0 && abs(z) > 3.5)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), round(z, 4).as("robust_z"))
      .orderBy(col("event_id"))
  }

  /** The incremental triad COMPOSED into one maintained reporting MV:
    * a join view absorbed through IncrementalJoin.delta feeds
    * IncrementalAgg partial/merge state — history is never re-joined
    * NOR re-aggregated when deltas land on both base tables. This is
    * the full materialized-view story for the reference's reporting
    * extract (join orders×lineitem, aggregate by priority/returnflag)
    * as one delta-proportional update; the oracle recomputes the whole
    * thing from scratch, so the gate proves the composed algebra.
    */
  val q87IncrementalMv: Q = (s, dir) => {
    import graft.operators.{IncrementalAgg, IncrementalJoin}
    val o = Tables.orders(s, dir)
      .withColumnRenamed("o_orderkey", "orderkey")
    val l = Tables.lineitem(s, dir)
      .withColumnRenamed("l_orderkey", "orderkey")
    val (oldA, dA) = (o.filter(col("orderkey") % 5 =!= 0),
      o.filter(col("orderkey") % 5 === 0))
    val (oldB, dB) = (l.filter(col("l_suppkey") % 7 =!= 0),
      l.filter(col("l_suppkey") % 7 === 0))
    val keys = Seq("o_orderpriority", "l_returnflag")
    def valued(df: DataFrame) = df.withColumn("v",
      col("l_extendedprice").cast("decimal(18,6)"))
    val state0 = IncrementalAgg.partial(
      valued(oldA.join(oldB, Seq("orderkey"))), keys, "v")
    val deltaState = IncrementalAgg.partial(
      valued(IncrementalJoin.delta(oldA, dA, oldB, dB,
        Seq("orderkey"))), keys, "v")
    IncrementalAgg.finish(IncrementalAgg.merge(state0, deltaState))
      .select(col("o_orderpriority"), col("l_returnflag"),
        // decimal state stays internal; surfaced as rounded doubles
        // (r7 bisect verdict). The sum rounds at 2dp, not 6: the
        // group sums here are already ~2.2e8 at sf0.01, and 6dp
        // rounding leaves only 26× headroom to the 2^53 bound past
        // which cross-engine round(x, d) stops being bit-identical —
        // see q66's rationale; prices are 2dp-exact so nothing is
        // lost. min/max/avg are value-bounded, 6dp safe.
        round(col("agg_sum").cast("double"), 2).as("agg_sum"),
        col("agg_cnt"),
        round(col("agg_min").cast("double"), 6).as("agg_min"),
        round(col("agg_max").cast("double"), 6).as("agg_max"),
        round(col("agg_avg"), 6).as("agg_avg"))
      .orderBy(col("o_orderpriority"), col("l_returnflag"))
  }

  val q87IncrementalMvSql: String =
    """SELECT o_orderpriority, l_returnflag,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
      |    AS DOUBLE), 2) AS agg_sum,
      |  count(l_extendedprice) AS agg_cnt,
      |  round(CAST(min(CAST(l_extendedprice AS DECIMAL(18,6)))
      |    AS DOUBLE), 6) AS agg_min,
      |  round(CAST(max(CAST(l_extendedprice AS DECIMAL(18,6)))
      |    AS DOUBLE), 6) AS agg_max,
      |  round(CASE WHEN count(l_extendedprice) > 0 THEN
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |      / count(l_extendedprice) END, 6) AS agg_avg
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority, l_returnflag
      |ORDER BY o_orderpriority, l_returnflag""".stripMargin

  /** Multi-touch (linear) attribution — q84's last-touch sibling:
    * every touch in the 7-day lookback shares the purchase's value
    * equally. The purchase×touch pairing is an equi-join on the
    * high-cardinality user key with a time-range residual (bounded
    * per-user fan-out, never a time-only range explosion); per-row
    * credit is rounded to a fixed 6dp DECIMAL before the sum so the
    * rollup is order-independent and exact on both engines.
    */
  val q88MultiTouch: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"), col("value"))
    val touches = ev
      .filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_type").as("channel"))
    val paired = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") <= col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val credits = paired
      .withColumn("k", count(lit(1))
        .over(Window.partitionBy(col("pid"))))
      .withColumn("credit",
        round(col("value") / col("k"), 6).cast("decimal(18,6)"))
    credits.groupBy(col("channel"))
      .agg(countDistinct(col("pid")).as("touched_purchases"),
        count(lit(1)).as("touches"),
        // exact 6dp-decimal rollup internally (order-independent);
        // surfaced as a 6dp-rounded double — no DecimalType in
        // hash-gated outputs (r7 bisect verdict). 6dp is required
        // here (credits are genuine 6dp quotients) and safe: per-
        // channel purchase-value sums stay < ~1e9 even at 1000×,
        // under the |x|·10^6 < 2^53 cross-engine round bound (q66)
        round(sum(col("credit")).cast("double"), 6)
          .as("credited_revenue"))
      .orderBy(col("channel"))
  }

  val q88MultiTouchSql: String =
    """WITH p AS (
      |  SELECT event_id AS pid, user_id, ts AS pts, value FROM events
      |  WHERE user_id IS NOT NULL AND event_type = 'purchase'
      |), t AS (
      |  SELECT user_id, ts AS tts, event_type AS channel FROM events
      |  WHERE user_id IS NOT NULL
      |    AND event_type IN ('click', 'view', 'signup')
      |), paired AS (
      |  SELECT pid, value, channel,
      |    count(*) OVER (PARTITION BY pid) AS k
      |  FROM p JOIN t USING (user_id)
      |  WHERE tts <= pts AND tts >= pts - INTERVAL 7 DAY
      |)
      |SELECT channel,
      |  count(DISTINCT pid)::BIGINT AS touched_purchases,
      |  count(*)::BIGINT AS touches,
      |  round(sum(round(value / k, 6)::DECIMAL(18,6))::DOUBLE, 6)
      |    AS credited_revenue
      |FROM paired GROUP BY channel ORDER BY channel""".stripMargin

  val q86OutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1
      |), stats AS (
      |  SELECT e.event_type, any_value(med.med) AS med,
      |    median(abs(e.value - med.med)) AS mad
      |  FROM events e JOIN med USING (event_type)
      |  GROUP BY e.event_type
      |)
      |SELECT event_id, e.event_type, round(value, 2) AS value,
      |  round(0.6745 * (value - s.med) / s.mad, 4) AS robust_z
      |FROM events e JOIN stats s USING (event_type)
      |WHERE s.mad > 0 AND abs(0.6745 * (value - s.med) / s.mad) > 3.5
      |ORDER BY event_id""".stripMargin

  /** T8: session windows (30-minute inactivity gap) per user — Spark's
    * session_window merges events whose gap is < 30 min; the oracle
    * reproduces that with a lag/cumsum session id.
    */
  val q37SessionWindow: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val q37SessionWindowSql: String =
    """WITH x AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), y AS (
      |  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x
      |)
      |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  count(*) AS n_events
      |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------- round-2 surface widening

  /** Pivot (columnar re-shape of A3's nested grouping): order counts by
    * status × priority. Values are enumerated explicitly so the output
    * schema is static — the scalable form (an inferred pivot runs an
    * extra distinct job over the pivot column first).
    */
  val q38Pivot: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("o_orderstatus"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("n_urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("n_high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("n_medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("n_notspec"),
        coalesce(col("`5-LOW`"), lit(0L)).as("n_low"))
      .orderBy(col("o_orderstatus"))

  val q38PivotSql: String =
    """SELECT o_orderstatus,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
      |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Exact interpolated percentiles (continuous quantiles). At 100 TB
    * these become approx_percentile (t-digest/KLL single pass); the
    * exact form here is the oracle-checkable baseline.
    */
  val q39Percentile: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
        round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
        round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("q1_price"))
      .orderBy(col("l_returnflag"))

  val q39PercentileSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS q1_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q39's scale sibling: approx_percentile (Greenwald-Khanna sketch)
    * instead of the exact interpolated quantile — SURVEY §9's "what
    * stays approximate at scale". Single mergeable-sketch pass, no
    * per-group sort of every value; the accuracy parameter 10000 caps
    * the rank error at n/10000 (GK bound ε = 1/accuracy), i.e. the
    * reported value's rank is within 0.01 % of the requested quantile.
    * GK returns an OBSERVED value (no interpolation), so there is no
    * exact ANSI oracle → rows-only driver check; the error bound vs
    * q39's exact result is spec-asserted in PercentileSpec.
    */
  val q39bApproxPercentile: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(approx_percentile(col("l_quantity"), lit(0.5), lit(10000)), 4)
          .as("median_qty"),
        round(approx_percentile(col("l_quantity"), lit(0.9), lit(10000)), 4)
          .as("p90_qty"),
        round(approx_percentile(col("l_extendedprice"), lit(0.25), lit(10000)), 4)
          .as("q1_price"))
      .orderBy(col("l_returnflag"))

  /** W-surface lifecycle: bounded version retention — each user keeps
    * only the 3 newest event versions (graft.scd.Versioning
    * .pruneVersions), the history vacuum that stops SCD2 stores
    * growing without bound.
    */
  val q58Retention: Q = (s, dir) =>
    graft.scd.Versioning.pruneVersions(Tables.events(s, dir),
      "user_id", "ts", "event_id", keepLast = 3)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  val q58RetentionSql: String =
    """SELECT event_id, user_id, event_type FROM (
      |  SELECT event_id, user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn <= 3 ORDER BY event_id""".stripMargin

  /** W-surface time travel: per-user state AS OF a past instant
    * (graft.scd.Versioning.snapshotAsOf) — the "what did the CRM say
    * on date X" audit reconstruction over the version history.
    */
  val q59SnapshotAsof: Q = (s, dir) =>
    graft.scd.Versioning.snapshotAsOf(Tables.events(s, dir),
      "user_id", "ts", "event_id",
      lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("event_id").as("version_event"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))

  val q59SnapshotAsofSql: String =
    """SELECT user_id, event_id AS version_event, event_type, value
      |FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** W-surface change feed: per-key classification of what happened
    * between two sync instants (graft.scd.Versioning.versionDiff) —
    * added / changed / unchanged over the event version history.
    */
  val q60VersionDiff: Q = (s, dir) =>
    graft.scd.Versioning.versionDiff(Tables.events(s, dir),
      "user_id", "ts", "event_id",
      lit("2024-01-15 00:00:00").cast("timestamp"),
      lit("2024-01-25 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("change_type"),
        col("old_version"), col("new_version"))
      .orderBy(col("user_id"))

  val q60VersionDiffSql: String =
    """WITH s1 AS (
      |  SELECT user_id, event_id FROM (
      |    SELECT user_id, event_id, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      |  WHERE rn = 1),
      |s2 AS (
      |  SELECT user_id, event_id FROM (
      |    SELECT user_id, event_id, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts <= TIMESTAMP '2024-01-25 00:00:00')
      |  WHERE rn = 1)
      |SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
      |  CASE WHEN s1.user_id IS NULL THEN 'added'
      |       WHEN s2.user_id IS NULL THEN 'removed'
      |       WHEN s1.event_id = s2.event_id THEN 'unchanged'
      |       ELSE 'changed' END AS change_type,
      |  s1.event_id AS old_version, s2.event_id AS new_version
      |FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id
      |ORDER BY user_id""".stripMargin

  /** Conversion funnel (graft.operators.Funnel): furthest view →
    * click → purchase step each user completed IN ORDER. The oracle
    * re-states subsequence matching as LIKE patterns over the
    * '|'-delimited ordered event string — greedy fold and pattern
    * existence agree because greedy earliest-match is maximal.
    */
  val q61Funnel: Q = (s, dir) =>
    graft.operators.Funnel.stages(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  val q61FunnelSql: String =
    """WITH seqs AS (
      |  SELECT user_id,
      |    '|' || string_agg(event_type, '||' ORDER BY ts, event_id) || '|'
      |      AS s
      |  FROM events GROUP BY user_id)
      |SELECT user_id,
      |  CASE WHEN s LIKE '%|view|%|click|%|purchase|%' THEN 3
      |       WHEN s LIKE '%|view|%|click|%' THEN 2
      |       WHEN s LIKE '%|view|%' THEN 1
      |       ELSE 0 END AS stage
      |FROM seqs ORDER BY user_id""".stripMargin

  /** Timed funnel (Funnel.stagesTimed): WHEN each greedy-matched step
    * happened, plus seconds from first to last step for converters.
    * The oracle re-derives the greedy match with list-position
    * arithmetic over the time-ordered event list: p1 = first 'view',
    * p2 = first 'click' AFTER p1, p3 = first 'purchase' after p2 —
    * greedy earliest-match is exactly what the engine's fold computes.
    * date_diff('second') counts second boundaries crossed, which for
    * b >= a equals the engine's floor-epoch difference.
    */
  val q64FunnelTimed: Q = (s, dir) =>
    graft.operators.Funnel.stagesTimed(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
      .select(col("user_id"), col("stage"),
        try_element_at(col("stage_ts"), lit(1)).as("t_view"),
        try_element_at(col("stage_ts"), lit(2)).as("t_click"),
        try_element_at(col("stage_ts"), lit(3)).as("t_purchase"),
        (unix_timestamp(try_element_at(col("stage_ts"), lit(3))) -
          unix_timestamp(try_element_at(col("stage_ts"), lit(1))))
          .as("secs_to_convert"))
      .orderBy(col("user_id"))

  val q64FunnelTimedSql: String =
    """WITH seqs AS (
      |  SELECT user_id,
      |    list(event_type ORDER BY ts, event_id) AS evs,
      |    list(ts ORDER BY ts, event_id) AS tss
      |  FROM events GROUP BY user_id),
      |s1 AS (
      |  SELECT user_id, evs, tss, list_position(evs, 'view') AS p1
      |  FROM seqs),
      |s2 AS (
      |  SELECT *, CASE WHEN p1 IS NULL THEN NULL
      |    ELSE p1 + list_position(evs[p1+1:], 'click') END AS p2
      |  FROM s1),
      |s3 AS (
      |  SELECT *, CASE WHEN p2 IS NULL THEN NULL
      |    ELSE p2 + list_position(evs[p2+1:], 'purchase') END AS p3
      |  FROM s2)
      |SELECT user_id,
      |  CASE WHEN p3 IS NOT NULL THEN 3 WHEN p2 IS NOT NULL THEN 2
      |       WHEN p1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  tss[p1] AS t_view, tss[p2] AS t_click, tss[p3] AS t_purchase,
      |  date_diff('second', tss[p1], tss[p3]) AS secs_to_convert
      |FROM s3 ORDER BY user_id""".stripMargin

  /** Gap-based sessionization (Sessionize.assign): every event
    * labeled with its key-local session ordinal, 30-minute gap. The
    * oracle restates the same two-pass window arithmetic; both sides
    * compare floor-epoch seconds (date_diff('second') ==
    * unix_timestamp difference) and ::BIGINT matches Spark's long
    * running sum (DuckDB's sum(int) is HUGEINT).
    */
  val q65Sessionize: Q = (s, dir) =>
    graft.operators.Sessionize.assign(Tables.events(s, dir),
      "user_id", "ts", "event_id", gapSeconds = 1800L)
      .select(col("user_id"), col("event_id"), col("ts"), col("session_n"))
      .orderBy(col("user_id"), col("event_id"))

  val q65SessionizeSql: String =
    """WITH marks AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id, ts,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_n
      |FROM marks ORDER BY user_id, event_id""".stripMargin

  /** Incremental aggregate maintenance (IncrementalAgg): history
    * partial state (ts < split) merged with a delta batch (ts >=
    * split) must equal ONE aggregation of the full table — which is
    * exactly what the oracle computes, so the gate proves the merge
    * algebra, not just the arithmetic. Values aggregate as
    * DECIMAL(18,6): decimal addition is exact, so the two-phase
    * merged sum equals the one-shot sum BIT-identically (doubles
    * would differ in association order). The decimals stay INTERNAL:
    * the r7 per-column bisect (q66d1 red / q66d2 green) proved the
    * driver's DuckDB build hash-canonicalizes DECIMAL output columns
    * differently, while 6dp-rounded doubles are stable — so every
    * surfaced column is round(cast(x AS DOUBLE), 6) on both engines.
    * That cast is safe: the exact decimal maps to the same nearest
    * double in both engines, and round-to-6dp of an exact-6dp value
    * is boundary-free (adjacent 6dp decimals are ~1e6 ulps apart).
    */
  val q66IncrementalAgg: Q = (s, dir) => {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir)
      .withColumn("v", col("value").cast("decimal(18,6)"))
    val hist = graft.operators.IncrementalAgg.partial(
      ev.filter(col("ts") < split), Seq("event_type"), "v")
    val delta = graft.operators.IncrementalAgg.partial(
      ev.filter(col("ts") >= split), Seq("event_type"), "v")
    graft.operators.IncrementalAgg.finish(
      graft.operators.IncrementalAgg.merge(hist, delta))
      .select(col("event_type"),
        // SUM is the one magnitude-growing column, and cross-engine
        // round(x, d) is only guaranteed identical while |x|·10^d <
        // 2^53 (beyond that DuckDB's scaled-multiply rounding and
        // Spark's BigDecimal path can differ by an ulp). The source
        // values are exact 2dp money, so the decimal sum is 2dp-exact
        // and rounding at 2 loses nothing while extending the safe
        // magnitude 10^4×. min/max/avg are value-bounded (never grow
        // with row count) — 6dp is safe there at any corpus size.
        round(col("agg_sum").cast("double"), 2).as("agg_sum"),
        col("agg_cnt"),
        round(col("agg_min").cast("double"), 6).as("agg_min"),
        round(col("agg_max").cast("double"), 6).as("agg_max"),
        round(col("agg_avg"), 6).as("agg_avg"))
      .orderBy(col("event_type"))
  }

  val q66IncrementalAggSql: String =
    """SELECT event_type,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
      |    AS agg_sum,
      |  count(value) AS agg_cnt,
      |  round(CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
      |    AS agg_min,
      |  round(CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
      |    AS agg_max,
      |  round(CASE WHEN count(value) > 0 THEN
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |      / count(value) END, 6) AS agg_avg
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Arbitrary GROUPING SETS (the general form of q15's rollup / q16's
    * cube, gated separately because user-chosen set lists are the
    * common reporting shape): per (flag, status), per flag, and grand
    * total in ONE pass — Spark expands the sets with a single Expand
    * node feeding one aggregation, not one scan per set.
    */
  val q70GroupingSets: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q70GroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Time-series gap fill / daily resampling: every (user, day) cell
    * over the corpus's date span gets a row, zero-filled where no
    * events landed — the series regularization every downstream
    * rolling-window or forecasting step assumes. Shape: the dense
    * calendar is a per-user `sequence(d0, d1)` explode off a one-row
    * broadcast bounds aggregate (dimension GENERATION, not a stored
    * calendar table), and the sparse daily aggregate left-joins onto
    * it by (user, day) — one shuffle each side, no driver loop.
    */
  val q71GapFill: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val bounds = ev.agg(min(to_date(col("ts"))).as("d0"),
      max(to_date(col("ts"))).as("d1"))
    val days = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_raw"),
        round(sum(col("value")), 2).as("sv_raw"))
    days.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        coalesce(col("sv_raw"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("day"))
  }

  val q71GapFillSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts::DATE AS day, value FROM events
      |  WHERE user_id IS NOT NULL
      |), b AS (
      |  SELECT min(day) AS d0, max(day) AS d1 FROM ev
      |), days AS (
      |  SELECT user_id, unnest(generate_series(d0, d1,
      |    INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT DISTINCT user_id FROM ev), b
      |), daily AS (
      |  SELECT user_id, day, count(*) AS n_raw,
      |    round(sum(value), 2) AS sv_raw
      |  FROM ev GROUP BY 1, 2
      |)
      |SELECT d.user_id, d.day,
      |  coalesce(n_raw, 0) AS n, coalesce(sv_raw, 0) AS sum_value
      |FROM days d LEFT JOIN daily USING (user_id, day)
      |ORDER BY d.user_id, d.day""".stripMargin

  /** Forward fill (last observation carried forward) over the q71
    * dense series: gap days inherit the user's most recent observed
    * daily sum — the standard imputation before rolling statistics.
    * `last(_, ignoreNulls).over(rows unbounded preceding)` partitions
    * on user_id (high-cardinality — the safe window axis; the frame
    * is RUNNING, so Spark evaluates it in one pass without
    * re-scanning the partition per row).
    */
  val q72Locf: Q = (s, dir) => {
    val dense = q71GapFill(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("obs", when(col("n") > 0, col("sum_value")))
      .withColumn("sum_value_ff",
        coalesce(last(col("obs"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("user_id"), col("day"), col("n"), col("sum_value_ff"))
      .orderBy(col("user_id"), col("day"))
  }

  val q72LocfSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts::DATE AS day, value FROM events
      |  WHERE user_id IS NOT NULL
      |), b AS (
      |  SELECT min(day) AS d0, max(day) AS d1 FROM ev
      |), days AS (
      |  SELECT user_id, unnest(generate_series(d0, d1,
      |    INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT DISTINCT user_id FROM ev), b
      |), daily AS (
      |  SELECT user_id, day, count(*) AS n_raw,
      |    round(sum(value), 2) AS sv_raw
      |  FROM ev GROUP BY 1, 2
      |), dense AS (
      |  SELECT d.user_id, d.day, coalesce(n_raw, 0) AS n, sv_raw
      |  FROM days d LEFT JOIN daily USING (user_id, day)
      |)
      |SELECT user_id, day, n,
      |  coalesce(last_value(sv_raw IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day
      |    ROWS UNBOUNDED PRECEDING), 0) AS sum_value_ff
      |FROM dense ORDER BY user_id, day""".stripMargin

  /** q66's COUNT DISTINCT sibling: distinct users per event_type
    * maintained incrementally as mergeable HLL sketches
    * (IncrementalAgg.distinctPartial/Merge/Finish — fixed bytes per
    * key where the exact distinct set would be data-sized). No SQL
    * oracle can reproduce DataSketches estimates → rows-only gate,
    * with the exact count and relative error carried IN the result
    * (the ANN-recall pattern); IncrementalAggSpec asserts the merge
    * algebra (split-merge == one-shot) and the error bound.
    */
  val q69HllIncremental: Q = (s, dir) => {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir)
    val hist = graft.operators.IncrementalAgg.distinctPartial(
      ev.filter(col("ts") < split), Seq("event_type"), "user_id")
    val delta = graft.operators.IncrementalAgg.distinctPartial(
      ev.filter(col("ts") >= split), Seq("event_type"), "user_id")
    val est = graft.operators.IncrementalAgg.distinctFinish(
      graft.operators.IncrementalAgg.distinctMerge(hist, delta))
      .select(col("event_type"), col("est_distinct"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    est.join(exact, Seq("event_type"))
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct"))
          .cast("double") / col("exact_distinct"), 6))
      .orderBy(col("event_type"))
  }

  /** Contribution analysis (percent-of-parent / percent-of-total):
    * each (returnflag, linestatus) cell's revenue share within its
    * returnflag and of the grand total. ONE aggregation pass produces
    * the cells; the parent and total denominators are windows OVER
    * THE AGGREGATE (a handful of rows), so no second scan of lineitem
    * and no low-cardinality window ever touches raw data.
    */
  val q73Contribution: Q = (s, dir) => {
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    val parent = Window.partitionBy(col("l_returnflag"))
    val total = Window.partitionBy(lit(1))
    cells
      .withColumn("pct_of_flag",
        round(col("rev") / sum(col("rev")).over(parent) * 100, 4))
      .withColumn("pct_of_total",
        round(col("rev") / sum(col("rev")).over(total) * 100, 4))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("rev"), 2).as("revenue"),
        col("pct_of_flag"), col("pct_of_total"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q73ContributionSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag, l_linestatus,
      |    sum(l_extendedprice) AS rev
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT l_returnflag, l_linestatus,
      |  round(rev, 2) AS revenue,
      |  round(rev / sum(rev) OVER (PARTITION BY l_returnflag) * 100, 4)
      |    AS pct_of_flag,
      |  round(rev / sum(rev) OVER () * 100, 4) AS pct_of_total
      |FROM cells ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Stream-stream enrichment join, batch form: each purchase paired
    * with the same user's clicks in the preceding 10 minutes, THROUGH
    * [[graft.streaming.StreamJoin.enrich]] — the exact code path the
    * streaming runtime executes (the watermark node eliminates under
    * batch), so the oracle gates the shared join semantics while the
    * StreamJoinSpec proves the streaming-only behavior (state
    * eviction, late-row drop). Gap emitted in integer µs so no
    * timestamp type crosses the engine-compare boundary.
    */
  val q74StreamEnrich: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    def side(t: String, p: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id"), col("event_id").as(s"${p}_id"),
        col("ts").as(s"${p}_ts"))
    graft.streaming.StreamJoin.enrich(
      side("purchase", "p"), side("click", "c"), "user_id",
      "p_ts", "c_ts", lookbackSec = 600L, watermark = "10 minutes")
      .select(col("user_id"), col("p_id"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("gap_us"))
      .orderBy(col("p_id"), col("c_id"))
  }

  val q74StreamEnrichSql: String =
    """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
      |ORDER BY p_id, c_id""".stripMargin

  /** Winsorized robust aggregates: per-group p05/p95 bounds, values
    * clamped into the band, then mean/sum — the standard
    * outlier-robust statistic for metrics with heavy tails. Two-pass
    * shape: the bounds aggregate collapses to |groups| rows (tiny →
    * broadcast back), the clamp is a map-only least/greatest, and the
    * final agg is one shuffle — no per-group window sort of every
    * value, which is what a rank-based trim would cost at 100 TB. The
    * exact percentile pass is the q39 SortAggregate; at scale you'd
    * swap it for approx_percentile exactly as q39b does — the clamp
    * and final agg shapes are unchanged.
    */
  val q67Winsorize: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    // ONE percentile(array) buffer per group, not two independent
    // sort-aggregates — this was the whole suite's most expensive
    // query (3.7 s at sf0.1) with separate p05/p95 calls; a single
    // sorted buffer serves both cut points
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.05), lit(0.95))).as("b"))
      .select(col("l_returnflag"),
        element_at(col("b"), 1).as("lo"),
        element_at(col("b"), 2).as("hi"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .withColumn("w",
        least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("w")), 4).as("avg_winsorized"),
        round(sum(col("w")), 2).as("sum_winsorized"),
        round(avg(col("l_extendedprice")), 4).as("avg_raw"))
      .orderBy(col("l_returnflag"))
  }

  val q67WinsorizeSql: String =
    """WITH bounds AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS lo,
      |    quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l.l_returnflag, count(*) AS n,
      |  round(avg(least(greatest(l_extendedprice, lo), hi)), 4)
      |    AS avg_winsorized,
      |  round(sum(least(greatest(l_extendedprice, lo), hi)), 2)
      |    AS sum_winsorized,
      |  round(avg(l_extendedprice), 4) AS avg_raw
      |FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  /** q67's scale sibling, mirroring q39→q39b: the winsorize cut
    * points come from approx_percentile (GK sketch, one mergeable
    * pass, rank error ≤ n/10000) instead of the exact
    * percentile(array) buffer that holds every group value in memory
    * — the piece of q67 that cannot survive 100 TB. Clamp and final
    * aggregate shapes are unchanged. The exact bounds are ALSO
    * computed here purely as the gate's reference (the ns8-recall
    * posture): `rel_err` reports the approx-vs-exact winsorized-mean
    * gap in-result, rows-gated by the driver and bound-asserted in
    * PercentileSpec; a production run would drop the exact branch.
    */
  val q67bWinsorizeApprox: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val pts = array(lit(0.05), lit(0.95))
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"), pts, lit(10000))
          .as("ba"),
        percentile(col("l_extendedprice"), pts).as("be"))
      .select(col("l_returnflag"),
        element_at(col("ba"), 1).as("lo"),
        element_at(col("ba"), 2).as("hi"),
        element_at(col("be"), 1).as("lo_e"),
        element_at(col("be"), 2).as("hi_e"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        avg(least(greatest(col("l_extendedprice"), col("lo")),
          col("hi"))).as("avg_a"),
        avg(least(greatest(col("l_extendedprice"), col("lo_e")),
          col("hi_e"))).as("avg_e"))
      .select(col("l_returnflag"), col("n"),
        round(col("avg_a"), 4).as("avg_winsorized_approx"),
        round(abs(col("avg_a") - col("avg_e")) / abs(col("avg_e")), 6)
          .as("rel_err"))
      .orderBy(col("l_returnflag"))
  }

  /** Interval-overlap join (RangeJoin.intervalJoin): signup activity
    * windows × purchase activity windows that intersect in time, each
    * window [ts, ts + floor(value) seconds]. Arithmetic is integer
    * MICROSECONDS end to end (unix_micros / epoch_us) — both engines
    * agree exactly, no float-seconds epsilon. The engine plans the
    * covered-bucket equi-join with the canonical-bucket dedup; the
    * oracle states the naive quadratic overlap predicate.
    */
  val q68IntervalJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    def win(t: String, p: String) = ev
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"),
        unix_micros(col("ts")).as(s"${p}_s"),
        (unix_micros(col("ts"))
          + floor(col("value")).cast("long") * 1000000L).as(s"${p}_e"))
    graft.operators.RangeJoin.intervalJoin(
      win("signup", "i"), col("i_s"), col("i_e"),
      win("purchase", "j"), col("j_s"), col("j_e"),
      bucketWidth = 600e6) // 600 s of microseconds ≈ 2× window length
      .select(col("i_id").as("i"), col("j_id").as("j"),
        (least(col("i_e"), col("j_e"))
          - greatest(col("i_s"), col("j_s"))).as("overlap_us"))
      .orderBy(col("i"), col("j"))
  }

  val q68IntervalJoinSql: String =
    """WITH a AS (
      |  SELECT event_id AS i, epoch_us(ts) AS s,
      |    epoch_us(ts) + floor(value)::BIGINT * 1000000 AS e
      |  FROM events WHERE event_type = 'signup'
      |), b AS (
      |  SELECT event_id AS j, epoch_us(ts) AS s2,
      |    epoch_us(ts) + floor(value)::BIGINT * 1000000 AS e2
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT i, j, least(e, e2) - greatest(s, s2) AS overlap_us
      |FROM a JOIN b ON s <= e2 AND s2 <= e
      |ORDER BY i, j""".stripMargin

  /** Cohort retention: users grouped by first-activity week, counted
    * distinct in each subsequent week offset — the second classic
    * product-analytics matrix next to the q61 funnel. First touch is
    * a per-user window min — ONE events scan and one user_id shuffle
    * (a groupBy + self-join would scan and shuffle twice), and that
    * shuffle disappears on a user_id-bucketed layout; what remains is
    * the small cohort × offset exchange and the matrix sort. Null
    * user_ids are filtered explicitly: the oracle's JOIN ... USING
    * (user_id) drops them null-unsafely, and partitionBy would
    * instead pool them into one phantom cohort.
    */
  val q62CohortRetention: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("cohort_week",
        to_date(date_trunc("week", min(col("ts")).over(byUser))))
      .withColumn("week_offset",
        floor(datediff(to_date(col("ts")), col("cohort_week")) / 7))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q62CohortRetentionSql: String =
    """WITH firsts AS (
      |  SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT f.cohort_week,
      |  date_diff('day', f.cohort_week, e.ts::DATE) // 7 AS week_offset,
      |  count(DISTINCT e.user_id) AS n_active
      |FROM events e JOIN firsts f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Materialize a frame as a z-ordered parquet path once per session
    * (idempotent by path, the [[bucketedTable]] contract) and return
    * the read-back frame. Path tables have no catalog entry, so
    * first-write tracking is a JVM-local set; a stale directory from a
    * previous run is overwritten by writeZOrdered's Overwrite mode.
    */
  private val zOrderedWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Warehouse path a [[zOrderedTable]] write lands at — public so
    * graft.Plans can measure the raw (sort-free) scan over the same
    * table the registry query reads: measuring THROUGH the q63 plan
    * would double-count the scan metric (its global sort adds a
    * range-partitioner sampling pass that executes the scan subtree a
    * second time into the same metric).
    */
  def zOrderedTablePath(s: SparkSession, dir: String, base: String): String = {
    val name = (base + "_" + dir).replaceAll("[^A-Za-z0-9]+", "_")
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
      name.toLowerCase(java.util.Locale.ROOT)).toString
  }

  private def zOrderedTable(s: SparkSession, dir: String, base: String,
      df: => DataFrame, zCols: Seq[String]): DataFrame = {
    val path = zOrderedTablePath(s, dir, base)
    if (zOrderedWritten.add(path))
      graft.sources.Layout.writeZOrdered(df, path, zCols,
        buckets = 64, targetFiles = 32)
    s.read.parquet(path)
  }

  /** Range scan over a [[graft.sources.Layout.writeZOrdered]] orders
    * table, filtering on BOTH clustered columns — the z-order layout
    * proof at registry/bench scale (LayoutSpec shows the per-file
    * min-max mechanics at toy scale). Both predicates reach the
    * parquet reader as PushedFilters, and because the z-layout keeps
    * per-file/row-group min-max tight on EACH clustered column, the
    * scan skips most row groups; a lexicographic sort could prune on
    * its leading column only (the deliberately near-vacuous
    * o_custkey >= 100 leaves a leading-column-sorted baseline reading
    * ~everything — `graft.Plans` dumps the measured rows-read delta).
    * Same results as a plain scan, stated by the oracle: layout must
    * never change answers.
    */
  val q63ZOrderScan: Q = (s, dir) =>
    zOrderedTable(s, dir, "orders_zorder", Tables.orders(s, dir),
      Seq("o_custkey", "o_totalprice"))
      .filter(col("o_custkey") >= 100 &&
        col("o_totalprice").between(100000, 150000))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val q63ZOrderScanSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey >= 100 AND o_totalprice BETWEEN 100000 AND 150000
      |ORDER BY o_orderkey""".stripMargin

  /** J3: cross-app foreign-key traversal — the reference's `app` fields
    * store arrays of referenced item ids (PodioApiWrapper.py:68-69);
    * here the ref array is assembled per order, exploded back, and
    * resolved against the part "app" via an AQE-chosen join (part is
    * SF-proportional — no forced broadcast).
    */
  val q40FkExplode: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("part_refs"))
      .select(col("l_orderkey"), explode(col("part_refs")).as("p_ref"))
      .join(Tables.part(s, dir), col("p_ref") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_ref_parts"),
        round(sum(col("p_retailprice")), 2).as("refs_retail"))
      .orderBy(col("l_orderkey"))

  val q40FkExplodeSql: String =
    """SELECT l_orderkey, count(*) AS n_ref_parts,
      |  round(sum(p_retailprice), 2) AS refs_retail
      |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** Correlated EXISTS / NOT EXISTS through the Spark SQL entry point —
    * Catalyst decorrelates both into semi/anti joins (no per-row
    * subquery execution, unlike the reference's per-event lookups).
    */
  val q41Exists: Q = (s, dir) => {
    // Unique per-call view names: a fixed createOrReplaceTempView here
    // would mutate SESSION state, so two concurrent callers with
    // different `dir`s would race on the global name and one would
    // silently read the other's tables. The views are dropped before
    // returning — sql() has already resolved the plan, so the returned
    // DataFrame no longer needs them.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (cv, ov) = (s"customer_$tag", s"orders_$tag")
    Tables.customer(s, dir).createOrReplaceTempView(cv)
    Tables.orders(s, dir).createOrReplaceTempView(ov)
    try s.sql(
      s"""SELECT c_custkey, c_name FROM $cv c
         |WHERE EXISTS (SELECT 1 FROM $ov o
         |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
         |  AND NOT EXISTS (SELECT 1 FROM $ov o
         |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
         |ORDER BY c_custkey""".stripMargin)
    finally {
      s.catalog.dropTempView(cv)
      s.catalog.dropTempView(ov)
    }
  }

  val q41ExistsSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** As-of join (graft.operators.AsOfJoin): latest event at-or-before
    * each order date per customer — one shuffle, union+window, no range
    * explosion. Oracle = deterministic correlated struct-max.
    */
  val q42Asof: Q = (s, dir) =>
    graft.operators.AsOfJoin.asofBackward(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
      Tables.events(s, dir),
      leftKey = "o_custkey", rightKey = "user_id",
      leftTime = "o_orderdate", rightTime = "ts",
      payload = Seq("event_id"), tiebreak = "event_id")
      .select(col("o_orderkey"), col("asof_event_id").as("last_event_id"))
      .orderBy(col("o_orderkey"))

  val q42AsofSql: String =
    """SELECT o_orderkey,
      |  (SELECT (max({'ts': e.ts, 'e': e.event_id})).e FROM events e
      |   WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
      |    AS last_event_id
      |FROM orders o ORDER BY o_orderkey""".stripMargin

  /** Forward as-of with tolerance: the FIRST event at-or-after each
    * order date per customer, but only within 30 days (pandas
    * merge_asof direction='forward' + tolerance semantics). Same
    * union+window single-shuffle plan as q42.
    */
  val q42bAsofForward: Q = (s, dir) =>
    graft.operators.AsOfJoin.asofForward(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
      Tables.events(s, dir),
      leftKey = "o_custkey", rightKey = "user_id",
      leftTime = "o_orderdate", rightTime = "ts",
      payload = Seq("event_id"), tiebreak = "event_id",
      tolerance = Some("INTERVAL 30 DAYS"))
      .select(col("o_orderkey"), col("asof_event_id").as("next_event_id"))
      .orderBy(col("o_orderkey"))

  val q42bAsofForwardSql: String =
    """SELECT o_orderkey,
      |  (SELECT (min({'ts': e.ts, 'e': e.event_id})).e FROM events e
      |   WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |     AND e.ts <= o.o_orderdate + INTERVAL 30 DAY)
      |    AS next_event_id
      |FROM orders o ORDER BY o_orderkey""".stripMargin

  /** A2: group-into-map (the reference's `all_items[item_id] = ...`,
    * PodioApiWrapper.py:127-139) — map built per user, then key lookups
    * projected back out (missing key → null on both engines).
    */
  val q43MapAgg: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n")))))
        .as("m"))
      .select(col("user_id"),
        element_at(col("m"), "click").as("n_click"),
        element_at(col("m"), "purchase").as("n_purchase"),
        element_at(col("m"), "view").as("n_view"))
      .orderBy(col("user_id"))

  val q43MapAggSql: String =
    """SELECT user_id,
      |  nullif(count(*) FILTER (WHERE event_type = 'click'), 0) AS n_click,
      |  nullif(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchase,
      |  nullif(count(*) FILTER (WHERE event_type = 'view'), 0) AS n_view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** O4: offset pagination (the reference's page loop,
    * PodioApiWrapper.py:125-140) — ordered offset+limit.
    */
  val q44Offset: Q = (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(100).limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))

  val q44OffsetSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 100""".stripMargin

  /** U1 multiset variants: EXCEPT ALL / INTERSECT ALL, re-aggregated to
    * a deterministic per-key multiplicity table.
    */
  val q45SetopsAll: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_quantity") >= 48).select(col("l_suppkey"))
    val b = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    a.exceptAll(b).withColumn("op", lit("except_all"))
      .union(a.intersectAll(b).withColumn("op", lit("intersect_all")))
      .groupBy(col("op"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("op"), col("l_suppkey"))
  }

  val q45SetopsAllSql: String =
    """SELECT 'except_all' AS op, l_suppkey, count(*) AS n FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48
      |  EXCEPT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R') GROUP BY 2
      |UNION ALL
      |SELECT 'intersect_all' AS op, l_suppkey, count(*) AS n FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48
      |  INTERSECT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R') GROUP BY 2
      |ORDER BY op, l_suppkey""".stripMargin

  /** P1 end-to-end: the clean_item dispatch (graft.etl.CleanFields)
    * over Podio-shaped payloads synthesized from `part` — text with
    * HTML, money, multi-value date, calculation fallback, and an
    * unknown type that must be excluded from the cleaned map. The
    * oracle states the *semantics* (what each field cleans to), not
    * the plumbing, so it doubles as a behavioral spec.
    */
  /** Podio-shaped raw items synthesized from `part` (shared by q46 and
    * the q53 rejects path).
    */
  private def rawPodioItems(s: SparkSession, dir: String) =
    Tables.part(s, dir).select(col("p_partkey").as("item_id"),
      array(
        struct(lit(1L).as("field_id"), lit("name").as("label"),
          lit("text").as("type"),
          array(concat(lit("{\"value\": \"<b>"), col("p_name"),
            lit("</b>\"}"))).as("values")),
        struct(lit(2L).as("field_id"), lit("price").as("label"),
          lit("money").as("type"),
          array(concat(lit("{\"value\": \""), col("p_retailprice"),
            lit("\"}"))).as("values")),
        struct(lit(3L).as("field_id"), lit("when").as("label"),
          lit("date").as("type"),
          array(lit("{\"start\": \"2024-01-05\"}"),
            lit("{\"start\": \"2024-02-06\"}")).as("values")),
        struct(lit(4L).as("field_id"), lit("size").as("label"),
          lit("calculation").as("type"),
          array(concat(lit("{\"value\": \""), col("p_size"),
            lit("\"}"))).as("values")),
        struct(lit(5L).as("field_id"), lit("weird").as("label"),
          lit("mystery").as("type"), array(lit("{}")).as("values"))
      ).as("fields"))

  val q46CleanFields: Q = (s, dir) =>
    graft.etl.CleanFields.cleanItems(rawPodioItems(s, dir))
      .select(col("item_id"),
        col("data")("1")("field_value").as("name_clean"),
        col("data")("2")("field_value").as("price_clean"),
        col("data")("3")("field_value").as("dates_clean"),
        col("data")("4")("field_value").as("calc_clean"),
        col("data")("5")("field_value").as("unknown_clean"),
        size(map_keys(col("data"))).as("n_fields"))
      .orderBy(col("item_id"))

  val q46CleanFieldsSql: String =
    """SELECT p_partkey AS item_id,
      |  regexp_replace('<b>' || p_name || '</b>', '<.*?>', '', 'g') AS name_clean,
      |  (p_retailprice::VARCHAR)::DOUBLE::VARCHAR AS price_clean,
      |  '2024-01-05,2024-02-06' AS dates_clean,
      |  (p_size::DOUBLE)::VARCHAR AS calc_clean,
      |  NULL::VARCHAR AS unknown_clean,
      |  4 AS n_fields
      |FROM part ORDER BY item_id""".stripMargin

  /** The dead-letter path (PodioApiWrapper.py:91-94): unknown-typed
    * fields route to a rejects frame instead of the cleaned map.
    */
  val q53Rejects: Q = (s, dir) =>
    graft.etl.CleanFields.rejects(rawPodioItems(s, dir))
      .groupBy(col("field_type"))
      .agg(count(lit(1)).as("n"), min(col("item_id")).as("first_item"))
      .orderBy(col("field_type"))

  val q53RejectsSql: String =
    """SELECT 'mystery' AS field_type, count(*) AS n,
      |  min(p_partkey) AS first_item
      |FROM part GROUP BY 1 ORDER BY field_type""".stripMargin

  /** A3/S7: the catalog crawl's two-level nested grouping
    * (space → apps, PodioApiWrapper.py:249-267) with the F4 negative
    * space filter, then scalar projections off the nested shape.
    */
  val q47CatalogNested: Q = (s, dir) =>
    Tables.region(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("r_regionkey") === col("n_regionkey"))
      .filter(col("r_name") =!= "AFRICA")
      .groupBy(col("r_name"))
      .agg(array_sort(collect_list(
        struct(col("n_name"), col("n_nationkey")))).as("apps"))
      .select(col("r_name"),
        size(col("apps")).as("n_apps"),
        element_at(col("apps"), 1)("n_name").as("first_app"),
        element_at(col("apps"), -1)("n_name").as("last_app"))
      .orderBy(col("r_name"))

  val q47CatalogNestedSql: String =
    """SELECT r_name, count(*) AS n_apps,
      |  min(n_name) AS first_app, max(n_name) AS last_app
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |WHERE r_name <> 'AFRICA'
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** S6 metadata fidelity: the full field catalog — every table, every
    * column, with the reference's complete per-field projection
    * {hidden, type, return_type-defaulting-to-type}
    * (PodioApiWrapper.py:226-234). The oracle derives the SAME metadata
    * from DuckDB's independent schema inference over the identical
    * parquet files (information_schema.columns on the registered
    * views), mapping DuckDB type names onto Spark simpleStrings — two
    * engines inferring one schema is a real cross-check, not a VALUES
    * literal.
    */
  val q54FieldCatalog: Q = (s, dir) =>
    graft.meta.Catalog.fields(s, dir)
      .orderBy(col("app_name"), col("field_index"))

  val q54FieldCatalogSql: String =
    """SELECT table_name AS app_name,
      |  (ordinal_position - 1)::BIGINT AS field_index,
      |  column_name AS field_name,
      |  CASE data_type
      |    WHEN 'BIGINT' THEN 'bigint'
      |    WHEN 'INTEGER' THEN 'int'
      |    WHEN 'DOUBLE' THEN 'double'
      |    WHEN 'FLOAT' THEN 'float'
      |    WHEN 'VARCHAR' THEN 'string'
      |    WHEN 'TIMESTAMP' THEN 'timestamp'
      |    WHEN 'DATE' THEN 'date'
      |    WHEN 'FLOAT[]' THEN 'array<float>'
      |    WHEN 'DOUBLE[]' THEN 'array<double>'
      |    ELSE lower(data_type) END AS data_type,
      |  (is_nullable = 'YES') AS nullable,
      |  starts_with(column_name, '_') AS hidden,
      |  CASE data_type
      |    WHEN 'BIGINT' THEN 'bigint'
      |    WHEN 'INTEGER' THEN 'int'
      |    WHEN 'DOUBLE' THEN 'double'
      |    WHEN 'FLOAT' THEN 'float'
      |    WHEN 'VARCHAR' THEN 'string'
      |    WHEN 'TIMESTAMP' THEN 'timestamp'
      |    WHEN 'DATE' THEN 'date'
      |    WHEN 'FLOAT[]' THEN 'array<float>'
      |    WHEN 'DOUBLE[]' THEN 'array<double>'
      |    ELSE lower(data_type) END AS return_type
      |FROM information_schema.columns
      |WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
      |  'part', 'orders', 'lineitem', 'events', 'documents', 'embeddings')
      |ORDER BY app_name, field_index""".stripMargin

  /** TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    * revenue per order, top-10. The canonical multi-join plan the
    * optimizer must get right at 100 TB: customer is SF-proportional,
    * so even segment-filtered it outgrows a broadcast eventually —
    * AQE's runtime size estimate decides broadcast-vs-shuffle per SF
    * instead of a hint deciding it forever.
    */
  val q48MultiJoin: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderdate") < "2024-06-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  val q48MultiJoinSql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '2024-06-01'
      |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** q48 with the fact-fact join (lineitem ⋈ orders) over same-key
    * bucketed tables — the layout that matters most at 100 TB, where
    * NEITHER side of the biggest join broadcasts: 8-way bucketing on
    * the order key deletes that join's Exchange entirely (the `merge`
    * hint pins SMJ for the reason documented on q6b), and only the
    * small segment-filtered customer join shuffles/broadcasts after.
    * Same oracle as q48.
    */
  val q48bBucketedJoin: Q = (s, dir) => {
    val li = bucketedTable(s, dir, "lineitem_bkt",
      Tables.lineitem(s, dir), "l_orderkey", 8)
    val ord = bucketedTable(s, dir, "orders_bkt",
      Tables.orders(s, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
      "l_orderkey", 8)
    li.hint("merge")
      .join(ord.filter(col("o_orderdate") < "2024-06-01"),
        Seq("l_orderkey"))
      .join(Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey").as("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-table star — region→nation→customer→orders→
    * lineitem→supplier with the co-nation supplier predicate. Only the
    * genuinely fixed-size dims (region: 5 rows, nation: 25 rows) carry
    * broadcast hints; customer/supplier/orders grow with scale factor,
    * so their join strategies are AQE's call — a forced broadcast of
    * customer at 100× SF is an executor OOM, not a plan.
    */
  val q49StarJoin: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))

  val q49StarJoinSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Distribution analytics over window frames: ntile, percent_rank,
    * cume_dist, and a RANGE frame average (q21's running sum is ROWS;
    * RANGE closes the frame-type surface).
    */
  val q50WindowAnalytics: Q = (s, dir) => {
    // c_custkey tiebreak: ntile bucket assignment at a boundary is
    // otherwise row-order dependent (the q17 failure mode)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    // RANGE frame over an INTEGER ordering column: float range
    // boundaries (acctbal - 100) hit engine-specific rounding at the
    // frame edge; integer arithmetic is exact in both engines.
    val wRange = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_custkey"))
      .rangeBetween(-100, 0)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("bal_quartile"),
        round(percent_rank().over(w), 6).as("bal_pct_rank"),
        round(cume_dist().over(w), 6).as("bal_cume_dist"),
        // order-independent aggs over the RANGE frame (a float SUM's
        // accumulation order differs between engines at the last ulp)
        count(lit(1)).over(wRange).as("n_near"),
        round(max(col("c_acctbal")).over(wRange), 2).as("max_near_bal"))
      .orderBy(col("c_custkey"))
  }

  val q50WindowAnalyticsSql: String =
    """SELECT c_custkey, c_mktsegment,
      |  ntile(4) OVER w AS bal_quartile,
      |  round(percent_rank() OVER w, 6) AS bal_pct_rank,
      |  round(cume_dist() OVER w, 6) AS bal_cume_dist,
      |  count(*) OVER wr AS n_near,
      |  round(max(c_acctbal) OVER wr, 2) AS max_near_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
      |  wr AS (PARTITION BY c_mktsegment ORDER BY c_custkey
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
      |ORDER BY c_custkey""".stripMargin

  /** Higher-order array functions (the X-surface generalized):
    * filter → transform → aggregate over the split word array, plus
    * exists/zip_with — all codegen'd, no UDFs.
    */
  val q51ArrayOps: Q = (s, dir) => {
    val w = split(col("p_name"), " ")
    Tables.part(s, dir)
      .select(col("p_partkey"),
        size(filter(w, x => length(x) > 4)).as("n_long_words"),
        concat_ws(",", transform(w, x => upper(x))).as("upper_words"),
        aggregate(w, lit(0), (acc, x) => acc + length(x)).as("total_len"),
        exists(w, x => x === "red").as("has_red"),
        concat_ws(",", zip_with(w, reverse(w),
          (a, b) => concat(a, lit("|"), b))).as("zipped"))
      .orderBy(col("p_partkey"))
  }

  val q51ArrayOpsSql: String =
    """SELECT p_partkey,
      |  len(list_filter(string_split(p_name, ' '), x -> len(x) > 4)) AS n_long_words,
      |  array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), ',') AS upper_words,
      |  list_reduce(list_prepend(0, [len(x) FOR x IN string_split(p_name, ' ')]), (a, b) -> a + b) AS total_len,
      |  list_contains(string_split(p_name, ' '), 'red') AS has_red,
      |  array_to_string([string_split(p_name, ' ')[i] || '|' || list_reverse(string_split(p_name, ' '))[i]
      |    FOR i IN range(1, len(string_split(p_name, ' ')) + 1)], ',') AS zipped
      |FROM part ORDER BY p_partkey""".stripMargin

  /** X12 as schema-full JSON decode: from_json with an explicit struct
    * schema (get_json_object covers the schemaless path in q33).
    */
  val q52FromJson: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, tag STRING"))
          .as("p"))
      .select(col("event_id"), col("p.k").as("k"), col("p.tag").as("tag"))
      .orderBy(col("event_id"))

  val q52FromJsonSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  json_extract_string(props, '$.tag') AS tag
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ registry

  def all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q2_filtered_scan" -> q2FilteredScan,
    "q3_event_filter" -> q3EventFilter,
    "q4_composite_key" -> q4CompositeKey,
    "q5_proj_default" -> q5ProjDefault,
    "q6_lookup_join" -> q6LookupJoin,
    "q7_catalog_join" -> q7CatalogJoin,
    "q8_revenue_brand" -> q8RevenueBrand,
    "q9_anti_join" -> q9AntiJoin,
    "q10_semi_join" -> q10SemiJoin,
    "q11_cross_join" -> q11CrossJoin,
    "q12_theta_join" -> q12ThetaJoin,
    "q13_outer_join" -> q13OuterJoin,
    "q14_distinct_agg" -> q14DistinctAgg,
    "q15_rollup" -> q15Rollup,
    "q16_cube" -> q16Cube,
    "q17_min_by" -> q17MinBy,
    "q18_string_agg" -> q18StringAgg,
    "q19_stats_agg" -> q19StatsAgg,
    "q19b_approx_distinct" -> q19bApproxDistinct,
    "q20_scd2_current" -> q20Scd2Current,
    "ns70_scd2_forget" -> ns70Scd2Forget,
    "ns70b_scd2_forget_part" -> ns70bScd2ForgetPart,
    "ns70c_scd2_forget_deep" -> ns70cScd2ForgetDeep,
    "ns70d_forget_ledger" -> ns70dForgetLedger,
    "ns70e_erasure_queue" -> ns70eErasureQueue,
    "ns70f_erasure_compacted" -> ns70fErasureCompacted,
    "q20b_scd2_current_agg" -> q20bScd2CurrentAgg,
    "q21_running_sum" -> q21RunningSum,
    "q22_lag_lead" -> q22LagLead,
    "q23_rank" -> q23Rank,
    "q24_topk_per_group" -> q24TopkPerGroup,
    "q25_topk_global" -> q25TopkGlobal,
    "q26_set_ops" -> q26SetOps,
    "q27_distinct" -> q27Distinct,
    "q28_html_strip" -> q28HtmlStrip,
    "q29_word_sort" -> q29WordSort,
    "q30_date_funcs" -> q30DateFuncs,
    "q31_try_cast" -> q31TryCast,
    "q32_ts_format" -> q32TsFormat,
    "q33_json" -> q33Json,
    "q34_snapshot" -> q34Snapshot,
    "q35_case_dispatch" -> q35CaseDispatch,
    "q36_tumbling_window" -> q36TumblingWindow,
    "q37_session_window" -> q37SessionWindow,
    "q38_pivot" -> q38Pivot,
    "q39_percentile" -> q39Percentile,
    "q40_fk_explode" -> q40FkExplode,
    "q41_exists" -> q41Exists,
    "q42_asof" -> q42Asof,
    "q42b_asof_forward" -> q42bAsofForward,
    "q43_map_agg" -> q43MapAgg,
    "q44_offset" -> q44Offset,
    "q45_setops_all" -> q45SetopsAll,
    "q46_clean_fields" -> q46CleanFields,
    "q47_catalog_nested" -> q47CatalogNested,
    "q48_multi_join" -> q48MultiJoin,
    "q49_star_join" -> q49StarJoin,
    "q50_window_analytics" -> q50WindowAnalytics,
    "q51_array_ops" -> q51ArrayOps,
    "q52_from_json" -> q52FromJson,
    "q53_rejects" -> q53Rejects,
    "q54_field_catalog" -> q54FieldCatalog,
    "q12b_range_join" -> q12bRangeJoin,
    "q6b_bucketed_join" -> q6bBucketedJoin,
    "q48b_bucketed_join" -> q48bBucketedJoin,
    "q39b_approx_percentile" -> q39bApproxPercentile,
    "q55_profile" -> q55Profile,
    "q56_ref_integrity" -> q56RefIntegrity,
    "q57_key_audit" -> q57KeyAudit,
    "q58_retention" -> q58Retention,
    "q59_snapshot_asof" -> q59SnapshotAsof,
    "q60_version_diff" -> q60VersionDiff,
    "q61_funnel" -> q61Funnel,
    "q62_cohort_retention" -> q62CohortRetention,
    "q63_zorder_scan" -> q63ZOrderScan,
    "q64_funnel_timed" -> q64FunnelTimed,
    "q65_sessionize" -> q65Sessionize,
    "q66_incremental_agg" -> q66IncrementalAgg,
    "q67_winsorize" -> q67Winsorize,
    "q67b_winsorize_approx" -> q67bWinsorizeApprox,
    "q68_interval_join" -> q68IntervalJoin,
    "q69_hll_incremental" -> q69HllIncremental,
    "q70_grouping_sets" -> q70GroupingSets,
    "q71_gap_fill" -> q71GapFill,
    "q72_locf" -> q72Locf,
    "q73_contribution" -> q73Contribution,
    "q74_stream_enrich" -> q74StreamEnrich,
    "q75_sliding_window" -> q75SlidingWindow,
    "q76_unpivot" -> q76Unpivot,
    "q77_rolling_range" -> q77RollingRange,
    "q78_skew_profile" -> q78SkewProfile,
    "q79_fuzzy_dedup" -> q79FuzzyDedup,
    "q80_incremental_join" -> q80IncrementalJoin,
    "q81_rfm" -> q81Rfm,
    "q82_basket" -> q82Basket,
    "q82b_basket_salted" -> q82bBasketSalted,
    "q83_expectations" -> q83Expectations,
    "q84_attribution" -> q84Attribution,
    "q85_drift" -> q85Drift,
    "q86_outliers" -> q86Outliers,
    "q87_incremental_mv" -> q87IncrementalMv,
    "q88_multi_touch" -> q88MultiTouch,
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q2_filtered_scan" -> q2FilteredScanSql,
    "q3_event_filter" -> q3EventFilterSql,
    "q4_composite_key" -> q4CompositeKeySql,
    "q5_proj_default" -> q5ProjDefaultSql,
    "q6_lookup_join" -> q6LookupJoinSql,
    "q7_catalog_join" -> q7CatalogJoinSql,
    "q8_revenue_brand" -> q8RevenueBrandSql,
    "q9_anti_join" -> q9AntiJoinSql,
    "q10_semi_join" -> q10SemiJoinSql,
    "q11_cross_join" -> q11CrossJoinSql,
    "q12_theta_join" -> q12ThetaJoinSql,
    "q13_outer_join" -> q13OuterJoinSql,
    "q14_distinct_agg" -> q14DistinctAggSql,
    "q15_rollup" -> q15RollupSql,
    "q16_cube" -> q16CubeSql,
    "q17_min_by" -> q17MinBySql,
    "q18_string_agg" -> q18StringAggSql,
    "q19_stats_agg" -> q19StatsAggSql,
    "q20_scd2_current" -> q20Scd2CurrentSql,
    "ns70_scd2_forget" -> ns70Scd2ForgetSql,
    "ns70b_scd2_forget_part" -> ns70bScd2ForgetPartSql,
    "ns70c_scd2_forget_deep" -> ns70cScd2ForgetDeepSql,
    "ns70d_forget_ledger" -> ns70dForgetLedgerSql,
    "ns70e_erasure_queue" -> ns70eErasureQueueSql,
    "ns70f_erasure_compacted" -> ns70fErasureCompactedSql,
    "q20b_scd2_current_agg" -> q20Scd2CurrentSql,
    "q21_running_sum" -> q21RunningSumSql,
    "q22_lag_lead" -> q22LagLeadSql,
    "q23_rank" -> q23RankSql,
    "q24_topk_per_group" -> q24TopkPerGroupSql,
    "q25_topk_global" -> q25TopkGlobalSql,
    "q26_set_ops" -> q26SetOpsSql,
    "q27_distinct" -> q27DistinctSql,
    "q28_html_strip" -> q28HtmlStripSql,
    "q29_word_sort" -> q29WordSortSql,
    "q30_date_funcs" -> q30DateFuncsSql,
    "q31_try_cast" -> q31TryCastSql,
    "q32_ts_format" -> q32TsFormatSql,
    "q33_json" -> q33JsonSql,
    "q34_snapshot" -> q34SnapshotSql,
    "q35_case_dispatch" -> q35CaseDispatchSql,
    "q36_tumbling_window" -> q36TumblingWindowSql,
    "q37_session_window" -> q37SessionWindowSql,
    "q38_pivot" -> q38PivotSql,
    "q39_percentile" -> q39PercentileSql,
    "q40_fk_explode" -> q40FkExplodeSql,
    "q41_exists" -> q41ExistsSql,
    "q42_asof" -> q42AsofSql,
    "q42b_asof_forward" -> q42bAsofForwardSql,
    "q43_map_agg" -> q43MapAggSql,
    "q44_offset" -> q44OffsetSql,
    "q45_setops_all" -> q45SetopsAllSql,
    "q46_clean_fields" -> q46CleanFieldsSql,
    "q47_catalog_nested" -> q47CatalogNestedSql,
    "q48_multi_join" -> q48MultiJoinSql,
    "q49_star_join" -> q49StarJoinSql,
    "q50_window_analytics" -> q50WindowAnalyticsSql,
    "q51_array_ops" -> q51ArrayOpsSql,
    "q52_from_json" -> q52FromJsonSql,
    "q53_rejects" -> q53RejectsSql,
    "q54_field_catalog" -> q54FieldCatalogSql,
    "q12b_range_join" -> q12ThetaJoinSql,
    "q6b_bucketed_join" -> q6LookupJoinSql,
    "q48b_bucketed_join" -> q48MultiJoinSql,
    "q55_profile" -> q55ProfileSql,
    "q56_ref_integrity" -> q56RefIntegritySql,
    "q57_key_audit" -> q57KeyAuditSql,
    "q58_retention" -> q58RetentionSql,
    "q59_snapshot_asof" -> q59SnapshotAsofSql,
    "q60_version_diff" -> q60VersionDiffSql,
    "q61_funnel" -> q61FunnelSql,
    "q62_cohort_retention" -> q62CohortRetentionSql,
    "q63_zorder_scan" -> q63ZOrderScanSql,
    "q64_funnel_timed" -> q64FunnelTimedSql,
    "q65_sessionize" -> q65SessionizeSql,
    "q66_incremental_agg" -> q66IncrementalAggSql,
    "q67_winsorize" -> q67WinsorizeSql,
    "q68_interval_join" -> q68IntervalJoinSql,
    "q70_grouping_sets" -> q70GroupingSetsSql,
    "q71_gap_fill" -> q71GapFillSql,
    "q72_locf" -> q72LocfSql,
    "q73_contribution" -> q73ContributionSql,
    "q74_stream_enrich" -> q74StreamEnrichSql,
    "q75_sliding_window" -> q75SlidingWindowSql,
    "q76_unpivot" -> q76UnpivotSql,
    "q77_rolling_range" -> q77RollingRangeSql,
    "q78_skew_profile" -> q78SkewProfileSql,
    "q79_fuzzy_dedup" -> q79FuzzyDedupSql,
    "q80_incremental_join" -> q80IncrementalJoinSql,
    "q81_rfm" -> q81RfmSql,
    "q82_basket" -> q82BasketSql,
    "q82b_basket_salted" -> q82BasketSql,
    "q83_expectations" -> q83ExpectationsSql,
    "q84_attribution" -> q84AttributionSql,
    "q85_drift" -> q85DriftSql,
    "q86_outliers" -> q86OutliersSql,
    "q87_incremental_mv" -> q87IncrementalMvSql,
    "q88_multi_touch" -> q88MultiTouchSql,
  )
}
