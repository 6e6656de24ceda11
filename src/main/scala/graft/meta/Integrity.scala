package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Referential-integrity audit — [[Profile]]'s sibling in the
  * data-integrity toolkit the reference's migration story calls for
  * (README.md:3-8): for each foreign-key relation, how many child rows
  * point at a missing parent. The load-order / partial-failure bugs
  * behind "85% data integrity" show up exactly here.
  *
  * Shape per relation: one left-anti join (child keys vs parent keys)
  * + one count, unioned into a single small report. Each anti-join
  * shuffles only the key columns; at 100 TB the parent key sets of
  * genuine dims broadcast, and AQE decides for the SF-proportional
  * ones like any other join in this engine.
  */
object Integrity {

  /** One relation's audit row: child/parent table names and columns
    * are metadata, the counts are the finding.
    */
  def orphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, relation: String): DataFrame = {
    val c = child.select(col(childKey).as("_k")).filter(col("_k").isNotNull)
    // ONE scan of the child: a left join against the distinct parent
    // keys yields both counts from the same pass (the earlier
    // anti-join + separate count formulation read the child twice —
    // six lineitem scans across audit() at the 100 TB posture)
    val p = parent.select(col(parentKey).as("_k"))
      .filter(col("_k").isNotNull).distinct()
      .withColumn("_hit", lit(1))
    c.join(p, Seq("_k"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        count(when(col("_hit").isNull, 1)).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_child_rows"),
        col("n_orphans"))
  }

  /** Primary-key uniqueness audit: per table, how many key values
    * carry more than one row (and how many surplus rows they add) —
    * the other half of the integrity report ([[orphans]] checks
    * outgoing edges; this checks the keys those edges land on).
    * One partial+final count aggregate per table, then a count over
    * the violating groups; the heavy shuffle is the per-key count,
    * which is the same exchange a dedup would need anyway.
    */
  def duplicateKeys(df: DataFrame, key: String, table: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_dup_keys"),
        coalesce(sum(col("n") - 1), lit(0L)).as("n_surplus_rows"))
      .select(lit(table).as("table_name"), col("n_dup_keys"),
        col("n_surplus_rows"))

  /** The standard audit over the testdata star schema: every FK edge,
    * one row each.
    */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.table(spark, dir, n)
    Seq(
      orphans(t("lineitem"), "l_orderkey", t("orders"), "o_orderkey",
        "lineitem.l_orderkey->orders"),
      orphans(t("lineitem"), "l_partkey", t("part"), "p_partkey",
        "lineitem.l_partkey->part"),
      orphans(t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey",
        "lineitem.l_suppkey->supplier"),
      orphans(t("orders"), "o_custkey", t("customer"), "c_custkey",
        "orders.o_custkey->customer"),
      orphans(t("customer"), "c_nationkey", t("nation"), "n_nationkey",
        "customer.c_nationkey->nation"),
      orphans(t("supplier"), "s_nationkey", t("nation"), "n_nationkey",
        "supplier.s_nationkey->nation"),
      orphans(t("nation"), "n_regionkey", t("region"), "r_regionkey",
        "nation.n_regionkey->region"),
      orphans(t("events"), "user_id", t("customer"), "c_custkey",
        "events.user_id->customer")
    ).reduce(_ unionByName _)
  }

  /** Key-uniqueness audit over every table's primary key. */
  def keyAudit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.table(spark, dir, n)
    Seq(
      duplicateKeys(t("region"), "r_regionkey", "region"),
      duplicateKeys(t("nation"), "n_nationkey", "nation"),
      duplicateKeys(t("customer"), "c_custkey", "customer"),
      duplicateKeys(t("supplier"), "s_suppkey", "supplier"),
      duplicateKeys(t("part"), "p_partkey", "part"),
      duplicateKeys(t("orders"), "o_orderkey", "orders"),
      duplicateKeys(t("events"), "event_id", "events"),
      duplicateKeys(t("documents"), "doc_id", "documents"),
      duplicateKeys(t("embeddings"), "vec_id", "embeddings")
    ).reduce(_ unionByName _)
  }
}
