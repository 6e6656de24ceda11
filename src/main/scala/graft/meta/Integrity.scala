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
    val p = parent.select(col(parentKey).as("_k"))
    c.join(p, Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(c.agg(count(lit(1)).as("n_child_rows")))
      .select(lit(relation).as("relation"), col("n_child_rows"),
        col("n_orphans"))
  }

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
}
