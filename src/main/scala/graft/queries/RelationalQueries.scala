package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator-inventory query registry (SURVEY.md §2).
  *
  * Each entry is a named DataFrame query over the driver testdata plus —
  * where expressible — an equivalent DuckDB oracle SQL string. Names,
  * aliases, ordering and rounding are deliberately identical on both
  * sides so the driver's column-sorted hash compare matches.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A4 + TPC-H Q1 shape: filtered scan → partial+final hash agg.
    * Scale: map-side combine makes this shuffle only (flag,status)
    * partials — 6 groups regardless of input size.
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

  def all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
  )
}
