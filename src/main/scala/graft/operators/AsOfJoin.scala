package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the temporal lookup the
  * reference performs imperatively when it enriches an event with the
  * latest known item state (`find_one(..., sort=[('timestamp', -1)])`,
  * /root/reference/PodioApiGateway.py:165): for every left row, attach
  * the payload of the right row with the greatest right-time ≤
  * left-time within the same key.
  *
  * Implementation is the union+window technique, not a range join:
  * tag both inputs, union them, and run one
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time)`
  * window. One shuffle on the key, one sort, zero pair explosion —
  * the formulation that survives 100 TB (a broadcast range join
  * materializes |left|·|right-per-key| intermediate rows; this is
  * strictly |left|+|right|). Composes entirely from built-in
  * operators, per the extension preference order (compose > custom
  * plan).
  *
  * Determinism: right rows tied on time resolve by ascending
  * `tiebreak`, so the payload is from the max (time, tiebreak) row —
  * mirror an oracle with lexicographic struct max. At equal left/right
  * time the right row wins (inclusive ≤), because right rows sort
  * before left rows within a timestamp.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (returned as
    *                `asof_<name>`, null when no right row precedes);
    *                must be non-null in the right data for consistent
    *                multi-column picks.
    * @param tiebreak right-side column ordering ties on rightTime.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tiebreak: String): DataFrame = {
    require(payload.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      "payload column names must not collide with left columns")
    val reserved = Seq("_k", "_t", "_src", "_tb")
    require(!leftCols.exists(reserved.contains),
      s"left columns may not use the reserved working names $reserved")
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_src", lit(1))
    val r = right.select(
      payload.map(col) :+
        col(rightKey).as("_k") :+ col(rightTime).as("_t") :+
        lit(0).as("_src") :+ col(tiebreak).as("_tb"): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_src").asc, col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = payload.foldLeft(merged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col("_src") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }
}
