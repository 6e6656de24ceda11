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

  /** Backward as-of: greatest right-time ≤ left-time per key.
    *
    * @param payload right-side columns to attach (returned as
    *                `asof_<name>`, null when no right row qualifies);
    *                must be non-null in the right data for consistent
    *                multi-column picks.
    * @param tiebreak right-side column ordering ties on rightTime.
    * @param tolerance optional max distance between the left time and
    *                  the matched right time, as a Spark SQL
    *                  expression string (e.g. "INTERVAL 30 DAYS" for
    *                  timestamps, "5" for numerics); matches further
    *                  away resolve to null payloads — the pandas
    *                  merge_asof semantics.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tiebreak: String,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, tiebreak, tolerance, forward = false)

  /** Forward as-of: smallest right-time ≥ left-time per key — the
    * "next event after" lookup (same parameters as [[asofBackward]]).
    */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tiebreak: String,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, tiebreak, tolerance, forward = true)

  /** Shared union+window core. Direction is encoded twice: the tie
    * rank of right vs left rows at equal time (right first for
    * backward so inclusive ≤ holds, right last for forward so
    * inclusive ≥ holds) and the window frame (preceding rows + last()
    * for backward, following rows + first() for forward — first()
    * with ascending (_t, _tb) picks the NEAREST forward row and the
    * smallest tiebreak within it, mirroring last() backward).
    */
  private def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tiebreak: String,
      tolerance: Option[String], forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "need at least one payload column")
    require(payload.distinct == payload,
      s"payload columns must be distinct: $payload")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      "payload column names must not collide with left columns")
    val reserved = Seq("_k", "_t", "_src", "_tb", "_rt", "_asof_rt")
    require(!leftCols.exists(reserved.contains),
      s"left columns may not use the reserved working names $reserved")
    require(!payload.exists(reserved.contains),
      s"payload columns may not use the reserved working names $reserved")
    // chained as-of joins: a left column already named asof_<payload>
    // (from a previous join with the same payload) would be silently
    // clobbered and emitted twice — fail loudly instead
    val outNames = payload.map("asof_" + _)
    val clobbered = leftCols.filter(outNames.contains)
    require(clobbered.isEmpty,
      s"left columns $clobbered collide with as-of output names — " +
        "rename them (or the payload) before joining again")
    // payload = Seq("price", "asof_price") would have the second
    // withColumn read the FIRST's freshly-written window output
    // instead of the original right column — same clobber, right side
    val payloadClobbered = payload.filter(outNames.contains)
    require(payloadClobbered.isEmpty,
      s"payload columns $payloadClobbered collide with as-of output " +
        "names of other payload columns — rename before joining")
    val leftSrc = if (forward) 0 else 1
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_src", lit(leftSrc))
    // null-key / null-time right rows can never be a genuine match,
    // but unioned in they SORT FIRST (asc = NULLS FIRST): a null-time
    // right row would sit inside every backward frame and match
    // everything — a SQL/pandas as-of attaches null there. Drop them.
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      payload.map(col) :+
        col(rightKey).as("_k") :+ col(rightTime).as("_t") :+
        lit(1 - leftSrc).as("_src") :+ col(tiebreak).as("_tb") :+
        col(rightTime).as("_rt"): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_src").asc, col("_tb").asc_nulls_last)
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: org.apache.spark.sql.Column) =
      if (forward) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)
    val attached = payload.foldLeft(
      merged.withColumn("_asof_rt", pick(col("_rt")))) { (df, c) =>
      df.withColumn(s"asof_$c", pick(col(c)))
    }
    // a null LEFT time can't anchor an as-of: it sorts first, so the
    // forward frame would hand it the earliest right row — mask to
    // null instead (backward already yields null there; this makes
    // both directions agree with SQL/pandas semantics)
    val inTol = tolerance.map { tol =>
      if (forward) col("_asof_rt") - col("_t") <= expr(tol)
      else col("_t") - col("_asof_rt") <= expr(tol)
    }
    val keep = inTol match {
      case None => col("_t").isNotNull
      case Some(cond) => col("_t").isNotNull && cond
    }
    val bounded = payload.foldLeft(attached) { (df, c) =>
      df.withColumn(s"asof_$c", when(keep, col(s"asof_$c")))
    }
    bounded.filter(col("_src") === leftSrc)
      .select(leftCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }
}
