package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the scale path for non-equi band predicates
  * (`|f(L) - g(R)| < width`), which Spark otherwise plans as a
  * broadcast-nested-loop join (every executor scans the whole
  * broadcast side per row) or, with neither side small, a cartesian
  * product.
  *
  * Shape: quantize both sides into buckets of `nextUp(width)` — for a
  * qualifying pair `|a - b| < width < nextUp(width)`, so `(a-b)/W < 1`
  * STRICTLY in reals and the floor buckets differ by at most 1 even
  * when a division-rounding tie sits on a bucket edge (the same
  * hardening as [[graft.plans.BandJoinRewrite]]; the bucket only
  * gates candidates — the residual decides membership, so a wider
  * bucket is always sound). Replicating ONE side into its 3 adjacent
  * buckets and equi-joining on the bucket id finds every qualifying
  * pair; the exact band predicate then runs as a residual filter
  * inside the join. Each pair meets in exactly one bucket (the left
  * row's), so no distinct pass is needed.
  *
  * Cost: a 3× replication of one side + one hash shuffle on bucket
  * ids, versus an O(|L|·|R|) nested loop — the classic interval-
  * bucketing trade, linear at fixed band density. Skewed buckets fall
  * out to AQE's skew-join splitting like any other equi-join.
  */
object RangeJoin {

  /** All (left ⋈ right) rows with `|leftVal - rightVal| < width`.
    * Column names must be disjoint across the two inputs.
    */
  def bandJoin(left: DataFrame, leftVal: Column,
      right: DataFrame, rightVal: Column, width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: $overlap")
    val reserved = Seq("_band_v", "_band_w", "_bucket")
    val taken = (left.columns ++ right.columns).filter(reserved.contains)
    require(taken.isEmpty,
      s"inputs may not use the reserved working names $taken")
    val w = Math.nextUp(width)
    val l = left.withColumn("_band_v", leftVal)
      .withColumn("_bucket", floor(col("_band_v") / w))
    val r = right.withColumn("_band_w", rightVal)
      .withColumn("_bucket",
        explode(array(Seq(-1, 0, 1).map(d =>
          floor(col("_band_w") / w) + d): _*)))
    l.join(r, Seq("_bucket"))
      .filter(abs(col("_band_v") - col("_band_w")) < width)
      .drop("_bucket", "_band_v", "_band_w")
  }
}
