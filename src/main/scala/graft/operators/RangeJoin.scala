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

  /** Interval-overlap join: all (left ⋈ right) pairs whose CLOSED
    * intervals [lStart,lEnd], [rStart,rEnd] intersect — the time-range
    * correlation primitive (campaign windows × activity windows,
    * session overlap, validity-range joins) that Spark otherwise plans
    * as a nested loop, since `ls <= re AND rs <= le` has no equi-key.
    *
    * Shape: each side explodes to every `bucketWidth`-sized bucket its
    * interval covers, the join runs as an equi-join on the bucket id,
    * and the exact overlap predicate is the residual. Overlapping
    * pairs share at least one bucket (the one holding
    * `max(lStart, rStart)`, where the overlap begins), and counting a
    * pair ONLY in that canonical bucket makes each qualifying pair
    * match exactly once — no distinct pass over the (large) pair
    * result. Replication per row = interval length / bucketWidth + 1,
    * so set `bucketWidth` near the typical interval length: a handful
    * of copies per row and a hash shuffle versus O(|L|·|R|). Hot
    * buckets (many concurrent intervals) are plain equi-join skew —
    * AQE splits them like any other key.
    *
    * Degenerate inputs (end < start) describe no time span and join
    * to nothing; they are dropped up front rather than left to the
    * overlap predicate, which is only sound for well-formed intervals.
    */
  def intervalJoin(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: $overlap")
    val reserved = Seq("_ls", "_le", "_rs", "_re", "_b")
    val taken = (left.columns ++ right.columns).filter(reserved.contains)
    require(taken.isEmpty,
      s"inputs may not use the reserved working names $taken")
    def bkt(c: Column): Column = floor(c / bucketWidth).cast("long")
    val l = left.withColumn("_ls", lStart).withColumn("_le", lEnd)
      .filter(col("_le") >= col("_ls"))
      .withColumn("_b",
        explode(sequence(bkt(col("_ls")), bkt(col("_le")))))
    val r = right.withColumn("_rs", rStart).withColumn("_re", rEnd)
      .filter(col("_re") >= col("_rs"))
      .withColumn("_b",
        explode(sequence(bkt(col("_rs")), bkt(col("_re")))))
    l.join(r, Seq("_b"))
      .filter(col("_ls") <= col("_re") && col("_rs") <= col("_le"))
      // canonical bucket: where the overlap starts — each pair once
      .filter(col("_b") === greatest(bkt(col("_ls")), bkt(col("_rs"))))
      .drop("_b", "_ls", "_le", "_rs", "_re")
  }
}
