package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IncrementalJoin's contract: the three delta quadrants reproduce the
  * full inner join of the unioned inputs exactly once — across random
  * splits, successive batches (induction), and empty deltas.
  */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  // skewed keys (k % 10) so quadrants overlap heavily and any
  // double-count or miss changes row multiplicity
  private def tableA(n: Int) =
    (1 to n).map(i => (i.toLong % 10, i.toLong, s"a$i"))
      .toDF("k", "ida", "pa")
  private def tableB(n: Int) =
    (1 to n).map(i => (i.toLong % 10, i.toLong, s"b$i"))
      .toDF("k", "idb", "pb")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "ida", "pa", "idb", "pb")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      .toMap

  test("delta quadrants + stored view == full join of the union, over " +
    "several random splits") {
    val a = tableA(80).cache()
    val b = tableB(60).cache()
    for (seed <- 1 to 3) {
      val splitA = col("ida") % 3 === seed % 3
      val splitB = col("idb") % 4 === seed % 4
      val (oldA, dA) = (a.filter(!splitA), a.filter(splitA))
      val (oldB, dB) = (b.filter(!splitB), b.filter(splitB))
      val maintained = IncrementalJoin.maintain(
        oldA.join(oldB, Seq("k")),
        IncrementalJoin.delta(oldA, dA, oldB, dB, Seq("k")))
      assert(rows(maintained) == rows(a.join(b, Seq("k"))),
        s"seed=$seed")
    }
  }

  test("two successive deltas compose: maintain(maintain(J,d1),d2) == " +
    "full join of the total") {
    val a = tableA(90)
    val b = tableB(90)
    val a0 = a.filter(col("ida") <= 30)
    val a1 = a.filter(col("ida") > 30 && col("ida") <= 60)
    val a2 = a.filter(col("ida") > 60)
    val b0 = b.filter(col("idb") <= 45)
    val b1 = b.filter(col("idb") > 45 && col("idb") <= 70)
    val b2 = b.filter(col("idb") > 70)
    val j0 = a0.join(b0, Seq("k"))
    val j1 = IncrementalJoin.maintain(j0,
      IncrementalJoin.delta(a0, a1, b0, b1, Seq("k")))
    val j2 = IncrementalJoin.maintain(j1,
      IncrementalJoin.delta(a0.unionByName(a1), a2,
        b0.unionByName(b1), b2, Seq("k")))
    assert(rows(j2) == rows(a.join(b, Seq("k"))))
  }

  test("one-sided and empty deltas degenerate correctly") {
    val a = tableA(40)
    val b = tableB(40)
    val emptyA = a.limit(0)
    val emptyB = b.limit(0)
    // only side A grows
    val dA = tableA(50).filter(col("ida") > 40)
    val oneSided = IncrementalJoin.maintain(a.join(b, Seq("k")),
      IncrementalJoin.delta(a, dA, b, emptyB, Seq("k")))
    assert(rows(oneSided) ==
      rows(a.unionByName(dA).join(b, Seq("k"))))
    // nothing grows: the delta is empty, the view is unchanged
    val noOp = IncrementalJoin.delta(a, emptyA, b, emptyB, Seq("k"))
    assert(noOp.count() == 0L)
  }

  test("delta requires a join key") {
    val a = tableA(5)
    intercept[IllegalArgumentException](
      IncrementalJoin.delta(a, a, a, a, Seq.empty))
  }
}
