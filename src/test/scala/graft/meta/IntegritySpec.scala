package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("orphans counts exactly the child rows with no parent, " +
      "ignoring null keys") {
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)), // 99 orphaned
      (4L, None)                                         // null FK: not counted
    ).toDF("id", "fk")
    val parent = Seq(Tuple1(10L), Tuple1(11L)).toDF("pk")
    val row = Integrity.orphans(child, "fk", parent, "pk", "child->parent")
      .collect()(0)
    assert(row.getAs[String]("relation") === "child->parent")
    assert(row.getAs[Long]("n_child_rows") === 3L)
    assert(row.getAs[Long]("n_orphans") === 1L)
  }

  test("duplicateKeys counts violating keys and surplus rows, zero on " +
      "a unique column") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("id", "v")
    val dup = Integrity.duplicateKeys(df, "id", "t").collect()(0)
    assert(dup.getAs[Long]("n_dup_keys") === 1L)     // key 1
    assert(dup.getAs[Long]("n_surplus_rows") === 2L) // 3 rows - 1 keeper
    val clean = Integrity.duplicateKeys(
      Seq(Tuple1(1L), Tuple1(2L)).toDF("id"), "id", "t").collect()(0)
    assert(clean.getAs[Long]("n_dup_keys") === 0L)
    assert(clean.getAs[Long]("n_surplus_rows") === 0L)
  }

  test("the star-schema audit reports every FK edge and the synthetic " +
      "testdata is referentially sound") {
    val rows = Integrity.audit(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("relation") ->
        (r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_orphans"))).toMap
    assert(rows.size === 8)
    assert(rows.keySet.contains("lineitem.l_orderkey->orders"))
    rows.foreach { case (rel, (n, orphans)) =>
      assert(n > 0, s"$rel has no child rows")
      assert(orphans === 0L, s"$rel has $orphans orphans")
    }
  }
}
