package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expectations' contract: each check's observed value and pass/fail
  * verdict on data with KNOWN defects, plus the one-pass plan claim.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  // 10 rows: 2 null names, 1 duplicate id, 2 out-of-range balances,
  // 1 bad segment, 1 pattern violation
  private lazy val df = Seq(
    (1L, Some("C#1"), 10.0, "A"),
    (2L, Some("C#2"), 20.0, "A"),
    (3L, Some("C#3"), -5.0, "B"),
    (4L, None, 40.0, "B"),
    (5L, Some("C#5"), 50.0, "A"),
    (6L, Some("C#6"), 600.0, "B"),
    (7L, None, 70.0, "A"),
    (8L, Some("C#8"), 80.0, "ZZZ"),
    (9L, Some("bad"), 90.0, "B"),
    (9L, Some("C#9"), 95.0, "A"))
    .toDF("id", "name", "bal", "seg")

  private def report(checks: Seq[Check]) =
    Expectations.run(df, checks).collect()
      .map(r => (r.getAs[String]("check_name"),
        r.getAs[Double]("observed"), r.getAs[Boolean]("passed"))).toSeq

  test("each check type measures its defect and fails when it should") {
    val got = report(Seq(
      RowCount(5L, 20L),
      Uniqueness(Seq("id"), 1.0),
      Completeness("name", 0.9),
      PatternRatio("name", "^C#[0-9]+$", 0.9),
      InSet("seg", Seq("A", "B"), 1.0),
      Between("bal", 0.0, 100.0)))
    assert(got(0) == (("row_count", 10.0, true)))
    assert(got(1) == (("uniqueness", 0.9, false)), "9 distinct / 10")
    assert(got(2) == (("completeness", 0.8, false)), "8 non-null / 10")
    assert(got(3) == (("pattern", 0.875, false)), "7 of 8 non-null match")
    assert(got(4) == (("in_set", 0.9, false)), "ZZZ out of domain")
    assert(got(5) == (("between", 0.8, false)), "-5 and 600 outside")
  }

  test("passing suite, boundary thresholds, empty-table ratio guard") {
    val good = report(Seq(
      Completeness("name", 0.8), // observed == threshold: passes
      Between("bal", -10.0, 1000.0),
      RowCount(10L, 10L)))
    assert(good.forall(_._3), s"all should pass: $good")
    // zero-row frame: ratios define as 1.0 (vacuous truth), row_count 0
    val empty = Expectations.run(df.limit(0), Seq(Completeness("name", 0.5),
      RowCount(1L, 10L))).collect()
    assert(empty(0).getAs[Double]("observed") == 1.0)
    assert(empty(0).getAs[Boolean]("passed"))
    assert(empty(1).getAs[Double]("observed") == 0.0)
    assert(!empty(1).getAs[Boolean]("passed"))
  }

  test("a suite without uniqueness is ONE scan and one aggregation " +
    "pass; check order survives in check_idx") {
    val out = Expectations.run(df, Seq(Completeness("name", 0.5),
      Between("bal", 0.0, 100.0), RowCount(1L, 100L),
      PatternRatio("name", "^C#.*", 0.5), InSet("seg", Seq("A"), 0.1)))
    val plan = out.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length +
      "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n$plan")
    assert(out.select("check_idx").as[Int].collect().toSeq ==
      Seq(0, 1, 2, 3, 4))
  }

  test("rejects an empty suite") {
    intercept[IllegalArgumentException](Expectations.run(df, Seq.empty))
  }
}
