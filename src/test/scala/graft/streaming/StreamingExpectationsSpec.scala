package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.Expectations
import graft.meta.Expectations.{Between, Completeness, RowCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming quality monitoring: each micro-batch's report must equal
  * the batch-level Expectations run, the series accumulates one
  * report per batch, replays are absorbed, resets fail loudly, and a
  * crash between report write and marker write self-heals.
  */
class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    Completeness("v", 1.0),
    Between("v", 0.0, 100.0),
    RowCount(1L, 100L))

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def series(outPath: String) =
    StreamingExpectations.read(spark, outPath).get
      .select("batch_id", "check_idx", "check_name", "observed",
        "passed", "batch_rows")
      .as[(Long, Int, String, Double, Boolean, Long)]
      .collect().toSet

  test("per-batch reports accumulate and match the batch-level run") {
    val out = tmp("graft_sexp")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Option[Double])]
    val q = StreamingExpectations.start(in.toDF().toDF("id", "v"),
      out, tmp("graft_sexp_ckpt"), checks)
    val b0 = Seq((1L, Some(10.0)), (2L, Some(20.0)))
    val b1 = Seq((3L, Some(-5.0)), (4L, None), (5L, Some(50.0)))
    try {
      in.addData(b0: _*)
      q.processAllAvailable()
      in.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = series(out)
    assert(got.map(_._1) == Set(0L, 1L), "one report per batch")
    // batch 0: clean
    assert(got.filter(_._1 == 0L).forall(_._5), s"batch 0 clean: $got")
    // batch 1: null v (completeness 2/3) and out-of-range -5 fail
    val b1map = got.filter(_._1 == 1L)
      .map(r => r._3 -> ((r._4, r._5))).toMap
    assert(b1map("completeness") == ((0.666667, false)))
    assert(b1map("between") == ((0.5, false)), "-5 of the 2 non-null")
    assert(b1map("row_count") == ((3.0, true)))
    assert(got.filter(_._1 == 1L).forall(_._6 == 3L), "batch_rows")
    // alert feed = only the failing rows
    val alerts = StreamingExpectations.failures(spark, out).get
    assert(alerts.count() == 2)
    // and each batch's report equals a direct batch-level run
    val direct = Expectations.run(b1.toDF("id", "v"), checks)
      .select("check_idx", "observed", "passed")
      .as[(Int, Double, Boolean)].collect().toSet
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._4, r._5)) == direct)
  }

  test("replay absorbed; reset over a live series fails loudly") {
    val out = tmp("graft_sexp_replay")
    val b = Seq((1L, Some(1.0))).toDF("id", "v")
    StreamingExpectations.monitorBatch(b, 0L, out, checks)
    StreamingExpectations.monitorBatch(b, 0L, out, checks) // replay
    assert(series(out).map(_._1) == Set(0L), "no duplicate series rows")
    // same id, different content = checkpoint reset
    val other = Seq((9L, Some(9.0))).toDF("id", "v")
    val e = intercept[IllegalStateException](
      StreamingExpectations.monitorBatch(other, 0L, out, checks))
    assert(e.getMessage.contains("checkpoint reset"))
    // backward id with different content is the same hazard
    StreamingExpectations.monitorBatch(other, 1L, out, checks)
    intercept[IllegalStateException](
      StreamingExpectations.monitorBatch(b, 1L, out, checks))
  }

  test("crash between report write and marker write self-heals on " +
    "replay") {
    val out = tmp("graft_sexp_crash")
    val b0 = Seq((1L, Some(1.0))).toDF("id", "v")
    val b1 = Seq((2L, Some(200.0))).toDF("id", "v")
    StreamingExpectations.monitorBatch(b0, 0L, out, checks)
    StreamingExpectations.monitorBatch(b1, 1L, out, checks)
    // simulate the crash window: batch 1's directory exists but the
    // marker still points at batch 0
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(out, "_GRAFT_LAST_BATCH"),
      s"0:${StreamingExpectations.batchSig(b0)}")
    // the replay of batch 1 overwrites the orphan dir and re-advances
    StreamingExpectations.monitorBatch(b1, 1L, out, checks)
    val got = series(out)
    assert(got.map(_._1) == Set(0L, 1L))
    assert(got.filter(r => r._1 == 1L && r._3 == "between")
      .forall(!_._5), "batch 1's out-of-range report survived")
  }
}
