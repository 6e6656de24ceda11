package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.scd.Versioning
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming erasure front door: requests enqueue exactly-once,
  * the maintenance-window drain applies ONE batched forget, and
  * request-keyed drained marks keep re-requests after re-consent
  * erasable while replays absorb.
  */
class ErasureIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def historyRows(tag: String) = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, s"$tag-a0", 0),
    (1L, ts("2024-01-02 00:00:00"), 11L, s"$tag-a1", 1),
    (2L, ts("2024-01-01 00:00:00"), 12L, s"$tag-b0", 1),
    (3L, ts("2024-01-03 00:00:00"), 13L, s"$tag-c0", 0),
    (3L, ts("2024-01-04 00:00:00"), 14L, s"$tag-c1", 1)
  ).toDF("item_id", "ts", "event_id", "payload", "current")

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("requests enqueue exactly-once and drain applies one batched " +
      "forget over everything pending; an empty drain is a pure " +
      "no-op; a crash between the forget and the drained marks " +
      "converges on replay") {
    val dir = tmp("graft_erase")
    val hist = s"$dir/history"
    val queue = s"$dir/queue"
    val ledger = s"$dir/ledger"
    historyRows("h").write.parquet(hist)
    val t = Versioning.ForgetTargets(historyPath = Some(hist))
    // two request batches land before the window
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 0L, queue,
      "item_id")
    ErasureIngest.enqueueBatch(Seq(3L, 99L).toDF("item_id"), 1L,
      queue, "item_id")
    // a genuine replay of batch 0 absorbs; a recycled id refuses
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 0L, queue,
      "item_id")
    val er = intercept[IllegalArgumentException] {
      ErasureIngest.enqueueBatch(Seq(7L).toDF("item_id"), 0L, queue,
        "item_id")
    }
    assert(er.getMessage.contains("recycled"))
    // the window: one drain, one forget, every pending request
    val (pending, removed) = ErasureIngest.drain(spark, queue, t,
      ledgerPath = Some(ledger))
    assert(pending === 3L && removed === 4L)
    assert(spark.read.parquet(hist).select("item_id")
      .as[Long].collect().toSet === Set(2L))
    assert(spark.read.parquet(ledger).count() === 1L)
    // drained queue: the next window is a no-op (no forget, no
    // ledger growth, nothing re-removed)
    assert(ErasureIngest.drain(spark, queue, t,
      ledgerPath = Some(ledger)) === ((0L, 0L)))
    assert(spark.read.parquet(ledger).count() === 1L)
    // crash between forget and the drained marks: losing the marks
    // re-runs the same pending set — removes 0, marks, ledger absorbs
    val fs = new org.apache.hadoop.fs.Path(queue)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$queue/${ErasureIngest.DrainedDir}"), true)
    val (p2, r2) = ErasureIngest.drain(spark, queue, t,
      ledgerPath = Some(ledger))
    assert(p2 === 3L && r2 === 0L)
    assert(spark.read.parquet(ledger).count() === 1L,
      "the cascade ledger absorbs the replay by content sig")
    // null request keys are loud, not silently dropped
    intercept[Exception] {
      ErasureIngest.enqueueBatch(
        spark.sql("SELECT CAST(NULL AS BIGINT) AS item_id"), 9L,
        queue, "item_id")
    }
    // an UNCOMMITTED partition (a crashed write: data, no _SUCCESS)
    // is invisible to the drain — reading it would apply a torn
    // batch and race the replay's overwrite; once the replay commits
    // it, the requests drain normally
    ErasureIngest.enqueueBatch(Seq(42L).toDF("item_id"), 3L, queue,
      "item_id")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$queue/ingest_batch=3/_SUCCESS"), false)
    assert(ErasureIngest.drain(spark, queue, t) === ((0L, 0L)),
      "a crashed (uncommitted) batch must stay invisible")
    ErasureIngest.enqueueBatch(Seq(42L).toDF("item_id"), 3L, queue,
      "item_id")
    assert(ErasureIngest.drain(spark, queue, t) === ((1L, 0L)),
      "the replayed commit makes the request drainable")
  }

  test("drain identity is the REQUEST, not the key: a key erased, " +
      "re-ingested under re-consent, and named by a LATER request is " +
      "erased again — and the cascade ledger records BOTH honored " +
      "requests as distinct rows (request-tagged sigs)") {
    val dir = tmp("graft_erase_rr")
    val hist = s"$dir/history"
    val queue = s"$dir/queue"
    val ledger = s"$dir/ledger"
    historyRows("h").write.parquet(hist)
    val t = Versioning.ForgetTargets(historyPath = Some(hist))
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 0L, queue,
      "item_id")
    assert(ErasureIngest.drain(spark, queue, t,
      ledgerPath = Some(ledger)) === ((1L, 2L)))
    // re-consent: the key legitimately reappears
    Seq((1L, ts("2024-02-01 00:00:00"), 50L, "h-new", 1))
      .toDF("item_id", "ts", "event_id", "payload", "current")
      .write.mode("append").parquet(hist)
    // a later request for the same key is FRESH pending work
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 1L, queue,
      "item_id")
    assert(ErasureIngest.drain(spark, queue, t,
      ledgerPath = Some(ledger)) === ((1L, 1L)))
    assert(spark.read.parquet(hist).filter(col("item_id") === 1L)
      .isEmpty, "the re-requested key must be erased again")
    // the audit trail distinguishes the two honored requests: same
    // ids, same tables, different request batches → different sigs
    val led = spark.read.parquet(ledger)
    assert(led.count() === 2L,
      "a re-request must not absorb into the first cascade's row")
    assert(led.select("request_tag").as[String].collect().toSet ===
      Set("0", "1"))
  }

  test("compactQueue empties fully-drained request partitions to " +
      "their replay markers and reclaims their marks whole-directory; " +
      "replay absorbs and recycled ids still refuse afterwards; the " +
      "front door keeps working; a crash between data deletion and " +
      "mark reclaim converges on the next sweep") {
    val dir = tmp("graft_erase_cq")
    val hist = s"$dir/history"
    val queue = s"$dir/queue"
    historyRows("h").write.parquet(hist)
    val t = Versioning.ForgetTargets(historyPath = Some(hist))
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 0L, queue,
      "item_id")
    ErasureIngest.enqueueBatch(Seq(3L, 99L).toDF("item_id"), 1L,
      queue, "item_id")
    assert(ErasureIngest.drain(spark, queue, t) === ((3L, 4L)))
    val debt = ErasureIngest.queueDebt(spark, queue)
    assert(debt === ErasureIngest.QueueDebt(2L, 0L, 3L),
      "both batches are applied anti-join mass before the sweep")
    assert(ErasureIngest.compactQueue(spark, queue) === ((2L, 2L)))
    assert(ErasureIngest.queueDebt(spark, queue) ===
      ErasureIngest.QueueDebt(0L, 0L, 0L))
    val fs = new org.apache.hadoop.fs.Path(queue)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // emptied to replay markers: no data files, _SUCCESS + sig kept
    Seq(0L, 1L).foreach { b =>
      val part = new org.apache.hadoop.fs.Path(s"$queue/ingest_batch=$b")
      val names = fs.listStatus(part).map(_.getPath.getName).toSet
      assert(!names.exists(_.endsWith(".parquet")),
        s"batch $b must hold no data files")
      assert(names.contains("_SUCCESS") &&
        names.contains("_GRAFT_BATCH_SIG"),
        s"batch $b must keep its replay markers")
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$queue/${ErasureIngest.DrainedDir}/ingest_batch=0")))
    // an all-emptied queue drains as a schema-safe no-op
    assert(ErasureIngest.drain(spark, queue, t) === ((0L, 0L)))
    // the emptied partitions' guards survive: same-content replay
    // absorbs silently, a recycled id still refuses
    ErasureIngest.enqueueBatch(Seq(1L).toDF("item_id"), 0L, queue,
      "item_id")
    assert(ErasureIngest.drain(spark, queue, t) === ((0L, 0L)),
      "the absorbed replay must not resurrect the batch")
    val er = intercept[IllegalArgumentException] {
      ErasureIngest.enqueueBatch(Seq(7L).toDF("item_id"), 1L, queue,
        "item_id")
    }
    assert(er.getMessage.contains("recycled"))
    // the front door keeps working after the sweep
    ErasureIngest.enqueueBatch(Seq(2L).toDF("item_id"), 2L, queue,
      "item_id")
    assert(ErasureIngest.drain(spark, queue, t) === ((1L, 1L)))
    assert(spark.read.parquet(hist).isEmpty)
    // crash window: batch 2's data deleted but its marks left behind
    // — the next sweep sees orphan marks and reclaims them
    fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$queue/ingest_batch=2")).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .foreach(p => fs.delete(p, false))
    assert(ErasureIngest.queueDebt(spark, queue).orphanMarkDirs === 1L)
    assert(ErasureIngest.compactQueue(spark, queue) === ((0L, 1L)))
    assert(ErasureIngest.queueDebt(spark, queue) ===
      ErasureIngest.QueueDebt(0L, 0L, 0L))
    // lock discipline: a held queue lock refuses the sweep loudly
    val marker = new org.apache.hadoop.fs.Path(queue,
      graft.ml.Maintenance.MaintainingMarker)
    fs.create(marker, false).close()
    val el = intercept[IllegalStateException] {
      ErasureIngest.compactQueue(spark, queue)
    }
    assert(el.getMessage.contains("writer lock"))
    assert(ErasureIngest.compactQueue(spark, queue,
      breakStaleLock = true) === ((0L, 0L)))
    assert(!fs.exists(marker))
  }

  test("the streaming wrapper enqueues through real micro-batches " +
      "and the drain sees every committed request") {
    val dir = tmp("graft_erase_st")
    val hist = s"$dir/history"
    val queue = s"$dir/queue"
    historyRows("h").write.parquet(hist)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    // compactEvery = 1: the in-stream hook sweeps after every batch —
    // serialized with the enqueue, so it can never trip its own guard
    val q = ErasureIngest.start(in.toDF().toDF("item_id"), queue,
      "item_id", s"$dir/ckpt", compactEvery = 1)
    try {
      in.addData(1L)
      q.processAllAvailable()
      // the window runs while the stream is between triggers
      val (p1, r1) = ErasureIngest.drain(spark, queue,
        Versioning.ForgetTargets(historyPath = Some(hist)))
      assert(p1 === 1L && r1 === 2L)
      in.addData(3L, 99L)
      q.processAllAvailable()
      // batch 1's hook swept the drained batch 0 to its markers
      assert(ErasureIngest.queueDebt(spark, queue)
        .reclaimableBatches === 0L)
    } finally q.stop()
    val (pending, removed) = ErasureIngest.drain(spark, queue,
      Versioning.ForgetTargets(historyPath = Some(hist)))
    assert(pending === 2L && removed === 2L)
    assert(spark.read.parquet(hist).select("item_id")
      .as[Long].collect().toSet === Set(2L))
  }
}
