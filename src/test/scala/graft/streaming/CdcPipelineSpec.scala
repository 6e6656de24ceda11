package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

case class CdcEvent(event_id: Long, ts: Timestamp, item_id: Long,
    event_type: String, payload: String, failed_attempts: Int)

/** E1 streaming semantics (SURVEY.md §2.7) driven through a real
  * StreamingQuery over MemoryStream, plus the pure per-batch functions.
  */
class CdcPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, item: Long, typ: String,
      payload: String, fails: Int = 0) =
    CdcEvent(id, ts(t), item, typ, payload, fails)

  test("route: F2 type filter + T3 dead-letter threshold") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "item.create", "a"),
      ev(2, "2024-01-01 10:00:01", 1, "hook.verify", "b"),
      ev(3, "2024-01-01 10:00:02", 2, "item.update", "c", fails = 10)
    ).toDF()
    val (live, dlq) = CdcPipeline.route(df)
    assert(live.select("event_id").as[Long].collect().toSeq === Seq(1L))
    assert(dlq.select("event_id").as[Long].collect().toSeq === Seq(3L))
  }

  test("T4 coalescing: last event per item wins within a batch") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "item.create", "v1"),
      ev(2, "2024-01-01 10:05:00", 1, "item.update", "v2"),
      ev(3, "2024-01-01 10:01:00", 2, "item.create", "w1")
    ).toDF()
    val out = CdcPipeline.coalesceBatch(df, "item_id")
      .select("item_id", "payload").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "v2", 2L -> "w1"))
  }

  test("W1 merge: out-of-order late batch does not steal the current flag") {
    val b1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "item.create", "v1"),
      ev(2, "2024-01-01 12:00:00", 1, "item.update", "v3")).toDF()
    val snapshot1 = CdcPipeline.mergeBatch(
      b1.limit(0), b1, "item_id")
    // late event (older ts) arrives in batch 2
    val b2 = Seq(ev(3, "2024-01-01 11:00:00", 1, "item.update", "v2")).toDF()
    val snapshot2 = CdcPipeline.mergeBatch(snapshot1, b2, "item_id")
    val current = snapshot2.filter(col("current") === 1)
      .select("payload").as[String].collect().toSeq
    assert(current === Seq("v3"), "newest event time must stay current")
    assert(snapshot2.count() === 3, "history keeps all versions")
  }

  test("merge is idempotent under batch replay (exactly-once emulation)") {
    val b = Seq(ev(1, "2024-01-01 10:00:00", 1, "item.create", "v1")).toDF()
    val s1 = CdcPipeline.mergeBatch(b.limit(0), b, "item_id")
    val s2 = CdcPipeline.mergeBatch(s1, b, "item_id") // replay same batch
    assert(s2.count() === 1)
    assert(s2.filter(col("current") === 1).count() === 1)
  }

  test("end-to-end StreamingQuery: MemoryStream batches merge into an " +
      "SCD2 snapshot with exactly one current row per item") {
    val input = MemoryStream[CdcEvent](spark)
    var snapshot: DataFrame = Seq.empty[CdcEvent].toDF()
      .withColumn("current", lit(0))
    var dlqCount = 0L

    val q = input.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (live, dlq) = CdcPipeline.route(batch)
        dlqCount += dlq.count()
        snapshot = CdcPipeline.mergeBatch(
          snapshot, CdcPipeline.coalesceBatch(live, "item_id"), "item_id")
          .localCheckpoint() // cut lineage across batches
      }

    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, "item.create", "v1"),
      ev(2, "2024-01-01 10:05:00", 1, "item.update", "v2"),
      ev(3, "2024-01-01 10:00:00", 2, "item.create", "w1"),
      ev(4, "2024-01-01 10:00:01", 3, "item.update", "x1", fails = 10))
    q.start().processAllAvailable()

    input.addData(
      ev(5, "2024-01-01 11:00:00", 2, "item.update", "w2"))
    q.start().processAllAvailable()

    val current = snapshot.filter(col("current") === 1)
      .select("item_id", "payload").as[(Long, String)].collect().toMap
    assert(current === Map(1L -> "v2", 2L -> "w2"))
    assert(dlqCount === 1, "the 10-failure event goes to the DLQ")
    // invariant: exactly one current per key
    val bad = snapshot.filter(col("current") === 1)
      .groupBy("item_id").count().filter(col("count") =!= 1).count()
    assert(bad === 0)
  }

  test("app.create/app.update route to a catalog re-crawl whose " +
      "schemaDiff surfaces the drift; data-only batches leave it alone") {
    val dir = "/root/testdata/sf0.001"
    val appEv = Seq(
      ev(10, "2024-01-01 10:00:00", 7, "app.update", "schema-changed"),
      ev(11, "2024-01-01 10:00:01", 7, "item.update", "data")).toDF()
    val itemEv = Seq(
      ev(12, "2024-01-01 10:00:02", 7, "item.update", "data")).toDF()
    assert(CdcPipeline.routeApp(appEv)
      .select("event_id").as[Long].collect().toSeq === Seq(10L))
    assert(CdcPipeline.routeApp(itemEv).isEmpty)
    // a dead-lettered app event must NOT keep triggering re-crawls on
    // every replay of its batch — route() declared it dead
    val deadApp = Seq(
      ev(13, "2024-01-01 10:00:03", 7, "app.update", "poison",
        fails = 10)).toDF()
    assert(CdcPipeline.routeApp(deadApp).isEmpty,
      "dead-lettered app events may not reach the re-crawl hook")
    // the previous crawl is missing a field the live schema has → the
    // app-event-triggered re-crawl must report it as "added"
    val before = graft.meta.Catalog.fields(spark, dir)
      .filter(!(col("app_name") === "region" &&
        col("field_name") === "r_name"))
    val drift = CdcPipeline.appDrift(spark, dir, appEv, before)
      .select("app_name", "field_name", "change")
      .as[(String, String, String)].collect().toSeq
    assert(drift === Seq(("region", "r_name", "added")))
    // no app event in the batch → no re-crawl, empty drift
    assert(CdcPipeline.appDrift(spark, dir, itemEv, before).count() === 0)
  }

  test("streaming app events reach the onAppBatch hook") {
    val input = MemoryStream[CdcEvent](spark)
    var appSeen = Vector.empty[Long]
    val q = CdcPipeline.start(input.toDF(), "item_id",
      java.nio.file.Files.createTempDirectory("cdc-app-ckpt").toString,
      (_, _, _) => (),
      (app, _) => appSeen ++=
        app.select("event_id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect().sorted)
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "item.create", "v1"),
        ev(2, "2024-01-01 10:00:01", 7, "app.update", "schema"))
      q.processAllAvailable()
      assert(appSeen === Vector(2L))
    } finally q.stop()
  }

  test("T8: windowed counts run as a streaming query with watermark") {
    val input = MemoryStream[CdcEvent](spark)
    val counts = CdcPipeline.windowedCounts(
      input.toDF().withColumnRenamed("event_type", "event_type"))
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, "item.create", "a"),
      ev(2, "2024-01-01 10:30:00", 1, "item.update", "b"),
      ev(3, "2024-01-01 11:10:00", 2, "item.create", "c"))
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("n")).collect()
    assert(rows.map(_.getLong(1)).sum === 3)
    q.stop()
  }

  test("T8 late-data telemetry: StreamTelemetry counts the rows the " +
      "watermark discarded, and the input-row total") {
    val tel = graft.meta.Telemetry.attachStreamTelemetry(spark)
    val input = MemoryStream[CdcEvent](spark)
    val counts = CdcPipeline.windowedCounts(input.toDF())
    val q = counts.writeStream.format("memory")
      .queryName("late_counts").outputMode("update").start()
    try {
      // watch the listener catch up with a bounded poll (delivery is
      // async on the listener bus)
      def eventually(cond: => Boolean): Boolean = {
        val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
        while (!cond && System.nanoTime < deadline) Thread.sleep(50)
        cond
      }
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "item.create", "a"),
        ev(2, "2024-01-01 12:00:00", 1, "item.update", "b"))
      q.processAllAvailable()
      // watermark now 11:50 (12:00 − 10 min). A row is dropped when
      // its WINDOW is already expired: 10:05 lives in [10:00, 11:00)
      // whose end ≤ watermark → dropped; 11:00 lives in [11:00, 12:00)
      // which is still open → accepted even though its ts is behind
      // the watermark
      input.addData(
        ev(3, "2024-01-01 10:05:00", 2, "item.create", "c"),
        ev(4, "2024-01-01 11:00:00", 2, "item.update", "d"))
      q.processAllAvailable()
      assert(eventually(tel.lateDropped("late_counts") === 1L),
        s"dropped=${tel.lateDropped("late_counts")}")
      assert(eventually(tel.inputRows("late_counts") === 4L),
        s"input=${tel.inputRows("late_counts")}")
      // and the dropped row left no trace: 3 of the 4 inputs counted
      assert(spark.table("late_counts")
        .agg(sum(col("n"))).head().getLong(0) === 3L)
    } finally {
      q.stop()
      spark.streams.removeListener(tel)
    }
  }
}
