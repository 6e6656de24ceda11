package graft.ml

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Threshold-triggered index maintenance ([[Maintenance]], r14 verdict
  * item 5): the debt report measures what the serves actually pay
  * (mask size, stream-union width, bucket file debt), the sweep fires
  * exactly when a threshold is crossed, reuses the crash-safe
  * fold+compact the per-family specs already prove, leaves serving
  * answers identical, and drives the debt back to zero.
  */
class MaintenanceSpec extends SparkSpec {

  private def embDf = {
    val spark0 = spark
    import spark0.implicits._
    (1L to 12L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("binary family: ingest+delete cycles accumulate measurable " +
      "debt, the sweep fires past the thresholds (fold then compact), " +
      "serves answer identically, and debt returns to zero") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_maint_bin").toString
    val path = s"$root/bin"
    val emb = embDf
    Similarity.writeBinaryIndex(emb.filter(col("vec_id") <= 8L), path,
      dim = 8)
    graft.streaming.VectorIngest.ingestBatchBinary(
      emb.filter(col("vec_id") === 9L || col("vec_id") === 10L), 0L, path)
    graft.streaming.VectorIngest.ingestBatchBinary(
      emb.filter(col("vec_id") >= 11L), 1L, path)
    Similarity.deleteFromBinaryIndex(spark,
      Seq(2L, 7L).toDF("vec_id"), path)
    val debt = Maintenance.compactionDebt(spark, path, "binary")
    assert(debt.tombstoneIds === 2L && debt.streamBacklog === 2L,
      s"debt must measure the cycles, got $debt")
    // below the default thresholds: measurement only, no sweep
    val (d0, fired0) = Maintenance.maintainIndex(spark, path, "binary")
    assert(!fired0 && d0 === debt, "a no-op sweep must not fire")
    // the union read (base ∪ committed streamed partitions) — what a
    // consumer serves before AND after the fold collapses them
    def serve() = graft.streaming.VectorIngest.queryServedBinary(
        spark, path, emb,
        emb.filter(col("vec_id") =!= 2L && col("vec_id") =!= 7L)
          .select(col("vec_id")), k = 3, refine = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val before = serve()
    // past the thresholds: fold the backlog, compact the tombstones
    val (d1, fired1) = Maintenance.maintainIndex(spark, path, "binary",
      Maintenance.Thresholds(maxTombstoneIds = 1L))
    assert(fired1 && d1 === debt, "the sweep must fire past the bound")
    assert(serve() === before,
      "the sweep must be invisible to serving answers")
    val after = Maintenance.compactionDebt(spark, path, "binary")
    assert(after.tombstoneIds === 0L && after.streamBacklog === 0L
      && after.tombstoneFiles === 0L,
      s"debt must return to zero after the sweep, got $after")
    // deleted rows are physically gone, survivors present
    val ids = spark.read.parquet(path)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === (1L to 12L).toSet -- Set(2L, 7L))
  }

  test("substr family: replayed appends and a settled takedown cross " +
      "the thresholds, the sweep compacts through the writer lock " +
      "machinery, and the increment answers unchanged") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_maint_sub").toString
    val path = s"$root/substr"
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 a6"),
      (2L, "b1 b2 b3 b4 b5 b6"),
      (3L, "c1 c2 c3 c4 c5 c6")).toDF("doc_id", "text")
    Dedup.writeSubstrIndex(docs, path, k = 4, nBuckets = 4)
    val batch = Seq((10L, "d1 d2 d3 d4 a1 a2 a3 a4"))
      .toDF("doc_id", "text")
    // an at-least-once replay doubles the batch's postings (the crash
    // state SubstrIngest replays from), and a takedown of doc 2 lands
    Dedup.appendSubstrIndex(spark, batch, path)
    Dedup.appendSubstrIndexAt(spark, batch, path, 3L)
    Dedup.deleteFromSubstrIndex(spark, Seq(2L).toDF("doc_id"), path)
    val debt = Maintenance.compactionDebt(spark, path, "substr")
    assert(debt.tombstoneIds === 1L && debt.multiFileBuckets > 0L
      && debt.streamBacklog === 0L,
      s"substr debt must measure dup postings + tombstones, got $debt")
    val inc = Seq((20L, "a1 a2 a3 a4 a5 a6")).toDF("doc_id", "text")
    def report() = Dedup.exactSubstrIncrement(spark, inc, path)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_spans")))
      .toSet
    val before = report()
    val (d1, fired) = Maintenance.maintainIndex(spark, path, "substr",
      Maintenance.Thresholds(maxTombstoneIds = 0L))
    assert(fired && d1 === debt)
    assert(report() === before, "the sweep changed the increment")
    val after = Maintenance.compactionDebt(spark, path, "substr")
    assert(after.tombstoneIds === 0L && after.multiFileBuckets === 0L,
      s"substr debt must settle to zero, got $after")
  }

  test("unknown families are loud") {
    intercept[IllegalArgumentException] {
      Maintenance.compactionDebt(spark, "/tmp/nope", "hnsw")
    }
    ()
  }

  test("multi-file-axis convergence (r15 advice): buckets left " +
      "multi-file by duplicate-FREE appends — which the family " +
      "compactor deliberately skips — are coalesced by the sweep, so " +
      "the axis goes back under its threshold instead of re-firing a " +
      "full scan forever; answers unchanged") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_maint_conv").toString
    val path = s"$root/substr"
    Dedup.writeSubstrIndex(Seq((1L, "a1 a2 a3 a4 a5 a6"))
      .toDF("doc_id", "text"), path, k = 4, nBuckets = 2)
    // two DISTINCT appends: extra files in the bkt dirs, zero
    // duplicate postings, zero tombstones — the exact state the r15
    // advice named non-convergent
    Dedup.appendSubstrIndex(spark,
      Seq((10L, "b1 b2 b3 b4 a1 a2 a3 a4")).toDF("doc_id", "text"), path)
    Dedup.appendSubstrIndex(spark,
      Seq((11L, "c1 c2 c3 c4 a3 a4 a5 a6")).toDF("doc_id", "text"), path)
    val debt = Maintenance.compactionDebt(spark, path, "substr")
    assert(debt.multiFileBuckets > 0L && debt.tombstoneIds === 0L,
      s"fixture must carry clean multi-file debt, got $debt")
    val inc = Seq((20L, "a1 a2 a3 a4 a5 a6")).toDF("doc_id", "text")
    def report() = Dedup.exactSubstrIncrement(spark, inc, path)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_spans")))
      .toSet
    val before = report()
    val th = Maintenance.Thresholds(maxMultiFileBuckets = 0L)
    val (_, fired) = Maintenance.maintainIndex(spark, path, "substr", th)
    assert(fired, "the multi-file axis must fire the sweep")
    assert(report() === before, "the coalesce changed the increment")
    val after = Maintenance.compactionDebt(spark, path, "substr")
    assert(after.multiFileBuckets === 0L,
      s"the axis must CONVERGE after the sweep, got $after")
    assert(!Maintenance.maintainIndex(spark, path, "substr", th)._2,
      "a second sweep must find nothing to do")
  }

  test("writer-lock discipline (r15 verdict item 4): while a sweep " +
      "holds the maintaining marker, ingest appends and tombstone " +
      "deletes refuse loudly — bucketed (substr) and flat (binary) " +
      "families alike; a second sweep refuses on the lock; a stale " +
      "marker needs breakStaleLock; a completed sweep releases it") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_maint_race").toString
    // --- flat family (binary)
    val bin = s"$root/bin"
    val emb = embDf
    Similarity.writeBinaryIndex(emb.filter(col("vec_id") <= 8L), bin,
      dim = 8)
    val fs = new org.apache.hadoop.fs.Path(bin)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markerOf(p: String) = new org.apache.hadoop.fs.Path(
      s"$p/${Maintenance.MaintainingMarker}")
    // a live sweep (simulated by its lock marker)
    fs.create(markerOf(bin), false).close()
    val e1 = intercept[IllegalStateException] {
      graft.streaming.VectorIngest.ingestBatchBinary(
        emb.filter(col("vec_id") === 9L), 0L, bin)
    }
    assert(e1.getMessage.contains("maintenance sweep"))
    val e2 = intercept[IllegalStateException] {
      Similarity.deleteFromBinaryIndex(spark, Seq(2L).toDF("vec_id"),
        bin)
    }
    assert(e2.getMessage.contains("maintenance sweep"))
    // a second sweep refuses on the held lock (thresholds force fire)
    Similarity.deleteFromBinaryIndex(spark,
      { fs.delete(markerOf(bin), false); Seq(2L).toDF("vec_id") }, bin)
    fs.create(markerOf(bin), false).close()
    val e3 = intercept[IllegalStateException] {
      Maintenance.maintainIndex(spark, bin, "binary",
        Maintenance.Thresholds(maxTombstoneIds = 0L))
    }
    assert(e3.getMessage.contains("already held"))
    // breakStaleLock re-enters, completes, and RELEASES the lock
    val (_, fired) = Maintenance.maintainIndex(spark, bin, "binary",
      Maintenance.Thresholds(maxTombstoneIds = 0L),
      breakStaleLock = true)
    assert(fired && !fs.exists(markerOf(bin)),
      "the sweep must release the lock on the way out")
    // r16 session review: a stale lock whose debt is now UNDER the
    // thresholds (the crashed-after-compact state) must STILL clear
    // via breakStaleLock — the previous placement inside the fire
    // branch left writers blocked with no working remedy
    fs.create(markerOf(bin), false).close()
    val (_, fired2) = Maintenance.maintainIndex(spark, bin, "binary",
      breakStaleLock = true)
    assert(!fired2 && !fs.exists(markerOf(bin)),
      "breakStaleLock must clear a stale marker even when no sweep " +
        "fires")
    // writers proceed again
    graft.streaming.VectorIngest.ingestBatchBinary(
      emb.filter(col("vec_id") === 9L), 0L, bin)
    // --- bucketed family (substr)
    val sub = s"$root/substr"
    Dedup.writeSubstrIndex(Seq((1L, "a1 a2 a3 a4 a5 a6"))
      .toDF("doc_id", "text"), sub, k = 4, nBuckets = 2)
    fs.create(markerOf(sub), false).close()
    val e4 = intercept[IllegalStateException] {
      Dedup.appendSubstrIndex(spark,
        Seq((10L, "b1 b2 b3 b4 b5 b6")).toDF("doc_id", "text"), sub)
    }
    assert(e4.getMessage.contains("maintenance sweep"))
    val e5 = intercept[IllegalStateException] {
      Dedup.deleteFromSubstrIndex(spark, Seq(1L).toDF("doc_id"), sub)
    }
    assert(e5.getMessage.contains("maintenance sweep"))
    fs.delete(markerOf(sub), false)
    Dedup.appendSubstrIndex(spark,
      Seq((10L, "b1 b2 b3 b4 b5 b6")).toDF("doc_id", "text"), sub)
    ()
  }

  test("in-stream auto-maintenance (r15 verdict item 6): a live " +
      "ingest stream with maintainEvery set self-heals — the sweep " +
      "fires between batches once the backlog threshold is crossed, " +
      "folds the stream partitions, and the serve equals a " +
      "from-scratch build of the full corpus") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val root = Files.createTempDirectory("graft_maint_hook").toString
    val path = s"$root/bin"
    val emb = embDf
    Similarity.writeBinaryIndex(emb.filter(col("vec_id") <= 8L), path,
      dim = 8)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.VecRow]
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Array[Float])].collect()
        .map(r => graft.streaming.VecRow(r._1, r._2)).toSeq
    // every batch checks debt with a zero backlog bound: each commit
    // crosses it, so the sweep must fire INSIDE the stream and fold
    val q = graft.streaming.VectorIngest.startBinary(in.toDF(), path,
      s"$root/ckpt", maintainEvery = 1,
      maintainThresholds = Maintenance.Thresholds(maxStreamBacklog = 0L))
    try {
      in.addData(rowsOf(emb.filter(col("vec_id") === 9L ||
        col("vec_id") === 10L)): _*)
      q.processAllAvailable()
      in.addData(rowsOf(emb.filter(col("vec_id") >= 11L)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val after = Maintenance.compactionDebt(spark, path, "binary")
    assert(after.streamBacklog === 0L,
      s"the in-stream sweep must have folded the backlog, got $after")
    // the lock is released between batches (writers kept flowing —
    // batch 2 committed after batch 1's sweep — and none remains now)
    assert(!new java.io.File(
      s"$path/${Maintenance.MaintainingMarker}").exists)
    // serve equality vs a from-scratch build over the full corpus
    val full = s"$root/full"
    Similarity.writeBinaryIndex(emb, full, dim = 8)
    def serve(p: String) = graft.streaming.VectorIngest
      .queryServedBinary(spark, p, emb, emb.select(col("vec_id")),
        k = 3, refine = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(serve(path) === serve(full),
      "the self-healed stream index must serve like a rebuild")
  }
}
