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
}
