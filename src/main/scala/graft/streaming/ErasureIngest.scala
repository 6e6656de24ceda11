package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The erasure-request front door for the CRM/SCD2 world: GDPR
  * requests arrive CONTINUOUSLY (a webhook stream, a CDC topic), but
  * [[graft.scd.Versioning.forget]] is a single-writer staged rewrite
  * that must not fight the live merge stream for the history table —
  * so requests stream into a durable QUEUE table cheaply
  * (O(batch) appends, exactly-once), and the maintenance window runs
  * ONE batched forget over everything pending ([[drain]]), the
  * [[graft.ml.Maintenance.maintainEveryN]] cadence discipline applied
  * to erasure. The reference's shape is the same queue-then-apply
  * split as its event queue (PodioApiGateway.py:86's pending
  * collection), re-expressed over directory-of-parquet tables.
  *
  * Enqueue delivery is at-most-once per batch id with replay
  * absorption, the shared [[BatchCommit]] discipline: each request
  * batch owns `ingest_batch=<id>/` (committed ⇔ `_SUCCESS`), records
  * its content fingerprint, and a recycled id after a checkpoint
  * reset fails loudly.
  *
  * Drain identity is the REQUEST, not the key: pending = queued
  * (ingest_batch, key) pairs minus the `_graft_drained` marks, so a
  * key erased once, legitimately re-ingested (re-consent), and named
  * by a LATER request is erased again — dedupe on the bare key would
  * silently drop every repeat request forever. Crash anywhere
  * converges by re-running [[drain]]: a crashed forget is repaired by
  * forget's own staged-swap replay, a crash between the forget and
  * the drained mark re-erases the same pending set (removes 0 — the
  * ids are already gone) and then marks; the cascade ledger absorbs
  * the replay row by content sig.
  */
object ErasureIngest {

  /** The per-request drained marks sibling of the queue table. */
  private[graft] val DrainedDir = "_graft_drained"

  /** Content fingerprint of a request batch (order-insensitive). */
  def batchSig(batch: DataFrame, key: String): Long = {
    val r = batch
      .agg(coalesce(expr(s"bit_xor(xxhash64($key))"), lit(0L))
        .as("x"), count(lit(1)).as("n")).head()
    r.getLong(0) * 31L + r.getLong(1)
  }

  /** Pure per-batch enqueue body (testable without a streaming
    * runtime): distinct request keys land in the queue's
    * `ingest_batch=<id>` partition. Null keys refuse loudly — a null
    * in an erase request is a malformed request, and dropping it
    * silently would "complete" an erasure that never happened.
    */
  def enqueueBatch(batch: DataFrame, batchId: Long, queuePath: String,
      key: String): Unit = {
    val spark = batch.sparkSession
    val ids = batch.select(
        when(col(key).isNotNull, col(key)).otherwise(raise_error(
          lit("enqueueBatch: null key in erase request batch")))
          .as(key))
      .distinct().localCheckpoint()
    BatchCommit.committedWrite(spark, queuePath, batchId,
      batchSig(ids, key),
      "point the stream at a fresh queuePath, or re-key the existing " +
        "partitions offline", lockRoot = queuePath) { part =>
      ids.write.parquet(part)
    }
  }

  /** Wire the streaming front door: each micro-batch of request rows
    * (any frame with the key column) enqueues exactly-once.
    */
  def start(requests: DataFrame, queuePath: String, key: String,
      checkpoint: String): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        enqueueBatch(batch, batchId, queuePath, key)
      }
      .start()

  /** The maintenance-window apply: one batched
    * [[graft.scd.Versioning.forget]] over every pending request, then
    * per-request drained marks. Returns (pending requests applied,
    * rows physically removed) — a drain with nothing pending is a
    * pure no-op (no forget, no ledger row, no lock taken). Requests
    * arriving AFTER the pending read simply stay pending for the next
    * drain (the enqueue side is append-only and partition-granular,
    * so no lock is needed between the stream and the drain).
    */
  def drain(spark: SparkSession, queuePath: String,
      targets: graft.scd.Versioning.ForgetTargets,
      key: String = "item_id", ledgerPath: Option[String] = None,
      breakStaleLock: Boolean = false): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(queuePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0L, 0L)
    val queued = spark.read.parquet(queuePath)
      .select(col("ingest_batch"), col(key))
    val drainedPath = new org.apache.hadoop.fs.Path(root, DrainedDir)
    val pending = (if (fs.exists(drainedPath))
        queued.join(spark.read.parquet(drainedPath.toString),
          Seq("ingest_batch", key), "left_anti")
      else queued).localCheckpoint()
    val nPending = pending.count()
    if (nPending == 0L) return (0L, 0L)
    val removed = graft.scd.Versioning.forget(spark,
      pending.select(col(key)), targets, key, breakStaleLock,
      ledgerPath)
    // drained marks LAST (after every table's swap landed), keyed by
    // request so replays absorb and later re-requests stay pending
    graft.sources.Evidence.appendDeduped(spark, pending,
      drainedPath.toString, Seq("ingest_batch", key))
    (nPending, removed)
  }
}
