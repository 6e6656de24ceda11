package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ml.TextAnalysis

/** Streaming corpus ingest — the live counterpart of the ns22 batch
  * capstone: every micro-batch of raw documents is quality-gated
  * (length + language), near-dup-suppressed within the batch and
  * against the accumulated signature store ([[StreamingNearDup]]),
  * and the survivors append to a growing corpus table.
  *
  * Delivery: the signature store write is at-least-once with replay
  * re-emission (StreamingNearDup's batch_id discipline), and each
  * batch's survivors land in their OWN partition directory
  * (`ingest_batch=<id>/`) written with overwrite — a replayed batch
  * recomputes the same deterministic novel set and rewrites the same
  * partition, so replays neither lose documents nor duplicate them:
  * exactly-once corpus contents with an O(1) idempotence mechanism
  * (no probe that re-reads the ever-growing corpus per batch — that
  * cost would rise monotonically over the stream's lifetime).
  *
  * Scale: the gate is map-only; dedup touches only band-colliding
  * store rows; the per-batch partitions are what
  * [[graft.sources.Layout.compact]] re-bins offline.
  */
object CorpusIngest {

  /** Pure per-batch body (testable without a streaming runtime). */
  def ingestBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      storePath: String, minChars: Int, lang: String, maxHamming: Int)
      : Unit = {
    val gated = batch.filter(length(col("text")) >= minChars &&
      TextAnalysis.langId(col("text")) === lang)
    StreamingNearDup.processBatch(gated, batchId, storePath, maxHamming,
      (novel, bid) =>
        novel.write.mode("overwrite")
          .parquet(s"$corpusPath/ingest_batch=$bid"))
  }

  def start(streamingDocs: DataFrame, corpusPath: String,
      storePath: String, checkpoint: String,
      minChars: Int = 200, lang: String = "en", maxHamming: Int = 3)
      : StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, corpusPath, storePath,
          minChars, lang, maxHamming)
      }
      .start()
}
