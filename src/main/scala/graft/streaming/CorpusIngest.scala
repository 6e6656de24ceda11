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
  * (`ingest_batch=<id>/`), committed at most once: a partition whose
  * `_SUCCESS` marker exists is never rewritten (protects committed
  * data from both replays and recycled batchIds after a checkpoint
  * reset), while a partial directory from a died write is overwritten
  * by the replay. O(1) per batch — no probe re-reads the ever-growing
  * corpus.
  *
  * Scale: the gate is map-only; dedup touches only band-colliding
  * store rows; the per-batch partition directories accumulate one
  * small file set per trigger — re-bin them offline with
  * [[graft.sources.Layout.compactPartitions]] (per-partition, so the
  * `ingest_batch=` structure the idempotence depends on survives).
  */
object CorpusIngest {

  /** Pure per-batch body (testable without a streaming runtime).
    *
    * Recycled batch ids (a checkpoint reset restarts numbering from 0)
    * cannot be silently absorbed here the way the signature store
    * absorbs them: the partition path IS the batch id, and the
    * committed generation's data must not be overwritten. Each commit
    * therefore records the batch's content fingerprint in a
    * `_GRAFT_BATCH_SIG` marker; a committed partition re-encountered
    * with DIFFERENT content fails loudly — "checkpoint reset detected,
    * use a fresh corpusPath (or re-key the existing partitions)" —
    * instead of silently dropping the new batch's documents.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      storePath: String, minChars: Int, lang: String, maxHamming: Int)
      : Unit = {
    val gated = batch.filter(length(col("text")) >= minChars &&
      TextAnalysis.langId(col("text")) === lang)
    StreamingNearDup.processBatchWithSig(gated, batchId, storePath,
      maxHamming, (novel, bid, sig) =>
        BatchCommit.committedWrite(novel.sparkSession, corpusPath, bid,
          sig, "point the stream at a fresh corpusPath, or re-key " +
            "the existing partitions offline") { part =>
          novel.write.mode("overwrite").parquet(part)
        })
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

  /** The crawl-format FRONT DOOR: a directory of raw JSONL files (the
    * wire format crawls actually deliver) streams through
    * [[graft.sources.JsonlCorpus.readStreamQuarantined]]'s malformed-
    * line split before the quality gate — bad lines land as raw-line
    * rows under `rejectsPath/ingest_batch=<id>/` (the replayable
    * dead-letter; written FIRST, overwrite-per-batch-id, so a crash
    * between the rejects write and the corpus commit replays to the
    * identical rejects partition — the SubstrIngest report
    * discipline), good lines flow into [[ingestBatch]]'s gate →
    * near-dup store → committed corpus append unchanged. A malformed
    * line can therefore never kill the stream (FAILFAST) nor vanish
    * (DROPMALFORMED) — the batch gate ns67 states the same split
    * cross-engine, and the shared parser means the streamed split
    * cannot drift from it. `schema` must include the `doc_id` and
    * `text` fields the downstream gate keys on.
    */
  def startJsonl(spark: org.apache.spark.sql.SparkSession,
      feedDir: String, schema: org.apache.spark.sql.types.StructType,
      corpusPath: String, storePath: String, rejectsPath: String,
      checkpoint: String, minChars: Int = 200, lang: String = "en",
      maxHamming: Int = 3): StreamingQuery = {
    require(schema.fieldNames.contains("doc_id")
        && schema.fieldNames.contains("text"),
      "startJsonl: schema must carry doc_id and text for the gate")
    graft.sources.JsonlCorpus
      .readStreamQuarantined(spark, feedDir, schema)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.JsonlCorpus.rejects(batch)
          .write.mode("overwrite")
          .parquet(s"$rejectsPath/ingest_batch=$batchId")
        ingestBatch(graft.sources.JsonlCorpus.goodRows(batch),
          batchId, corpusPath, storePath, minChars, lang, maxHamming)
      }
      .start()
  }
}
