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
  * re-emission (StreamingNearDup's batch_id discipline), and the
  * corpus append carries its own `ingest_batch` marker checked before
  * writing — so a replayed batch neither loses documents nor
  * duplicates them in the corpus: effectively exactly-once corpus
  * contents on top of at-least-once plumbing, the same marker trick
  * transactional table formats implement internally.
  *
  * Scale: the gate is map-only; dedup touches only band-colliding
  * store rows; the corpus append is partitioned parquet that
  * [[graft.sources.Layout.compact]] can re-bin offline.
  */
object CorpusIngest {

  /** Pure per-batch body (testable without a streaming runtime). */
  def ingestBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      storePath: String, minChars: Int, lang: String, maxHamming: Int)
      : Unit = {
    val gated = batch.filter(length(col("text")) >= minChars &&
      TextAnalysis.langId(col("text")) === lang)
    StreamingNearDup.processBatch(gated, batchId, storePath, maxHamming,
      (novel, bid) => {
        val spark = novel.sparkSession
        val p = new org.apache.hadoop.fs.Path(corpusPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val alreadyWritten = fs.exists(p) &&
          !spark.read.parquet(corpusPath)
            .filter(col("ingest_batch") === bid).isEmpty
        if (!alreadyWritten)
          novel.withColumn("ingest_batch", lit(bid))
            .write.mode("append").parquet(corpusPath)
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
}
