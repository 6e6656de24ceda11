package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.Dedup

/** Streaming near-duplicate suppression — dedup for the ingest
  * firehose: every micro-batch is SimHashed, deduplicated within
  * itself, then checked against the accumulated signature store; only
  * novel documents flow on, and their signatures append to the store.
  *
  * This composes the batch operators (graft.ml.Dedup) inside
  * foreachBatch rather than reimplementing them for streaming — the
  * signature store is the only state, and it lives in a parquet table
  * (the local stand-in for a Delta/Iceberg table), NOT in streaming
  * state, so it survives restarts, is queryable, and can be compacted
  * independently.
  *
  * Scale: the store carries one (doc_id, simhash) long pair per unique
  * document ever seen; the per-batch check is the banded signature
  * join (batch-side banded × store-side banded), which touches only
  * store rows sharing a band value with the batch — not the full
  * store.
  */
object StreamingNearDup {

  private val bands = 7

  private def banded(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until bands).map { bIdx =>
      val lo = 60 * bIdx / bands
      val hi = 60 * (bIdx + 1) / bands
      struct(lit(bIdx).as("band"),
        expr(s"(shiftright(simhash, $lo) % ${1L << (hi - lo)})")
          .as("band_bits"))
    }
    sigs.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))
  }

  /** Pure per-batch core (testable without a streaming runtime):
    * returns the batch rows that are novel w.r.t. both the batch
    * itself (greedy: a doc is dropped if it near-dups any
    * smaller-doc_id batch member) and the signature store.
    */
  def filterNovel(batch: DataFrame, store: DataFrame, maxHamming: Int)
      : DataFrame = {
    val sigs = Dedup.simhash(batch)
    // within-batch: drop the larger id of every near-dup pair
    val withinDropped = Dedup.simhashPairs(batch, maxHamming)
      .select(col("j").as("doc_id")).distinct()
    val survivors = sigs.join(withinDropped, Seq("doc_id"), "left_anti")
    // against the store: banded candidate join + hamming verify
    val seen = banded(survivors)
      .join(banded(store)
        .select(col("doc_id").as("sid"), col("simhash").as("ssig"),
          col("band"), col("band_bits")),
        Seq("band", "band_bits"))
      .filter(bit_count(expr("simhash ^ ssig")) <= maxHamming)
      .select(col("doc_id")).distinct()
    val novelSigs = survivors.join(seen, Seq("doc_id"), "left_anti")
    batch.join(novelSigs, Seq("doc_id"), "left_semi")
  }

  /** Read the signature store, tolerating first-run absence. */
  def readStore(spark: SparkSession, storePath: String): DataFrame =
    try spark.read.parquet(storePath).select("doc_id", "simhash")
    catch {
      case _: Throwable =>
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("doc_id", "simhash")
    }

  /** Wire the stream: novel docs → onBatch, their signatures appended
    * to the store. Replays are idempotent for emission purposes
    * because a replayed batch's docs are already in the store — they
    * are filtered out, not re-emitted (requires the store append to
    * have committed; parquet append is the non-transactional stand-in
    * for a Delta MERGE).
    */
  def start(streamingDocs: DataFrame, storePath: String,
      checkpoint: String, maxHamming: Int,
      onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // localCheckpoint (eager) severs the lineage BEFORE the store
        // append: a lazy `novel` would re-read the store on the next
        // action and find the batch's own just-appended signatures,
        // filtering everything out
        val novel = filterNovel(batch, readStore(spark, storePath),
          maxHamming).localCheckpoint()
        Dedup.simhash(novel).write.mode("append").parquet(storePath)
        onBatch(novel, batchId)
        ()
      }
      .start()
}
