package graft.streaming

import org.apache.spark.sql.SparkSession

/** The at-most-once-per-batch-id partition-commit discipline shared by
  * the streamed-table writers (corpus ingest, vector-index appends):
  * the partition dir `ingest_batch=<id>` is owned by its batch,
  * committed ⇔ `_SUCCESS`, and each commit records the batch's
  * content fingerprint in a `_GRAFT_BATCH_SIG` marker so a recycled
  * batch id (a checkpoint reset restarts numbering from 0) fails
  * loudly instead of silently dropping the new batch — one
  * implementation, so a fix to the crash-window logic can never land
  * in one ingest path and not the other.
  */
private[streaming] object BatchCommit {

  /** @param write receives the partition path; runs only when the
    *              partition is not yet committed
    * @param freshAdvice appended to the recycled-id error ("point the
    *              stream at a fresh X...")
    * @param lockRoot where the family's maintenance writer lock
    *              lives: the BASE index root for stream-sibling
    *              tables, the table root itself for the corpus —
    *              passed EXPLICITLY by each caller (deriving it by
    *              stripping the "_stream" suffix would mangle any
    *              table whose name legitimately ends in it — r16
    *              session review)
    */
  def committedWrite(spark: SparkSession, tableRoot: String,
      batchId: Long, sig: Long, freshAdvice: String, lockRoot: String)
      (write: String => Unit): Unit = {
    // maintenance writer lock (r15 verdict item 4): while a sweep
    // holds the family's index root, appends refuse loudly — the
    // fold/compact it runs rewrite the very directories this batch
    // would land in or be served against.
    graft.ml.Maintenance.refuseIfMaintaining(spark, lockRoot,
      "committedWrite")
    val part = new org.apache.hadoop.fs.Path(
      s"$tableRoot/ingest_batch=$batchId")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(part, "_GRAFT_BATCH_SIG")
    val committed =
      fs.exists(new org.apache.hadoop.fs.Path(part, "_SUCCESS"))
    val recorded =
      if (committed) graft.sources.Markers.read(fs, marker) else None
    if (committed && recorded.isDefined) {
      require(recorded.contains(sig.toString),
        s"partition $part is committed with different content " +
          s"(sig ${recorded.get}, incoming $sig): batch id $batchId " +
          s"was recycled by a checkpoint reset — $freshAdvice")
    } else if (committed) {
      // crash window: _SUCCESS landed but the marker write didn't. A
      // genuine replay recomputes the identical sig, so backfilling
      // re-arms the reset guard instead of leaving this batch id
      // unprotected forever. (If the id was ALREADY recycled inside
      // this narrow window the ambiguity is unresolvable from disk —
      // the backfill at least stops it widening.)
      graft.sources.Markers.write(fs, marker, sig.toString)
    }
    if (!committed) {
      write(part.toString)
      graft.sources.Markers.write(fs, marker, sig.toString)
    }
  }
}
