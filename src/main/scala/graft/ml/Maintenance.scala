package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance POLICY for the standing indexes (r14 verdict item 5).
  * Every index family exposes crash-safe manual maintenance —
  * `compact*` reclaims tombstone/duplicate debt, `foldStreamInto*`
  * drains committed streamed batches — but nothing decided WHEN: a
  * year of streamed takedowns degrades every serve behind a mask that
  * only grows. [[compactionDebt]] measures the three debt axes
  * (tombstone ids still masking, committed un-folded stream batches,
  * multi-file bucket directories) in one cheap metadata-plus-
  * id-column pass, and [[maintainIndex]] fires the family's existing
  * fold+compact exactly when a threshold is crossed — the sweep is
  * the same crash-safe machinery the per-family specs and ns*
  * `*_compacted` gates already prove answer-invisible.
  *
  * Single-writer discipline is inherited from the compactors: pause
  * the family's ingest/delete streams around a sweep (the substr
  * writer lock and the flat tiers' stage markers make racing loud,
  * not silent, but the sweep is designed to run in the maintenance
  * window, not beside live appends).
  */
object Maintenance {

  /** One index family's measured maintenance debt.
    *
    * @param tombstoneIds   distinct ids still masking at read — every
    *                       serve pays an anti-join against them
    * @param tombstoneFiles parquet files composing the tombstone table
    *                       (append-heavy deletes accumulate tiny files)
    * @param streamBacklog  committed, un-folded `ingest_batch=`
    *                       partitions in the `_stream` sibling — every
    *                       serve unions them
    * @param multiFileBuckets bucket/cell partition dirs holding more
    *                       than one data file (append/replay debt);
    *                       0 for the flat families, whose compactor is
    *                       a full rewrite
    */
  final case class IndexDebt(family: String, tombstoneIds: Long,
      tombstoneFiles: Long, streamBacklog: Long, multiFileBuckets: Long)

  /** Sweep triggers — a sweep fires when ANY axis exceeds its bound.
    * Defaults are deliberately conservative (an id-sized broadcast
    * anti-join is cheap well past 1024 ids); deployments tune them to
    * their serve-latency budget.
    */
  final case class Thresholds(maxTombstoneIds: Long = 1024L,
      maxStreamBacklog: Long = 8L, maxMultiFileBuckets: Long = 64L)

  /** family → (tombstone sibling, id column, partition-dir prefix —
    * empty for the flat tables, fold + compact actions).
    */
  private def familySpec(family: String): (String, String, String,
      Option[(SparkSession, String) => Long],
      (SparkSession, String) => Long) = family match {
    case "bm25" => (Retrieval.DeletedDir, "doc_id", "bkt=",
      Some(Retrieval.foldStreamIntoBm25Index),
      Retrieval.compactBm25Index)
    case "ivf" => (Similarity.DeletedDir, "vec_id", "cell=",
      Some(Similarity.foldStreamIntoIvfIndex),
      Similarity.compactIvfIndex)
    case "binary" => (Similarity.BinDeletedDir, "vec_id", "",
      Some(Similarity.foldStreamIntoBinaryIndex),
      Similarity.compactBinaryIndex)
    case "phash" => (Multimodal.PhashDeletedDir, "media_id", "",
      Some(Multimodal.foldStreamIntoPhashIndex),
      Multimodal.compactPhashIndex)
    case "substr" => (Dedup.SubstrDeletedDir, "doc_id", "bkt=",
      // SubstrIngest appends straight into the bucket dirs — the
      // substr family has no stream sibling to fold
      None,
      (s: SparkSession, p: String) => Dedup.compactSubstrIndex(s, p))
    // corpus: multi-file `ingest_batch=` dirs are the NORMAL shape
    // (one file set per committed trigger — small-file re-binning is
    // Layout.compactPartitions' job), so the bucket axis stays 0 and
    // only the tombstone axis drives this family's sweep
    case "corpus" => (graft.streaming.CorpusIngest.DeletedDir,
      "doc_id", "", None,
      graft.streaming.CorpusIngest.compactCorpus)
    case "neardup_store" => (graft.streaming.StreamingNearDup.DeletedDir,
      "doc_id", "", None,
      graft.streaming.StreamingNearDup.compactStore)
    case other => throw new IllegalArgumentException(
      s"unknown index family '$other' — one of " +
        "bm25/ivf/binary/phash/substr/corpus/neardup_store")
  }

  /** Measure the index's maintenance debt. Cost shape: one file-system
    * listing of the root, the tombstone sibling, and the stream
    * sibling, plus one column-pruned distinct-count over the tombstone
    * FILES (id-sized — the takedown tables this engine appends are
    * small by contract; a huge one is exactly the signal this report
    * exists to surface).
    */
  def compactionDebt(spark: SparkSession, path: String,
      family: String): IndexDebt = {
    val (deletedDir, idCol, bucketPrefix, _, _) = familySpec(family)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = Similarity.tombstoneFileSnapshot(fs, path, deletedDir)
    val tombIds =
      if (tomb.isEmpty) 0L
      else spark.read.parquet(tomb.map(_.toString): _*)
        .select(col(idCol)).distinct().count()
    val sib = new org.apache.hadoop.fs.Path(
      path + Similarity.StreamSiblingSuffix)
    val backlog =
      if (!fs.exists(sib)) 0L
      else fs.listStatus(sib).count { st =>
        st.isDirectory && st.getPath.getName.startsWith("ingest_batch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath,
            "_SUCCESS")) &&
          !fs.exists(new org.apache.hadoop.fs.Path(st.getPath,
            Similarity.FoldedMarker))
      }.toLong
    val multi =
      if (bucketPrefix.isEmpty) 0L
      else fs.listStatus(root).count { st =>
        st.isDirectory && st.getPath.getName.startsWith(bucketPrefix) &&
          fs.listStatus(st.getPath)
            .count(_.getPath.getName.endsWith(".parquet")) > 1
      }.toLong
    IndexDebt(family, tombIds, tomb.size.toLong, backlog, multi)
  }

  /** Threshold-triggered sweep: measure, and when any axis exceeds
    * its bound, drain the stream sibling (families that have one) and
    * run the family's compactor — both the existing crash-safe
    * implementations, so a sweep interrupted at ANY point re-enters
    * exactly as the per-family crash specs prove. Returns the debt
    * that was measured and whether the sweep fired; a no-op below the
    * thresholds costs only the measurement.
    */
  def maintainIndex(spark: SparkSession, path: String, family: String,
      thresholds: Thresholds = Thresholds()): (IndexDebt, Boolean) = {
    val debt = compactionDebt(spark, path, family)
    val fire = debt.tombstoneIds > thresholds.maxTombstoneIds ||
      debt.streamBacklog > thresholds.maxStreamBacklog ||
      debt.multiFileBuckets > thresholds.maxMultiFileBuckets
    if (fire) {
      val (_, _, _, fold, compact) = familySpec(family)
      if (debt.streamBacklog > 0L) fold.foreach(f => f(spark, path))
      compact(spark, path)
      ()
    }
    (debt, fire)
  }
}
