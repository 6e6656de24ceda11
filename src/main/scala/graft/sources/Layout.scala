package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layout for the 100 TB posture (SURVEY.md §7.4): the
  * item history partitioned by event date and bucketed by item key.
  *
  * - **Partitioning** (directory-level): every query with a partition-
  *   column predicate prunes whole directories before any IO —
  *   `PartitionFilters` in the scan, zero row groups read for pruned
  *   dates. This is what keeps the SCD2 merge touching only the
  *   partitions containing a batch's keys.
  * - **Bucketing** (file-level): two tables bucketed by the same key
  *   with the same bucket count join with NO shuffle on either side —
  *   the join the CDC pipeline runs per batch (events ⋈ items) becomes
  *   a local zip of co-numbered buckets. At 1000 executors that is the
  *   difference between an all-to-all of the fact table and none.
  *
  * Bucketed writes go through the session catalog (`saveAsTable`) —
  * bucket metadata lives in the catalog, which is how Spark knows the
  * co-location at plan time.
  */
object Layout {

  /** Append-style history layout: partition directories by the given
    * columns (typically the event date).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Catalog-registered bucketed table: co-locates rows by hash(key)
    * into `buckets` files, sorted within each bucket for merge-join
    * friendliness.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key —
    * planned without an Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Small-file compaction: streaming appends (per-batch parquet
    * writes, e.g. the StreamingNearDup signature store) accumulate
    * tiny files that tax the scan planner and the namenode; rewrite
    * the table into ~targetFileBytes files. Rewrite goes through a
    * temp directory so a crash mid-compact never loses the original.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, (totalBytes / targetFileBytes).toInt +
      (if (totalBytes % targetFileBytes > 0) 1 else 0))
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "_precompact")
    fs.delete(bak, true)
    fs.rename(p, bak)
    fs.rename(tmp, p)
    fs.delete(bak, true)
  }
}
