package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (bit-interleaved) clustering: sort rows by the
    * interleaved bits of several columns' quantile-bucket ranks before
    * writing, so parquet row-group/file min-max stats are selective on
    * EVERY clustered column — a lexicographic sort makes them
    * selective only on the leading key, leaving a predicate on the
    * second column to scan every file. The multi-dimensional analog of
    * [[writePartitioned]]'s directory pruning, at the row-group level.
    *
    * Shape at scale: per-column bucket boundaries come from
    * `approxQuantile` (one sketch pass, driver gets ≤ buckets·|cols|
    * doubles — a model, not data); the z-value is a map-only bit
    * interleave; the write is ONE range shuffle on z (the same
    * shuffle any globally-sorted write pays). Quantile bucketing, not
    * fixed-width, so skewed columns still split evenly.
    *
    * Numeric columns only (the quantile sketch's domain). Nulls rank
    * in bucket 0; NaN ranks highest (Spark comparison semantics) —
    * both deterministic.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      buckets: Int = 64, targetFiles: Int = 64): Unit = {
    require(zCols.nonEmpty, "need at least one clustering column")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    require(targetFiles > 0, "targetFiles must be positive")
    val bits = java.lang.Integer.numberOfTrailingZeros(buckets)
    require(bits * zCols.size <= 63,
      s"${zCols.size} columns x $bits bits exceeds a long z-value")
    val k = zCols.size
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // the multi-column overload: ONE scan of df for every column's
    // boundaries (per-column calls would re-run the upstream lineage
    // |zCols| times)
    val allBounds = df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    val z = zCols.zipWithIndex.map { case (c, ci) =>
      // rank = how many boundaries the value has passed (ties between
      // duplicate boundaries just skip buckets — still monotone)
      val bucket = allBounds(ci).foldLeft(lit(0)) { (acc, b) =>
        acc + when(df(c).cast("double") >= b, 1).otherwise(0)
      }.cast("long")
      (0 until bits).map { j =>
        shiftleft(shiftright(bucket, j).bitwiseAND(lit(1L)), j * k + ci)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
    df.withColumn("_graft_z", z)
      .repartitionByRange(targetFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: streaming appends (per-batch parquet
    * writes, e.g. the StreamingNearDup signature store) accumulate
    * tiny files that tax the scan planner and the namenode; rewrite
    * the table into ~targetFileBytes files.
    *
    * `zOrderBy` non-empty re-clusters the rewrite through
    * [[writeZOrdered]] instead of a round-robin repartition — REQUIRED
    * when compacting a z-ordered table: the plain rewrite scatters
    * rows arbitrarily across files, silently destroying the min-max
    * tightness every scan's row-group skipping depends on (appended
    * post-write files have already diluted it, which is usually why
    * such a table needs compacting at all).
    *
    * Safety: the rewrite reads an explicit file snapshot, lands in a
    * temp directory, and files appended AFTER the snapshot are rescued
    * into the new directory before the swap; every rename result is
    * checked and the backup is deleted only once the new table is in
    * place. A writer mid-swap can still race the two renames — pause
    * the stream to compact, or use a transactional table format; this
    * is the honest limit of directory-of-parquet tables.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zOrderBy: Seq[String] = Nil): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mustRename(a: org.apache.hadoop.fs.Path,
        b: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(a, b), s"compact: rename $a -> $b failed")
    val snapshot = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    if (snapshot.isEmpty) return
    val totalBytes = snapshot.map(_.getLen).sum
    val nFiles = math.max(1, ((totalBytes + targetFileBytes - 1)
      / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    fs.delete(tmp, true)
    // mergeSchema: an append store may mix files of evolved schemas
    // (StreamingNearDup's legacy/batch_id generations) — sampling one
    // file's footer would silently drop the newer columns
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(snapshot.map(_.getPath.toString): _*)
    if (zOrderBy.nonEmpty)
      writeZOrdered(merged, tmp.toString, zOrderBy, targetFiles = nFiles)
    else
      merged.repartition(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "_precompact")
    fs.delete(bak, true)
    mustRename(p, bak)
    // rescue everything the rewrite didn't subsume: parquet appended
    // between the snapshot and the swap, every non-parquet metadata
    // file (layout markers like _GRAFT_BATCH_SIG carry idempotence
    // state — deleting them with the backup would disarm their
    // guards), AND subdirectories (a mixed dir with nested partition
    // children must not lose them to the backup delete). Entries the
    // tmp write created itself (_SUCCESS) are kept from the NEW
    // directory, not overwritten from the old; one tmp listing, not
    // an exists() round-trip per backup entry.
    val snapNames = snapshot.map(_.getPath.getName).toSet
    val tmpNames = fs.listStatus(tmp).map(_.getPath.getName).toSet
    fs.listStatus(bak)
      .filter(f => !snapNames.contains(f.getPath.getName)
        && !tmpNames.contains(f.getPath.getName))
      .foreach(f => mustRename(f.getPath,
        new org.apache.hadoop.fs.Path(tmp, f.getPath.getName)))
    // Hadoop rename(tmp, p) onto an EXISTING directory "succeeds" by
    // moving tmp INSIDE p — so if a concurrent writer recreated the
    // table dir between the swap renames, both the rename result and a
    // bare exists(p) check would pass while the compacted data sat
    // nested under p/_compacting. Fail loudly on both edges instead.
    require(!fs.exists(p),
      s"compact: $p was recreated mid-swap (concurrent writer?) — " +
        s"original data preserved at $bak, compacted data at $tmp")
    mustRename(tmp, p)
    require(fs.exists(p), s"compact: new table missing at $p")
    require(!fs.exists(new org.apache.hadoop.fs.Path(p, tmp.getName)),
      s"compact: rename landed $tmp INSIDE $p (raced swap) — " +
        s"original data preserved at $bak")
    fs.delete(bak, true)
    ()
  }

  /** Compact a Hive-partitioned table (`col=value/` subdirectories,
    * e.g. the streaming corpus's `ingest_batch=<id>/` layout) by
    * running [[compact]] inside each LEAF partition directory — the
    * partition structure survives, which matters when a writer's
    * idempotence depends on it. [[compact]] itself only sees
    * top-level `*.parquet` files, so calling it on a partitioned
    * root is a silent no-op; this is the partition-aware entry.
    * Multi-level layouts (`date=…/hour=…`) recurse until the level
    * that actually holds data files.
    */
  def compactPartitions(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zOrderBy: Seq[String] = Nil): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    fs.listStatus(p)
      .filter(f => f.isDirectory && f.getPath.getName.contains("="))
      .foreach { d =>
        val nested = fs.listStatus(d.getPath).exists(c =>
          c.isDirectory && c.getPath.getName.contains("="))
        // a mixed dir (nested children AND loose data files) gets
        // both: compact() no-ops when there are no loose files, and
        // its rescue pass carries child directories through the swap
        compact(spark, d.getPath.toString, targetFileBytes, zOrderBy)
        if (nested)
          compactPartitions(spark, d.getPath.toString, targetFileBytes,
            zOrderBy)
      }
  }
}
