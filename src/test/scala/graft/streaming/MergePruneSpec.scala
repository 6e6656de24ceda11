package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** SURVEY §9's merge-pruning claim, proven against real plans and real
  * directories: an SCD2 merge against a key-bucket-partitioned history
  * reads only the bucket partitions holding the batch's keys
  * (PartitionFilters on the scan), and the dynamic-overwrite write-back
  * leaves every untouched bucket's files byte-identical in place.
  */
class MergePruneSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, item: Long, payload: String) =
    CdcEvent(id, ts(t), item, "item.update", payload, 0)

  test("pruned merge reads only the batch's bucket partitions and the " +
      "write-back preserves untouched buckets bit-for-bit") {
    val nBuckets = 8
    val histDir = java.nio.file.Files
      .createTempDirectory("graft_merge_prune").toString + "/history"

    // seed history: one create per item over enough items to populate
    // every bucket, flagged through the real merge path
    val seed = (1L to 64L).map(i =>
      ev(i, "2024-01-01 10:00:00", i, s"v1-$i")).toDF()
    val hist0 = CdcPipeline.mergeBatch(seed.limit(0), seed, "item_id")
      .withColumn("key_bucket", CdcPipeline.keyBucket("item_id", nBuckets))
    Layout.writePartitioned(hist0, histDir, Seq("key_bucket"))

    // a batch touching ONE item → one bucket
    val batch = Seq(ev(1001L, "2024-01-02 09:00:00", 7L, "v2-7")).toDF()
    val (merged, buckets) =
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", nBuckets)
    assert(buckets.length === 1, s"one key must map to one bucket: $buckets")

    // the scan must carry a partition filter on key_bucket — directory
    // pruning, not a full read + row filter
    val planStr = merged.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), planStr.take(800))
    val scanStr = merged.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains(histDir.takeRight(20)))
      .getOrElse(planStr)
    assert(scanStr.contains("key_bucket"), scanStr.take(800))

    // snapshot the untouched buckets' files before the write-back
    val root = new java.io.File(histDir)
    def bucketFiles(): Map[String, Seq[(String, Long, Long)]] =
      root.listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSeq.sorted
      }.toMap
    val before = bucketFiles()
    val touched = s"key_bucket=${buckets.head}"

    CdcPipeline.writeMergedBuckets(merged, histDir, nBuckets)

    val after = bucketFiles()
    (before.keySet - touched).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    }

    // semantic equivalence: the pruned round-trip equals a full merge
    val expected = CdcPipeline.mergeBatch(
        hist0, batch.withColumn("key_bucket",
          CdcPipeline.keyBucket("item_id", nBuckets)), "item_id")
      .select("event_id", "current")
      .as[(Long, Int)].collect().toSet
    val got = spark.read.parquet(histDir)
      .select("event_id", "current")
      .as[(Long, Int)].collect().toSet
    assert(got === expected)
    // item 7's old version demoted, new version current, others intact
    val current7 = spark.read.parquet(histDir)
      .filter(col("item_id") === 7 && col("current") === 1)
      .select("payload").as[String].collect().toSeq
    assert(current7 === Seq("v2-7"))

    // the write-back stamped the layout's bucket count: a later merge
    // with the WRONG n must fail loudly (mis-pruning silently breaks
    // the one-current invariant), the right n must keep working
    val again = Seq(ev(1002L, "2024-01-03 09:00:00", 7L, "v3-7")).toDF()
    intercept[IllegalArgumentException] {
      CdcPipeline.mergeBatchPruned(spark, histDir, again, "item_id", 16)
    }
    val (m2, _) =
      CdcPipeline.mergeBatchPruned(spark, histDir, again, "item_id", nBuckets)
    assert(m2.filter(col("item_id") === 7 && col("current") === 1)
      .select("payload").as[String].collect().toSeq === Seq("v3-7"))
  }

  test("first-ever batch bootstraps an absent history path") {
    val histDir = java.nio.file.Files
      .createTempDirectory("graft_merge_boot").toString + "/history"
    val batch = Seq(ev(1L, "2024-01-01 10:00:00", 42L, "v1")).toDF()
    val (merged, buckets) =
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", 8)
    assert(buckets.length === 1)
    CdcPipeline.writeMergedBuckets(merged, histDir, 8)
    val out = spark.read.parquet(histDir)
    assert(out.count() === 1)
    assert(out.filter(col("current") === 1).count() === 1)
    // and the layout marker protects the fresh table too
    intercept[IllegalArgumentException] {
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", 4)
    }
  }

  test("a marker-only history dir (crash between stamp and first data " +
      "write) recovers via the bootstrap branch, not a schema error") {
    val histDir = java.nio.file.Files
      .createTempDirectory("graft_merge_crash").toString + "/history"
    // simulate writeMergedBuckets dying right after the stamp: the
    // directory exists and carries _GRAFT_NBUCKETS, but no parquet
    val root = new org.apache.hadoop.fs.Path(histDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(root, "_GRAFT_NBUCKETS"), "8")
    val batch = Seq(ev(1L, "2024-01-01 10:00:00", 42L, "v1")).toDF()
    // before the hasParquetData guard this threw 'unable to infer
    // schema'; now it must bootstrap like an absent path
    val (merged, _) =
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", 8)
    CdcPipeline.writeMergedBuckets(merged, histDir, 8)
    val out = spark.read.parquet(histDir)
    assert(out.count() === 1)
    assert(out.filter(col("current") === 1).count() === 1)
    // the stamped marker still guards: a mismatched n fails loudly
    // even in the marker-only state
    intercept[IllegalArgumentException] {
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", 4)
    }
  }

  test("leftover task files under _temporary do not count as data: " +
      "the bootstrap branch still fires (crashed first parquet job)") {
    val histDir = java.nio.file.Files
      .createTempDirectory("graft_merge_tmpfiles").toString + "/history"
    val root = new org.apache.hadoop.fs.Path(histDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the stamp landing and the first parquet job dying
    // mid-task: FileOutputCommitter leaves task files (no underscore
    // prefix on the LEAF name) under _temporary, which Spark's
    // FileIndex ignores — so counting them as data would route away
    // from bootstrap and wedge on 'unable to infer schema'
    fs.mkdirs(root)
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(root, "_GRAFT_NBUCKETS"), "8")
    val orphan = new org.apache.hadoop.fs.Path(root,
      "_temporary/0/task_0000/part-00000.parquet")
    fs.mkdirs(orphan.getParent)
    val os = fs.create(orphan)
    os.write(Array[Byte](1, 2, 3)); os.close()
    val batch = Seq(ev(1L, "2024-01-01 10:00:00", 42L, "v1")).toDF()
    val (merged, _) =
      CdcPipeline.mergeBatchPruned(spark, histDir, batch, "item_id", 8)
    CdcPipeline.writeMergedBuckets(merged, histDir, 8)
    assert(spark.read.parquet(histDir).count() === 1)
  }
}
