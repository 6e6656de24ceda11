package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ml.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming perceptual-hash maintenance: micro-batches of media rows
  * hash through the SAME kernel as the base build and land in the
  * stream sibling under the BatchCommit discipline; near-dup
  * questions served from stored hashes equal a from-scratch pass.
  */
class MediaIngestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def media = Multimodal.mediaTable(Tables.documents(spark, dir))

  private def mediaRows(df: org.apache.spark.sql.DataFrame)
      : Seq[Multimodal.MediaRow] = {
    val spark0 = spark
    import spark0.implicits._
    df.as[Multimodal.MediaRow].collect().toSeq
  }

  test("streamed media batches serve identically to a from-scratch " +
      "hash pass over the union; uncommitted partitions stay " +
      "invisible; replays absorb; recycled ids refuse loudly") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("media_ingest")
    try {
      val idx = tmp.resolve("idx").toString
      val base = media.filter(col("media_id") % 3 === 1)
      Multimodal.writePhashIndex(base, idx)
      // stream the % 3 == 2 third in two micro-batches
      val rest = mediaRows(media.filter(col("media_id") % 3 === 2))
      val (b1, b2) = rest.splitAt(rest.length / 2)
      val in = MemoryStream[Multimodal.MediaRow]
      val q = MediaIngest.start(in.toDF(), idx,
        tmp.resolve("ckpt").toString)
      try {
        in.addData(b1: _*); q.processAllAvailable()
        in.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      def hashes() = MediaIngest.servedHashes(spark, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val served = hashes()
      // hash rows are a pure per-row payload function: base ∪
      // streamed must equal a from-scratch pass over the union
      val expected = Multimodal.perceptualHash(
          media.filter(col("media_id") % 3 =!= 0)).toDF()
        .select(col("media_id"), col("ahash"), col("dhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(served === expected && served.nonEmpty)
      // ... and the served increment equals the in-memory ns66c form
      val inc = MediaIngest.phashIncrementServed(spark, idx,
        media.filter(col("media_id") % 3 === 0), maxHamming = 12,
        bands = 13, bandOccupancyCap = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).longValue)).toSet
      val allSigs = Multimodal.perceptualHash(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("ahash").as("simhash"))
      val ref = graft.ml.Dedup.simhashIncrementFromSigs(
        allSigs.filter(col("doc_id") % 3 === 0),
        allSigs.filter(col("doc_id") % 3 =!= 0),
        maxHamming = 12, bands = 13, bandOccupancyCap = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).longValue)).toSet
      assert(inc === ref && inc.nonEmpty)
      // an UNCOMMITTED partition (data, no _SUCCESS) must not serve —
      // simulate a write that died during job commit
      val torn = new java.io.File(
        s"${MediaIngest.streamPath(idx)}/ingest_batch=99")
      assert(torn.mkdirs())
      val donor = new java.io.File(
        s"${MediaIngest.streamPath(idx)}/ingest_batch=0")
        .listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(donor.toPath,
        torn.toPath.resolve(donor.getName))
      assert(hashes() === served,
        "an uncommitted batch partition leaked into serving")
      org.apache.commons.io.FileUtils.deleteDirectory(torn)
      // replay absorption: batch 0 with its own content is a no-op
      MediaIngest.ingestBatch(b1.toDF(), 0L, idx)
      assert(hashes() === served)
      // recycled id: same id, different content — loud refusal
      intercept[IllegalArgumentException] {
        MediaIngest.ingestBatch(b1.take(3).toDF(), 0L, idx)
      }
      // a rebuild must refuse while the sibling holds streamed data
      intercept[IllegalArgumentException] {
        Multimodal.writePhashIndex(base, idx)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("phash delete/fold/compact lifecycle: tombstones mask with " +
      "zero data files touched, compaction refuses on un-folded " +
      "streamed data then reclaims after the fold, re-runs converge, " +
      "and serving equals a from-scratch survivor build throughout") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("media_life")
    try {
      val idx = tmp.resolve("idx").toString
      Multimodal.writePhashIndex(
        media.filter(col("media_id") % 3 === 1), idx)
      def rootFiles(): Map[String, (Long, Long)] =
        new java.io.File(idx).listFiles().toSeq
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
      val before = rootFiles()
      // soft delete: id-sized append, data files byte-identical
      val dead = media.filter(col("media_id") % 3 === 1 &&
        col("media_id") % 5 === 0).select(col("media_id"))
      Multimodal.deleteFromPhashIndex(spark, dead, idx)
      assert(rootFiles() === before, "soft delete touched a data file")
      def served() = MediaIngest.servedHashes(spark, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      def fromScratch(pred: org.apache.spark.sql.Column) = {
        val ref = tmp.resolve(
          s"ref${System.identityHashCode(pred)}").toString
        Multimodal.writePhashIndex(media.filter(pred), ref)
        MediaIngest.servedHashes(spark, ref)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
      }
      val survivors = col("media_id") % 3 === 1 &&
        col("media_id") % 5 =!= 0
      assert(served() === fromScratch(survivors) && served().nonEmpty,
        "masked serving must equal a from-scratch survivor build")
      // streamed data present → compaction refuses (dropping the
      // tombstones would un-mask streamed rows)
      MediaIngest.ingestBatch(
        media.filter(col("media_id") % 3 === 2).limit(5), 0L, idx)
      intercept[IllegalArgumentException] {
        Multimodal.compactPhashIndex(spark, idx)
      }
      // streamed deletes land in the same tombstone table and mask a
      // signature that arrived via a streamed APPEND (the union mask)
      val delTarget = spark.read.parquet(
          s"${MediaIngest.streamPath(idx)}/ingest_batch=0")
        .select(max(col("media_id"))).head().getLong(0)
      assert(served().exists(_._1 == delTarget))
      val delIn = MemoryStream[Long]
      val dq = MediaIngest.startDeletes(
        delIn.toDF().withColumnRenamed("value", "media_id"), idx,
        tmp.resolve("dckpt").toString)
      try {
        delIn.addData(delTarget); dq.processAllAvailable()
      } finally dq.stop()
      assert(!served().exists(_._1 == delTarget),
        "streamed delete must mask a streamed-append signature")
      // fold drains the batch into the base; union-serve unchanged
      val afterIngest = served()
      assert(Multimodal.foldStreamIntoPhashIndex(spark, idx) === 1L)
      assert(served() === afterIngest,
        "fold changed the served signature set")
      // now compaction reclaims: tombstones drained, dead rows gone,
      // serving unchanged, immediate re-run a no-op
      assert(Multimodal.compactPhashIndex(spark, idx) > 0L)
      val afterCompact = served()
      assert(afterCompact === afterIngest)
      assert(spark.read.parquet(idx)
        .filter(col("media_id") % 5 === 0 &&
          col("media_id") % 3 === 1).count() === 0L,
        "compaction left dead rows in the data files")
      assert(Multimodal.compactPhashIndex(spark, idx) === 0L)
      assert(served() === afterCompact)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
