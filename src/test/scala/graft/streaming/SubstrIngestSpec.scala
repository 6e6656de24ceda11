package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ml.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ExactSubstr maintenance: monotone micro-batches append
  * to the standing shingle-hash index, and the online-dedup wiring
  * reports each batch against exactly the pre-batch corpus — equal to
  * the full recompute restricted to the batch, which is the same
  * contract the ns55b/ns55c registry gates prove for the batch path.
  */
class SubstrIngestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def docRows(df: org.apache.spark.sql.DataFrame): Seq[DocRow] = {
    val spark0 = spark
    import spark0.implicits._
    df.as[(Long, String)].collect().toSeq
      .map { case (id, t) => DocRow(id, t) }
  }

  test("streamed batches report against the pre-batch corpus and " +
      "index the whole feed; reports equal the full recompute") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = docs.count()
    val (t1, t2) = (n / 2, 3 * n / 4)
    val tmp = java.nio.file.Files.createTempDirectory("substr_ingest")
    try {
      val idx = tmp.resolve("idx").toString
      val rep = tmp.resolve("reports").toString
      Dedup.writeSubstrIndex(docs.filter(col("doc_id") < t1), idx, k = 4)
      val b1 = docRows(docs.filter(col("doc_id") >= t1
        && col("doc_id") < t2))
      val b2 = docRows(docs.filter(col("doc_id") >= t2))
      val in = MemoryStream[DocRow]
      val q = SubstrIngest.startWithReports(in.toDF(), idx, rep,
        tmp.resolve("ckpt").toString)
      try {
        in.addData(b1: _*); q.processAllAvailable()
        in.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      // every doc of the feed is indexed exactly once
      assert(spark.read.parquet(s"$idx/${Dedup.SubstrDocsDir}")
        .count() === n)
      // each batch's persisted report equals the full recompute over
      // (everything seen up to and including that batch) restricted
      // to the batch — the pre-batch-corpus contract
      val full1 = Dedup.exactSubstr(docs.filter(col("doc_id") < t2),
        k = 4).filter(col("doc_id") >= t1)
      val got1 = spark.read.parquet(s"$rep/ingest_batch=0")
      assert(got1.exceptAll(full1).isEmpty
        && full1.exceptAll(got1).isEmpty,
        "batch-1 report diverges from the full recompute")
      val full2 = Dedup.exactSubstr(docs, k = 4)
        .filter(col("doc_id") >= t2)
      val got2 = spark.read.parquet(s"$rep/ingest_batch=1")
      assert(got2.exceptAll(full2).isEmpty
        && full2.exceptAll(got2).isEmpty,
        "batch-2 report diverges from the full recompute")
      // a replayed fully-landed batch is a no-op for report AND index
      SubstrIngest.reportAndIngestBatch(
        docs.filter(col("doc_id") >= t2), 1L, idx, rep)
      assert(spark.read.parquet(s"$idx/${Dedup.SubstrDocsDir}")
        .count() === n)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("streamed reports mask tombstoned docs: a takedown between " +
      "batches stops flagging spans against the deleted text, and " +
      "the stream keeps ingesting past it") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = docs.count()
    val t1 = n / 2
    val tmp = java.nio.file.Files.createTempDirectory("substr_del_ing")
    try {
      val idx = tmp.resolve("idx").toString
      val rep = tmp.resolve("reports").toString
      Dedup.writeSubstrIndex(docs.filter(col("doc_id") < t1), idx, k = 4)
      // takedown of part of the indexed base BETWEEN batches
      val deadDf = docs.filter(col("doc_id") < t1
        && col("doc_id") % 5 === 0).select(col("doc_id"))
      Dedup.deleteFromSubstrIndex(spark, deadDf, idx)
      val in = MemoryStream[DocRow]
      val q = SubstrIngest.startWithReports(in.toDF(), idx, rep,
        tmp.resolve("ckpt").toString)
      try {
        in.addData(docRows(docs.filter(col("doc_id") >= t1)): _*)
        q.processAllAvailable()
      } finally q.stop()
      // the batch report equals the full recompute over the SURVIVOR
      // corpus plus the batch, restricted to the batch
      val survivors = docs.filter(col("doc_id") >= t1
        || col("doc_id") % 5 =!= 0)
      val want = Dedup.exactSubstr(survivors, k = 4)
        .filter(col("doc_id") >= t1)
      val got = spark.read.parquet(s"$rep/ingest_batch=0")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed report diverges from the survivor recompute")
      // ingest completed: the whole feed is indexed (deleted ids stay
      // in the docs sibling — the monotone guard covers them forever)
      assert(spark.read.parquet(s"$idx/${Dedup.SubstrDocsDir}")
        .count() === n)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("a streamed DELETE feed tombstones between ingest triggers: " +
      "the next batch's report masks the taken-down docs, re-delivery " +
      "is idempotent, and the ingest keeps flowing") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = docs.count()
    val (t1, t2) = (n / 2, 3 * n / 4)
    val tmp = java.nio.file.Files.createTempDirectory("substr_delstream")
    try {
      val idx = tmp.resolve("idx").toString
      val rep = tmp.resolve("reports").toString
      Dedup.writeSubstrIndex(docs.filter(col("doc_id") < t1), idx, k = 4)
      val delIn = MemoryStream[Long]
      val delQ = SubstrIngest.startDeletes(
        delIn.toDF().select(col("value").as("doc_id")), idx,
        tmp.resolve("dckpt").toString)
      val in = MemoryStream[DocRow]
      val q = SubstrIngest.startWithReports(in.toDF(), idx, rep,
        tmp.resolve("ckpt").toString)
      try {
        in.addData(docRows(docs.filter(col("doc_id") >= t1
          && col("doc_id") < t2)): _*)
        q.processAllAvailable()
        // the takedown arrives via the delete STREAM, twice (an
        // at-least-once redelivery) — idempotent at read. The dead
        // set includes >= t2 ids whose docs have NOT been ingested
        // yet: the takedown racing its own doc's ingest must neither
        // report that doc nor let same-batch spans flag against it
        val dead = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id")).as[Long].collect().toSeq
        delIn.addData(dead: _*); delQ.processAllAvailable()
        delIn.addData(dead: _*); delQ.processAllAvailable()
        in.addData(docRows(docs.filter(col("doc_id") >= t2)): _*)
        q.processAllAvailable()
      } finally { q.stop(); delQ.stop() }
      // the post-takedown batch reports against the SURVIVOR corpus —
      // pre-ingest-tombstoned batch members excluded on BOTH sides
      val survivors = docs.filter(col("doc_id") % 5 =!= 0)
      val want = Dedup.exactSubstr(survivors, k = 4)
        .filter(col("doc_id") >= t2)
      val got = spark.read.parquet(s"$rep/ingest_batch=1")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "post-takedown streamed report diverges from the survivor " +
          "recompute")
      // the whole feed still indexed; deleted ids keep their docs rows
      assert(spark.read.parquet(s"$idx/${Dedup.SubstrDocsDir}")
        .count() === n)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("a crash between the index-row append and the docs-sibling " +
      "append replays to the exact pre-crash report — the batch's " +
      "own hashes in the index must not read as earlier docs") {
    val n = docs.count()
    val t1 = n / 2
    val tmp = java.nio.file.Files.createTempDirectory("substr_crash")
    try {
      val idx = tmp.resolve("idx").toString
      val rep = tmp.resolve("reports").toString
      Dedup.writeSubstrIndex(docs.filter(col("doc_id") < t1), idx, k = 4)
      val batch = docs.filter(col("doc_id") >= t1)
      // snapshot the pre-batch docs sibling, run the full append, then
      // restore the sibling — leaving EXACTLY the crash state: the
      // batch's (h, min_doc) rows are in the index, its doc ids are not
      val docsDir = new java.io.File(s"$idx/${Dedup.SubstrDocsDir}")
      val saved = tmp.resolve("docs_saved").toFile
      org.apache.commons.io.FileUtils.copyDirectory(docsDir, saved)
      Dedup.appendSubstrIndex(spark, batch, idx)
      org.apache.commons.io.FileUtils.deleteDirectory(docsDir)
      org.apache.commons.io.FileUtils.copyDirectory(saved, docsDir)
      // the replay must recompute the identical report: every span
      // judged against the PRE-batch corpus plus within-batch earlier
      // docs, never against the batch's own leaked index rows
      SubstrIngest.reportAndIngestBatch(batch, 0L, idx, rep)
      val got = spark.read.parquet(s"$rep/ingest_batch=0")
      val want = Dedup.exactSubstr(docs, k = 4)
        .join(batch.select(col("doc_id")), Seq("doc_id"), "left_semi")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "replayed report diverged — leaked index rows read as dups")
      // and the sanity canary: at least one batch doc must be fully
      // clean; a doc marked 100% duplicated across the board is the
      // old bug's signature
      assert(got.filter(col("n_spans") === 0).count() > 0L)
      // the replay completed the append: docs sibling is whole again
      assert(spark.read.parquet(s"$idx/${Dedup.SubstrDocsDir}")
        .count() === n)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }
}
