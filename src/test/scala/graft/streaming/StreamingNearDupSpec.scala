package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming near-dup suppression: within-batch dups drop, cross-batch
  * dups drop against the signature store, novel docs flow through.
  */
class StreamingNearDupSpec extends SparkSpec {

  test("near-dups are suppressed within and across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_sig_store").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_sig_ckpt").toString
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    var emitted = Vector.empty[Long]
    // maxHamming=1: short test docs give coarse simhashes, and
    // unrelated 8-word texts can land within hamming 3 by chance —
    // exact copies are hamming 0, which is what this test exercises
    val q = StreamingNearDup.start(docs, store, ckpt, maxHamming = 1,
      (novel, _) => emitted ++= novel.select("doc_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted)
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      val textB = "completely different content about spark catalyst optimizer internals"
      // batch 1: A, exact dup of A (within-batch), B
      in.addData((1L, textA), (2L, textA), (3L, textB))
      q.processAllAvailable()
      // batch 2: another copy of A (cross-batch dup) and novel C
      in.addData((4L, textA),
        (5L, "yet another corpus entry with novel vocabulary entirely"))
      q.processAllAvailable()
      assert(emitted === Vector(1L, 3L, 5L))
    } finally q.stop()
  }

  test("replayed batch re-emits its novel docs instead of losing them " +
      "(at-least-once), and does not double-append the store") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft_sig_replay").toString + "/sigs"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about spark catalyst optimizer internals"
    val batch = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    def emitOf(b: org.apache.spark.sql.DataFrame, id: Long): Seq[Long] = {
      var out = Seq.empty[Long]
      StreamingNearDup.processBatch(b, id, store, 1,
        (novel, _) => out = novel.select("doc_id").as[Long].collect().sorted.toSeq)
      out
    }
    assert(emitOf(batch, 0L) === Seq(1L, 2L))
    // crash-after-append replay: same batchId, signatures already in the
    // store — the batch_id exclusion means it must RE-EMIT (not silently
    // drop everything) and must skip the duplicate append
    assert(emitOf(batch, 0L) === Seq(1L, 2L))
    assert(StreamingNearDup.readStore(spark, store).count() === 2)
    // a genuinely new batch still dedups against the store
    assert(emitOf(Seq((3L, textA)).toDF("doc_id", "text"), 1L) === Seq())
  }

  test("a recycled batch id with the SAME doc ids but different text " +
      "is treated as new content, not a replay (content fingerprint)") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft_sig_recycle").toString + "/sigs"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about spark catalyst optimizer internals"
    val textC = "corrected replacement text with entirely new vocabulary and meaning"
    val textD = "another corrected document body that shares nothing with before"
    var emitted = Seq.empty[Long]
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingNearDup.processBatch(b, id, store, 1,
        (novel, _) => emitted = novel.select("doc_id").as[Long]
          .collect().sorted.toSeq)
    run(Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L))
    // checkpoint reset re-feeds CORRECTED text under the same ids and
    // the same recycled batch id 0 — an id-only fingerprint would
    // misread this as a replay and silently drop both docs
    run(Seq((1L, textC), (2L, textD)).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L), "corrected docs must flow, not drop")
    assert(StreamingNearDup.readStore(spark, store).count() === 4,
      "both generations' signatures must be in the store")
    // and a REAL replay of the second generation still re-emits
    // without appending a third generation
    run(Seq((1L, textC), (2L, textD)).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L))
    assert(StreamingNearDup.readStore(spark, store).count() === 4)
  }

  test("legacy stores without batch_id migrate: old signatures still " +
      "suppress dups, and mixed old/new files read correctly") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft_sig_legacy").toString + "/sigs"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about spark catalyst optimizer internals"
    // a pre-batch_id store: only (doc_id, simhash)
    graft.ml.Dedup.simhash(Seq((1L, textA)).toDF("doc_id", "text"))
      .write.parquet(store)
    var emitted = Seq.empty[Long]
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingNearDup.processBatch(b, id, store, 1,
        (novel, _) => emitted = novel.select("doc_id").as[Long]
          .collect().sorted.toSeq)
    // dup of the legacy doc is suppressed; novel doc passes
    run(Seq((2L, textA), (3L, textB)).toDF("doc_id", "text"), 5L)
    assert(emitted === Seq(3L))
    // the store is now mixed-schema (legacy + batch_id files); legacy
    // rows must read as batch -1, new rows keep batch 5 — a replay of
    // batch 5 still re-emits doc 3 and a NEW batch still sees both
    run(Seq((2L, textA), (3L, textB)).toDF("doc_id", "text"), 5L)
    assert(emitted === Seq(3L), "replay must re-emit, not drop")
    run(Seq((4L, textB)).toDF("doc_id", "text"), 6L)
    assert(emitted === Seq(), "new batch must see the mixed store")
    val bids = StreamingNearDup.readStore(spark, store)
      .select("batch_id").as[Long].collect().sorted.toSeq
    assert(bids === Seq(-1L, 5L))
  }

  test("deleteFromStore: tombstones mask at read, re-delivery is " +
      "idempotent, a tombstone-only store reads empty, null is loud") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft_sig_del").toString + "/sigs"
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about spark catalyst optimizer internals"
    var emitted = Seq.empty[Long]
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingNearDup.processBatch(b, id, store, 1,
        (novel, _) => emitted = novel.select("doc_id").as[Long]
          .collect().sorted.toSeq)
    run(Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L))
    // takedown of doc 1: its sig stops suppressing, so a copy of its
    // text is ADMITTED by the next batch; doc 2's copies stay blocked
    StreamingNearDup.deleteFromStore(spark,
      Seq(1L).toDF("doc_id"), store)
    assert(StreamingNearDup.readStore(spark, store)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
    run(Seq((3L, textA), (4L, textB)).toDF("doc_id", "text"), 1L)
    assert(emitted === Seq(3L),
      "the deleted sig must release, the surviving one must suppress")
    // idempotent re-delete (and deleting an unknown id is a no-op)
    StreamingNearDup.deleteFromStore(spark,
      Seq(1L, 999L).toDF("doc_id"), store)
    assert(StreamingNearDup.readStore(spark, store)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    intercept[Exception] {
      StreamingNearDup.deleteFromStore(spark,
        spark.sql("SELECT CAST(NULL AS BIGINT) AS doc_id"), store)
    }
    // a takedown racing ahead of the FIRST ingest leaves a store dir
    // holding only the tombstone sibling — it must read as empty, not
    // fail schema inference
    val fresh = Files.createTempDirectory("graft_sig_pre").toString + "/sigs"
    StreamingNearDup.deleteFromStore(spark, Seq(7L).toDF("doc_id"), fresh)
    assert(StreamingNearDup.readStore(spark, fresh).isEmpty)
  }

  test("filterNovel with an absent store passes everything distinct " +
      "and returns matching signatures") {
    val spark0 = spark
    import spark0.implicits._
    val batch = Seq((1L, "aa bb cc"), (2L, "dd ee ff")).toDF("doc_id", "text")
    val (novel, sigs) = StreamingNearDup.filterNovel(batch,
      StreamingNearDup.readStore(spark, "/nonexistent/path"), 3)
    assert(novel.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
    assert(sigs.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
  }
}
