package graft.ml

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{CorpusIngest, MediaIngest, StreamingNearDup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The unified takedown orchestrator ([[Corpus.takedown]], r14 verdict
  * item 1): one doc_id cascades through the committed corpus table,
  * the near-dup suppression store, and every derived standing index —
  * idempotent under whole-cascade replay, convergent after a crash
  * between steps, and suppression-releasing (a near-copy of the
  * deleted text is admitted by the NEXT ingest, while copies of
  * surviving docs stay suppressed). The ns68 registry gate proves the
  * served-surface semantics against DuckDB at sf0.01; this spec pins
  * the lifecycle edges the oracle cannot see.
  */
class TakedownSpec extends SparkSpec {

  // eight stopword-dense English docs with mutually-distant simhashes
  // (maxHamming = 1 in the ingest, so distinct content is admitted);
  // doc 3 — the takedown target — carries the unique token "zebraqq"
  // and a unique 6-token run for the BM25/substr checks
  private val texts = Map(
    1L -> "the first document is about the catalog of parts and the price of a supply chain in the region",
    2L -> "a second text that covers the orders of the customers and the revenue of the market in a year",
    3L -> "the zebraqq document holds the unique run q1 q2 q3 q4 q5 q6 and that is the content to remove",
    4L -> "a fourth entry on the lineage of the data and the audit of the pipeline that is run in the lake",
    5L -> "the fifth text is a note on the schema of the tables and the keys that join them in the engine",
    6L -> "a sixth document about the streaming of events and the windows of time that group them to a sum",
    7L -> "the seventh entry is on the quality of the text and the language of the corpus that is scored",
    8L -> "an eighth and final text on the export of the batches and the packing of tokens for a training run")

  private def docsDf = {
    val spark0 = spark
    import spark0.implicits._
    texts.toSeq.sortBy(_._1)
      .map { case (id, t) => (id, t, "src", t.length) }
      .toDF("doc_id", "text", "source", "n_chars")
  }

  private def embDf = {
    val spark0 = spark
    import spark0.implicits._
    (1L to 8L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Build the full seven-store fixture under `root`; returns the
    * TakedownTargets naming all of them.
    */
  private def buildStores(root: String): Corpus.TakedownTargets = {
    val docs = docsDf
    val emb = embDf
    val media = Multimodal.mediaTable(docs)
    val corpus = s"$root/corpus"
    val store = s"$root/store"
    CorpusIngest.ingestBatch(docs.select(col("doc_id"), col("text")),
      0L, corpus, store, minChars = 0, lang = "en", maxHamming = 1)
    Retrieval.writeBm25Index(docs, s"$root/bm25", nBuckets = 4)
    Similarity.writeIvfIndex(emb,
      Similarity.seedCentroids(emb, nCells = 2), s"$root/ivf")
    Similarity.writeBinaryIndex(emb, s"$root/bin", dim = 8)
    Multimodal.writePhashIndex(media, s"$root/phash")
    Dedup.writeSubstrIndex(docs, s"$root/substr", k = 4)
    Corpus.TakedownTargets(
      corpusPath = Some(corpus), nearDupStorePath = Some(store),
      bm25Path = Some(s"$root/bm25"), ivfPath = Some(s"$root/ivf"),
      binaryPath = Some(s"$root/bin"), phashPath = Some(s"$root/phash"),
      substrPath = Some(s"$root/substr"))
  }

  /** Assert doc 3 is gone from every serving surface of `t`. */
  private def assertGoneEverywhere(t: Corpus.TakedownTargets): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val emb = embDf
    assert(CorpusIngest.readCorpus(spark, t.corpusPath.get)
      .filter(col("doc_id") === 3L).isEmpty, "corpus read serves doc 3")
    assert(StreamingNearDup.readStore(spark, t.nearDupStorePath.get)
      .filter(col("doc_id") === 3L).isEmpty, "store still holds doc 3")
    val hits = Retrieval.queryBm25Index(spark, t.bm25Path.get,
      Seq((99L, Seq("zebraqq", "document"))).toDF("query_id", "terms"),
      k = 8)
    assert(hits.filter(col("doc_id") === 3L).isEmpty,
      "BM25 serves the deleted doc")
    val ivfHits = Similarity.queryIvfIndex(spark, t.ivfPath.get,
      emb.filter(col("vec_id") =!= 3L),
      Similarity.seedCentroids(emb, nCells = 2), k = 3, probes = 2)
    assert(ivfHits.filter(col("j") === 3L).isEmpty,
      "IVF serves the deleted vec")
    val binHits = Similarity.binaryTopKServed(spark, t.binaryPath.get,
      emb, emb.filter(col("vec_id") =!= 3L).select(col("vec_id")),
      k = 3, refine = 8)
    assert(binHits.filter(col("j") === 3L).isEmpty,
      "binary serves the deleted vec")
    assert(MediaIngest.servedHashes(spark, t.phashPath.get)
      .filter(col("media_id") === 3L).isEmpty,
      "phash serves the deleted media")
    // the unique run only doc 3 held: a new doc repeating it must NOT
    // be flagged (the content died with the takedown)
    val rep = Dedup.exactSubstrIncrement(spark,
      Seq((20L, "q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text"),
      t.substrPath.get)
    assert(rep.filter(col("doc_id") === 20L)
      .head().getAs[Long]("n_spans") === 0L,
      "substr flags spans against taken-down text")
    ()
  }

  test("one takedown call makes the doc unreachable on every surface, " +
      "releases near-dup suppression for its text only, and a full " +
      "replay of the cascade is a no-op") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_takedown").toString
    val t = buildStores(root)
    // non-vacuous: pre-takedown, the doc serves
    assert(!CorpusIngest.readCorpus(spark, t.corpusPath.get)
      .filter(col("doc_id") === 3L).isEmpty)
    assert(!Retrieval.queryBm25Index(spark, t.bm25Path.get,
      Seq((99L, Seq("zebraqq"))).toDF("query_id", "terms"), k = 8)
      .filter(col("doc_id") === 3L).isEmpty,
      "fixture: doc 3 must serve before the takedown")
    assert(Corpus.takedown(spark, Seq(3L).toDF("doc_id"), t) === 7)
    assertGoneEverywhere(t)
    // suppression released for the DELETED text only: a copy of doc 3
    // is admitted by the next ingest, a copy of surviving doc 5 stays
    // suppressed
    CorpusIngest.ingestBatch(
      Seq((9L, texts(3L)), (10L, texts(5L))).toDF("doc_id", "text"),
      1L, t.corpusPath.get, t.nearDupStorePath.get,
      minChars = 0, lang = "en", maxHamming = 1)
    val post = CorpusIngest.readCorpus(spark, t.corpusPath.get)
      .select("doc_id").as[Long].collect().toSet
    assert(post.contains(9L),
      "a near-copy of the taken-down doc was not re-admitted")
    assert(!post.contains(10L),
      "a copy of a SURVIVING doc slipped past the suppression store")
    // whole-cascade replay (the crash-recovery action) is a no-op
    assert(Corpus.takedown(spark, Seq(3L).toDF("doc_id"), t) === 7)
    assertGoneEverywhere(t)
    assert(CorpusIngest.readCorpus(spark, t.corpusPath.get)
      .select("doc_id").as[Long].collect().toSet === post)
    // guards: empty target set and null ids are loud
    intercept[IllegalArgumentException] {
      Corpus.takedown(spark, Seq(3L).toDF("doc_id"),
        Corpus.TakedownTargets())
    }
    intercept[Exception] {
      Corpus.takedown(spark,
        spark.sql("SELECT CAST(NULL AS BIGINT) AS doc_id"), t)
    }
    ()
  }

  test("a crash mid-cascade converges on replay: a prefix of the " +
      "per-store deletes followed by the full takedown reaches the " +
      "same state as an uninterrupted run") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_takedown_cr").toString
    val t = buildStores(root)
    val ids = Seq(3L).toDF("doc_id")
    // the crash: only the first two cascade steps landed (corpus +
    // BM25 tombstones), then the driver died
    CorpusIngest.deleteFromCorpus(spark, ids, t.corpusPath.get)
    Retrieval.deleteBm25Docs(spark, ids, t.bm25Path.get)
    // the partial state is SAFE (masked stores mask, others still
    // serve) — and the documented repair is replaying the whole call
    assert(CorpusIngest.readCorpus(spark, t.corpusPath.get)
      .filter(col("doc_id") === 3L).isEmpty)
    assert(!StreamingNearDup.readStore(spark, t.nearDupStorePath.get)
      .filter(col("doc_id") === 3L).isEmpty,
      "store must still hold the sig — its step never ran")
    assert(Corpus.takedown(spark, ids, t) === 7)
    assertGoneEverywhere(t)
  }

  test("compactCorpus physically reclaims takedowns while PRESERVING " +
      "the BatchCommit replay ledger: markers survive the rewrite, a " +
      "replayed batch id still absorbs instead of resurrecting the " +
      "deleted doc, pre-ingest tombstones keep masking, and a crashed " +
      "apply replays from the committed stage") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_cc").toString
    val corpus = s"$root/docs"
    val store = s"$root/sigs"
    val docs = docsDf.select(col("doc_id"), col("text"))
    val b0 = docs.filter(col("doc_id") <= 4L)
    CorpusIngest.ingestBatch(b0, 0L, corpus, store,
      minChars = 0, lang = "en", maxHamming = 1)
    CorpusIngest.ingestBatch(docs.filter(col("doc_id") > 4L), 1L,
      corpus, store, minChars = 0, lang = "en", maxHamming = 1)
    // takedown of an ingested doc AND a pre-ingest takedown (id 99)
    CorpusIngest.deleteFromCorpus(spark, Seq(3L, 99L).toDF("doc_id"),
      corpus)
    val before = CorpusIngest.readCorpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(CorpusIngest.compactCorpus(spark, corpus) === 1L,
      "exactly the one dirty partition must rewrite")
    // physical: the raw partition no longer holds doc 3
    assert(spark.read.parquet(s"$corpus/ingest_batch=0")
      .filter(col("doc_id") === 3L).isEmpty,
      "the deleted doc's rows survived the rewrite")
    // masked read identical before/after (compaction answer-invisible)
    assert(CorpusIngest.readCorpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet === before)
    // settled tombstone reclaimed, pre-ingest one preserved
    assert(spark.read.parquet(s"$corpus/${CorpusIngest.DeletedDir}")
      .select("doc_id").as[Long].collect().toSet === Set(99L),
      "compaction must reclaim settled tombstones and keep pending")
    // THE invariant: a replay of batch 0 (same id, same original
    // content) absorbs against the preserved markers — it must NOT
    // rewrite the partition and resurrect doc 3
    CorpusIngest.ingestBatch(b0, 0L, corpus, store,
      minChars = 0, lang = "en", maxHamming = 1)
    assert(spark.read.parquet(s"$corpus/ingest_batch=0")
      .filter(col("doc_id") === 3L).isEmpty,
      "a batch replay resurrected the compacted-away doc")
    // and the pre-ingest tombstone masks the doc's eventual arrival
    CorpusIngest.ingestBatch(
      Seq((99L, texts(1L) + " and some novel suffix words here"))
        .toDF("doc_id", "text"),
      2L, corpus, store, minChars = 0, lang = "en", maxHamming = 1)
    assert(CorpusIngest.readCorpus(spark, corpus)
      .filter(col("doc_id") === 99L).isEmpty,
      "a pre-ingest takedown stopped masking after compaction")
    // crashed-apply replay: plant a committed stage whose partition 0
    // rewrite died mid-overwrite (data files gone, survivors only in
    // the stage), then re-enter — the apply must restore from stage
    val fs = new org.apache.hadoop.fs.Path(corpus)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = s"$corpus/${CorpusIngest.CorpusCompactStageDir}"
    spark.read.parquet(s"$corpus/ingest_batch=0")
      .withColumn("ingest_batch", lit(0L))
      .write.partitionBy("ingest_batch").parquet(stage)
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(s"$stage/_GRAFT_PARTS"), "0")
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(
        s"$stage/${StreamingNearDup.TombfilesMarker}"), "")
    graft.sources.Markers.write(fs,
      new org.apache.hadoop.fs.Path(s"$stage/_GRAFT_STAGE_ID"),
      "deadbeef")
    new java.io.File(s"$corpus/ingest_batch=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f => assert(f.delete()) }
    CorpusIngest.compactCorpus(spark, corpus)
    assert(!new java.io.File(stage).exists, "stage must clear")
    assert(CorpusIngest.readCorpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet === before,
      "the crashed apply did not converge to the staged survivors")
  }

  test("compactStore physically reclaims takedowns and keeps the " +
      "replay-absorption ledger: batch_id/batch_sig survive the " +
      "rewrite, suppression still works, pending tombstones persist") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft_cs").toString + "/sigs"
    var emitted = Seq.empty[Long]
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingNearDup.processBatch(b, id, store, 1,
        (novel, _) => emitted = novel.select("doc_id").as[Long]
          .collect().sorted.toSeq)
    run(Seq((1L, texts(1L)), (2L, texts(2L))).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L))
    // takedown of doc 1 + a pre-ingest takedown (id 99)
    StreamingNearDup.deleteFromStore(spark,
      Seq(1L, 99L).toDF("doc_id"), store)
    assert(StreamingNearDup.compactStore(spark, store) === 2L)
    // physical: the raw table no longer holds doc 1's signature
    assert(spark.read.parquet(store)
      .filter(col("doc_id") === 1L).isEmpty,
      "the deleted signature survived the rewrite")
    assert(spark.read.parquet(
        s"$store/${StreamingNearDup.DeletedDir}")
      .select("doc_id").as[Long].collect().toSet === Set(99L),
      "settled tombstones reclaim, pending ones persist")
    // replay-absorption survives the rewrite: the same batch id with
    // the same content must re-emit WITHOUT appending a second
    // generation of signatures
    run(Seq((1L, texts(1L)), (2L, texts(2L))).toDF("doc_id", "text"), 0L)
    assert(emitted === Seq(1L, 2L), "replay must re-emit")
    assert(spark.read.parquet(store).count() === 1L,
      "the replay double-appended after compaction — the " +
        "batch_id/batch_sig ledger did not survive the rewrite")
    // suppression semantics intact: copy of the survivor suppressed,
    // copy of the taken-down text admitted
    run(Seq((7L, texts(2L)), (8L, texts(1L))).toDF("doc_id", "text"), 1L)
    assert(emitted === Seq(8L))
    // re-compaction with no new takedowns: the pending tombstone is
    // still pending (id 99 never arrived) — stays, files consolidated
    assert(StreamingNearDup.compactStore(spark, store) === 1L)
    assert(spark.read.parquet(
        s"$store/${StreamingNearDup.DeletedDir}")
      .select("doc_id").as[Long].collect().toSet === Set(99L))
  }

  test("Maintenance covers the corpus and near-dup store families: " +
      "takedown debt past the threshold fires the sweep, debt " +
      "settles to the pending-only residue") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_maint_cs").toString
    val corpus = s"$root/docs"
    val store = s"$root/sigs"
    CorpusIngest.ingestBatch(docsDf.select(col("doc_id"), col("text")),
      0L, corpus, store, minChars = 0, lang = "en", maxHamming = 1)
    Corpus.takedown(spark, Seq(3L).toDF("doc_id"),
      Corpus.TakedownTargets(corpusPath = Some(corpus),
        nearDupStorePath = Some(store)))
    for (fam <- Seq("corpus", "neardup_store");
         path = if (fam == "corpus") corpus else store) {
      val (d, fired) = Maintenance.maintainIndex(spark, path, fam,
        Maintenance.Thresholds(maxTombstoneIds = 0L))
      assert(fired && d.tombstoneIds === 1L, s"$fam: $d")
      val after = Maintenance.compactionDebt(spark, path, fam)
      assert(after.tombstoneIds === 0L && after.tombstoneFiles === 0L,
        s"$fam debt must settle, got $after")
    }
    assert(CorpusIngest.readCorpus(spark, corpus)
      .filter(col("doc_id") === 3L).isEmpty)
  }

  test("the PQ read path applies the same tombstone table the raw IVF " +
      "serve masks on — a takedown against a PQ index is honored by " +
      "the ADC serve") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_takedown_pq").toString
    val emb = embDf
    val cb = Similarity.fitPqCodebook(emb, nSub = 2, codesPerSub = 4,
      iters = 1)
    Similarity.writeIvfPqIndex(emb,
      Similarity.seedCentroids(emb, nCells = 2), cb, nSub = 2,
      s"$root/pq")
    assert(Corpus.takedown(spark, Seq(3L).toDF("doc_id"),
      Corpus.TakedownTargets(ivfPath = Some(s"$root/pq"))) === 1)
    val hits = Similarity.queryIvfPqIndex(spark, s"$root/pq",
      emb.filter(col("vec_id") =!= 3L), emb, k = 3, refine = 8,
      probes = 2)
    assert(hits.filter(col("j") === 3L).isEmpty,
      "PQ ADC serve returned the taken-down vec")
  }

  test("compliance ledger (r15 verdict item 5): one idempotent row " +
      "per cascade — written LAST so its presence attests the whole " +
      "cascade; replay absorbs, a distinct cascade appends, and a " +
      "crash BEFORE the ledger leaves no row until the repair replay " +
      "completes the cascade") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft_takedown_lg").toString
    val t = buildStores(root)
    val ledger = s"$root/ledger"
    def rows() = spark.read.parquet(ledger)
      .select(col("cascade_sig"), col("n_ids"),
        concat_ws(",", col("stores")).as("stores"),
        concat_ws(",", col("doc_ids")).as("ids"))
      .as[(String, Long, String, String)].collect().toSet
    assert(Corpus.takedown(spark, Seq(3L).toDF("doc_id"), t,
      ledgerPath = Some(ledger)) === 7)
    val first = rows()
    assert(first.size === 1 && first.head._2 === 1L &&
      first.head._3 === "binary,bm25,corpus,ivf,neardup_store,phash,substr"
      && first.head._4 === "3",
      s"one row naming every store hit, got $first")
    // whole-cascade replay (the crash repair) absorbs — no duplicate
    assert(Corpus.takedown(spark, Seq(3L).toDF("doc_id"), t,
      ledgerPath = Some(ledger)) === 7)
    assert(rows() === first, "a replay must not duplicate the ledger")
    // a DISTINCT cascade (different ids) appends its own row
    Corpus.takedown(spark, Seq(5L).toDF("doc_id"), t,
      ledgerPath = Some(ledger))
    assert(rows().size === 2)
    // crash ordering: a cascade that died mid-way (only a prefix of
    // the per-store deletes landed) must have NO ledger row — the
    // audit correctly reads "not durable everywhere" — until the
    // repair replay completes the cascade and appends it
    CorpusIngest.deleteFromCorpus(spark, Seq(6L).toDF("doc_id"),
      t.corpusPath.get)
    Retrieval.deleteBm25Docs(spark, Seq(6L).toDF("doc_id"),
      t.bm25Path.get)
    assert(rows().size === 2,
      "a partial cascade must leave no ledger row")
    Corpus.takedown(spark, Seq(6L).toDF("doc_id"), t,
      ledgerPath = Some(ledger))
    assert(rows().size === 3)
    assertGoneEverywhere(t)
    // r16 session review: same ids against two DIFFERENT stores of
    // the SAME family share a cascade_sig (the sig hashes family
    // names, which is what the oracle can restate) but are distinct
    // audit events — the (sig, target_paths) dedupe key must keep
    // both, and replays of each must still absorb
    val bin2 = s"$root/bin2"
    Similarity.writeBinaryIndex(embDf, bin2, dim = 8)
    val only1 = Corpus.TakedownTargets(binaryPath = t.binaryPath)
    val only2 = Corpus.TakedownTargets(binaryPath = Some(bin2))
    Corpus.takedown(spark, Seq(4L).toDF("doc_id"), only1,
      ledgerPath = Some(ledger))
    Corpus.takedown(spark, Seq(4L).toDF("doc_id"), only2,
      ledgerPath = Some(ledger))
    Corpus.takedown(spark, Seq(4L).toDF("doc_id"), only2,
      ledgerPath = Some(ledger))
    val binRows = spark.read.parquet(ledger)
      .filter(concat_ws(",", col("stores")) === "binary")
      .select(col("cascade_sig"),
        concat_ws(",", col("target_paths")).as("paths"))
      .as[(String, String)].collect()
    assert(binRows.length === 2 &&
      binRows.map(_._1).distinct.length === 1 &&
      binRows.map(_._2).distinct.length === 2,
      s"one row per (sig, paths) cascade, got ${binRows.toSeq}")
  }
}
