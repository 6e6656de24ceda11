package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming corpus prep: quality gate → near-dup suppress →
  * exactly-once corpus append, across real micro-batches and replays.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  // English-looking text long enough to pass a 40-char gate; stopwords
  // drive langId('en')
  private val goodA = "the quick brown fox jumps over the lazy dog and runs far away"
  private val goodB = "a completely different english document that covers spark internals in detail"
  private val goodC = "yet another acceptable document with the required length and the right words"
  private val nonEnglish = "el rapido zorro marron salta sobre el perro perezoso otra vez hoy"
  private val tooShort = "the end"

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streaming ingest gates quality, drops near-dups across " +
      "batches, and appends only novel docs to the corpus") {
    val corpus = tmp("graft_corpus") + "/docs"
    val store = tmp("graft_corpus_store") + "/sigs"
    val ckpt = tmp("graft_corpus_ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = CorpusIngest.start(in.toDF().toDF("doc_id", "text"),
      corpus, store, ckpt, minChars = 40, lang = "en", maxHamming = 1)
    try {
      in.addData((1L, goodA), (2L, goodA), (3L, nonEnglish), (4L, tooShort))
      q.processAllAvailable()
      in.addData((5L, goodA), (6L, goodB))
      q.processAllAvailable()
      val got = spark.read.parquet(corpus)
        .select("doc_id", "ingest_batch")
        .as[(Long, Long)].collect().sorted.toSeq
      // batch 0: 1 survives (2 is a within-batch dup, 3 wrong lang,
      // 4 too short); batch 1: 6 survives (5 dups the store)
      assert(got === Seq((1L, 0L), (6L, 1L)))
    } finally q.stop()
  }

  test("JSONL front door: a raw crawl feed with malformed lines " +
      "streams through the quarantine split — bad lines dead-letter " +
      "with their raw text, good lines gate and append, and the " +
      "stream survives every garbled line") {
    val base = tmp("graft_jsonl_feed")
    val feed = base + "/feed"
    val corpus = base + "/docs"
    val store = base + "/sigs"
    val rejects = base + "/rejects"
    val ckpt = base + "/ckpt"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(feed))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    def jline(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    // file 1: one good doc, one truncated line, one garbage line
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$feed/part1.jsonl"),
      (jline(1L, goodA) + "\n" +
        jline(2L, goodB).dropRight(1) + "\n" +
        "not json at all\n").getBytes("UTF-8"))
    val q = CorpusIngest.startJsonl(spark, feed, schema, corpus,
      store, rejects, ckpt, minChars = 40, lang = "en",
      maxHamming = 1)
    try {
      q.processAllAvailable()
      // file 2 arrives later: a near-dup of doc 1 plus a fresh doc
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$feed/part2.jsonl"),
        (jline(5L, goodA) + "\n" + jline(6L, goodC) + "\n")
          .getBytes("UTF-8"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 6L),
      "good lines must gate and dedup exactly as the parquet stream")
    val rej = spark.read.parquet(rejects)
      .select("raw_line").as[String].collect().toSet
    assert(rej === Set(jline(2L, goodB).dropRight(1),
      "not json at all"),
      "every malformed line must dead-letter with its raw text")
  }

  test("WARC front door: crawl records stream through the header " +
      "split — broken records dead-letter raw, well-formed payloads " +
      "gate, dedup, and land in the committed corpus") {
    val base = tmp("graft_warc_feed")
    val feed = base + "/feed"
    val corpus = base + "/docs"
    val store = base + "/sigs"
    val rejects = base + "/rejects"
    val ckpt = base + "/ckpt"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(feed))
    def rec(id: String, body: String, clen: Option[Long] = None): String =
      "WARC/1.0\r\n" +
        s"WARC-Record-ID: urn:uuid:$id\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: http://x/$id\r\n" +
        s"Content-Length: ${clen.getOrElse(body.getBytes("UTF-8").length.toLong)}\r\n" +
        "\r\n" + body + "\r\n\r\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$feed/a.warc"),
      (rec("a1", goodA) + rec("broken", goodB, clen = Some(999L)) +
        rec("b1", goodB)).getBytes("UTF-8"))
    val q = CorpusIngest.startWarc(spark, feed, corpus, store,
      rejects, ckpt, minChars = 40, lang = "en", maxHamming = 1)
    try {
      q.processAllAvailable()
      // a later file: a near-dup of a1's body (suppressed) + fresh doc
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$feed/b.warc"),
        (rec("a2", goodA) + rec("c1", goodC)).getBytes("UTF-8"))
      q.processAllAvailable()
      assert(q.isActive, "the stream must survive the broken record")
    } finally q.stop()
    val got = spark.read.parquet(corpus)
      .select("text").as[String].collect().toSet
    assert(got === Set(goodA, goodB, goodC),
      "well-formed payloads must gate and dedup into the corpus")
    val rej = spark.read.parquet(rejects)
      .select("raw_record").as[String].collect()
    assert(rej.length === 1 && rej(0).contains("urn:uuid:broken"),
      "the broken record must dead-letter with its raw text")
  }

  test("checked JSONL topology: the landing-zone sweep keeps " +
      "unreadable FILES out of the stream source's sight — the " +
      "stream survives, bad files dead-letter, good files' rows all " +
      "ingest") {
    val base = tmp("graft_jsonl_checked")
    val landing = base + "/landing"
    val feed = base + "/feed"
    val fileRejects = base + "/file_rejects"
    val corpus = base + "/docs"
    val store = base + "/sigs"
    val rejects = base + "/rejects"
    val ckpt = base + "/ckpt"
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(landing))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    def jline(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    // the landing zone holds a good plain file, a good gz member, a
    // TRUNCATED gz member, and a garbled gz — the two bad FILES would
    // fatally kill a file-stream source that discovered them
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/a.jsonl"),
      (jline(1L, goodA) + "\n").getBytes("UTF-8"))
    def gz(lines: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(lines.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/b.jsonl.gz"),
      gz(jline(2L, goodB) + "\n"))
    val full = gz((10L to 300L)
      .map(i => jline(i, goodC + s" number $i")).mkString("\n"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/trunc.jsonl.gz"),
      full.take(full.length / 2))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/garbage.jsonl.gz"),
      Array.tabulate[Byte](64)(i => (i * 5 + 3).toByte))
    // sweep, then stream the admitted feed
    assert(graft.sources.JsonlCorpus.admitFiles(spark, landing, feed,
      fileRejects) === ((2L, 2L)))
    val q = CorpusIngest.startJsonl(spark, feed, schema, corpus,
      store, rejects, ckpt, minChars = 40, lang = "en",
      maxHamming = 1)
    try {
      q.processAllAvailable()
      // a later cycle delivers another good file through the sweep
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/c.jsonl"),
        (jline(3L, goodC) + "\n").getBytes("UTF-8"))
      assert(graft.sources.JsonlCorpus.admitFiles(spark, landing,
        feed, fileRejects) === ((1L, 0L)))
      q.processAllAvailable()
      assert(q.isActive, "the stream must survive the bad files")
    } finally q.stop()
    assert(spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L),
      "every good file's rows must ingest")
    val fr = spark.read.parquet(fileRejects)
      .select("file").as[String].collect().toSet
    assert(fr.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Set("trunc.jsonl.gz", "garbage.jsonl.gz"),
      "both unreadable files must land in the file-rejects table")
  }

  test("checked WARC topology (r15 verdict item 2, end to end): the " +
      "landing-zone sweep keeps a truncated .warc.gz out of the " +
      "stream source's sight — the stream survives, the bad file " +
      "dead-letters, good files' records all ingest") {
    val base = tmp("graft_warc_checked")
    val landing = base + "/landing"
    val feed = base + "/feed"
    val fileRejects = base + "/file_rejects"
    val corpus = base + "/docs"
    val store = base + "/sigs"
    val rejects = base + "/rejects"
    val ckpt = base + "/ckpt"
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(landing))
    def rec(id: String, body: String): String =
      "WARC/1.0\r\n" +
        s"WARC-Record-ID: urn:uuid:$id\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: http://x/$id\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n" +
        "\r\n" + body + "\r\n\r\n"
    def gz(content: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(content.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/a.warc"),
      rec("a1", goodA).getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/b.warc.gz"),
      gz(rec("b1", goodB)))
    val full = gz((1 to 300)
      .map(i => rec(s"t$i", goodC + s" number $i")).mkString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$landing/trunc.warc.gz"),
      full.take(full.length / 2))
    // sweep, then stream the admitted feed
    assert(graft.sources.WarcCorpus.admitFiles(spark, landing, feed,
      fileRejects) === ((2L, 1L)))
    val q = CorpusIngest.startWarc(spark, feed, corpus, store,
      rejects, ckpt, minChars = 40, lang = "en", maxHamming = 1)
    try {
      q.processAllAvailable()
      // a later crawl cycle delivers another good file via the sweep
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/c.warc"),
        rec("c1", goodC).getBytes("UTF-8"))
      assert(graft.sources.WarcCorpus.admitFiles(spark, landing,
        feed, fileRejects) === ((1L, 0L)))
      q.processAllAvailable()
      assert(q.isActive, "the stream must survive the bad file")
    } finally q.stop()
    assert(spark.read.parquet(corpus)
      .select("text").as[String].collect().toSet
      === Set(goodA, goodB, goodC),
      "every good file's records must ingest, gzip included")
    val fr = spark.read.parquet(fileRejects)
      .select("file").as[String].collect().toSet
    assert(fr.map(f => f.substring(f.lastIndexOf('/') + 1))
      === Set("trunc.warc.gz"),
      "the truncated member must land in the file-rejects table")
  }

  test("replaying a batch neither loses docs nor duplicates the corpus") {
    val corpus = tmp("graft_replay_corpus") + "/docs"
    val store = tmp("graft_replay_store") + "/sigs"
    val batch = Seq((1L, goodA), (2L, goodB)).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(batch, 0L, corpus, store,
      minChars = 40, lang = "en", maxHamming = 1)
    // crash-after-commit replay of the same batch id
    CorpusIngest.ingestBatch(batch, 0L, corpus, store,
      minChars = 40, lang = "en", maxHamming = 1)
    val rows = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rows === Seq(1L, 2L), "replay must not duplicate or drop")
    // and a later batch still dedups against the store
    CorpusIngest.ingestBatch(Seq((3L, goodA)).toDF("doc_id", "text"),
      1L, corpus, store, minChars = 40, lang = "en", maxHamming = 1)
    assert(spark.read.parquet(corpus)
      .filter(col("ingest_batch") === 1L).count() === 0)
    CorpusIngest.ingestBatch(Seq((4L, goodC)).toDF("doc_id", "text"),
      2L, corpus, store, minChars = 40, lang = "en", maxHamming = 1)
    assert(spark.read.parquet(corpus)
      .filter(col("ingest_batch") === 2L).count() === 1)
  }

  test("a recycled batch id with different content fails loudly " +
      "instead of silently dropping the new documents") {
    val corpus = tmp("graft_recycle_corpus") + "/docs"
    val store = tmp("graft_recycle_store") + "/sigs"
    CorpusIngest.ingestBatch(Seq((1L, goodA)).toDF("doc_id", "text"),
      0L, corpus, store, minChars = 40, lang = "en", maxHamming = 1)
    // checkpoint reset: batch numbering restarts at 0 with NEW content
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.ingestBatch(Seq((9L, goodB)).toDF("doc_id", "text"),
        0L, corpus, store, minChars = 40, lang = "en", maxHamming = 1)
    }
    assert(e.getMessage.contains("recycled"))
  }
}
