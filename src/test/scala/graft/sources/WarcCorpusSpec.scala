package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC record ingestion: header-delimited split + structural
  * validation, with malformed records quarantined raw (the JsonlCorpus
  * discipline for the crawl wire format).
  */
class WarcCorpusSpec extends SparkSpec {

  private def rec(id: String, uri: String, body: String,
      clen: Option[Long] = None): String =
    "WARC/1.0\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${clen.getOrElse(body.getBytes("UTF-8").length.toLong)}\r\n" +
      "\r\n" + body + "\r\n\r\n"

  test("a real-shaped WARC file parses: leading header, uuid ids, " +
      "multi-record; every structural break quarantines raw instead " +
      "of corrupting neighbors — truncated payload, missing blank " +
      "line, and a payload containing the record header itself") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc")
    try {
      val f = tmp.resolve("crawl.warc").toString
      val good1 = rec("urn:uuid:aa-11", "http://x/1", "hello crawl world")
      val good2 = rec("urn:uuid:bb-22", "http://x/2", "second body")
      // newline-terminated payloads (most HTML/HTTP bodies): the
      // byte-exact extractor (r15 advice, medium) must keep the
      // payload's own trailing CR/LF and validate only the record
      // terminator — the old strip-trailing-CRLF rule falsely
      // quarantined both of these
      val goodNl = rec("urn:uuid:nl-66", "http://x/6", "html body\n")
      val goodCrlf = rec("urn:uuid:nl-77", "http://x/7", "chunk\r\n")
      // truncated payload: declared length exceeds the actual bytes
      val shortPay = rec("urn:uuid:cc-33", "http://x/3", "tiny",
        clen = Some(400L))
      // no blank line separating headers from payload
      val noBlank = "WARC/1.0\r\nWARC-Record-ID: urn:uuid:dd-44\r\n" +
        "WARC-Type: response\r\nWARC-Target-URI: http://x/4\r\n" +
        "Content-Length: 4\r\nbody"
      // delimiter collision: a payload embedding the record header —
      // the split cuts it into fragments; Content-Length validation
      // must quarantine BOTH halves, never silently mis-assign bytes
      val collide = rec("urn:uuid:ee-55", "http://x/5",
        "evil WARC/1.0\r\npayload bytes")
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (good1 + good2 + goodNl + goodCrlf + shortPay + noBlank +
          collide).getBytes("UTF-8"))
      val read = WarcCorpus.readQuarantined(spark, f)
      val good = WarcCorpus.goodRecords(read)
        .select("record_id", "target_uri", "content_length", "payload")
        .as[(String, String, Long, String)].collect().toSet
      assert(good === Set(
        ("urn:uuid:aa-11", "http://x/1", 17L, "hello crawl world"),
        ("urn:uuid:bb-22", "http://x/2", 11L, "second body"),
        ("urn:uuid:nl-66", "http://x/6", 10L, "html body\n"),
        ("urn:uuid:nl-77", "http://x/7", 7L, "chunk\r\n")),
        "well-formed records must round-trip exactly, trailing " +
          "payload newlines included")
      val rej = WarcCorpus.rejects(read).as[String].collect()
      // shortPay, noBlank, and BOTH collision fragments quarantine
      assert(rej.length === 4,
        s"every broken record must quarantine, got ${rej.toSeq}")
      assert(rej.exists(_.contains("urn:uuid:cc-33")) &&
        rej.exists(_.contains("urn:uuid:dd-44")) &&
        rej.exists(_.contains("urn:uuid:ee-55")) &&
        rej.exists(_.contains("payload bytes")),
        "quarantine rows must hold the raw record text for replay")
      // nothing dropped, nothing invented
      assert(good.size + rej.length ===
        read.filter(lit(true)).collect().length)
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  private def gzBytes(content: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  test("file-level dead-letter (r15 verdict item 2): a truncated " +
      ".warc.gz member or a non-WARC file dead-letters to the " +
      "file-rejects table while good files' records all parse — the " +
      "stock read dies on the same directory") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_gate")
    try {
      val dir = tmp.resolve("feed").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir))
      val rejects = tmp.resolve("file_rejects").toString
      // a good PLAIN file and a good GZIP member — both must serve
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/good.warc"),
        (rec("urn:uuid:aa-11", "http://x/1", "plain body") +
          rec("urn:uuid:ab-12", "http://x/2", "second\n")).getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/good.warc.gz"),
        gzBytes(rec("urn:uuid:gz-33", "http://x/3", "gzipped body")))
      // a TRUNCATED member: valid gzip bytes cut mid-stream — the
      // died-upload shape; only fails mid-decompression
      val full = gzBytes((1 to 300)
        .map(i => rec(s"urn:uuid:t-$i", s"http://x/t$i",
          s"record number $i with some body text")).mkString)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/truncated.warc.gz"),
        full.take(full.length / 2))
      // a non-WARC file: readable bytes, wrong magic — without the
      // file gate every fragment would flood the RECORD quarantine
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/notwarc.warc"),
        "this is not a web archive at all\n".getBytes("UTF-8"))
      // the hazard is real: the stock read dies on the truncated member
      intercept[org.apache.spark.SparkException] {
        WarcCorpus.readQuarantined(spark, dir).collect()
      }
      // the checked read survives: bad FILES dead-letter, good files'
      // records all parse (record-level quarantine still applies)
      val read = WarcCorpus.readQuarantinedChecked(spark, dir, rejects)
      val good = WarcCorpus.goodRecords(read)
        .select("record_id", "payload").as[(String, String)]
        .collect().toSet
      assert(good === Set(
        ("urn:uuid:aa-11", "plain body"), ("urn:uuid:ab-12", "second\n"),
        ("urn:uuid:gz-33", "gzipped body")),
        "every record of every readable file must parse")
      assert(WarcCorpus.rejects(read).isEmpty,
        "no record-level quarantine on these well-formed files")
      val fr = spark.read.parquet(rejects)
        .select("file", "err").as[(String, String)].collect()
      assert(fr.map(_._1).toSet === Set(
        s"file:$dir/truncated.warc.gz", s"file:$dir/notwarc.warc"),
        s"both bad files must land in the rejects table, got " +
          fr.mkString(", "))
      assert(fr.forall(_._2 != null))
      // re-read absorbs: identical evidence does not duplicate
      WarcCorpus.readQuarantinedChecked(spark, dir, rejects).collect()
      assert(spark.read.parquet(rejects).count() === 2)
      // the landing-zone sweep: survivors feed the stream source,
      // bad files quarantine physically
      val landing = tmp.resolve("landing").toString
      val feed2 = tmp.resolve("streamfeed").toString
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(landing))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/ok.warc"),
        rec("urn:uuid:lz-77", "http://x/7", "landing body")
          .getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/cut.warc.gz"),
        full.take(full.length / 3))
      assert(WarcCorpus.admitFiles(spark, landing, feed2, rejects)
        === ((1L, 1L)))
      assert(new java.io.File(s"$feed2/ok.warc").exists &&
        new java.io.File(s"$rejects/_files/cut.warc.gz").exists,
        "survivors move to the feed, bad files under the rejects table")
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }
}
