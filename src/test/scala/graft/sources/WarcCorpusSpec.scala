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
        (good1 + good2 + shortPay + noBlank + collide).getBytes("UTF-8"))
      val read = WarcCorpus.readQuarantined(spark, f)
      val good = WarcCorpus.goodRecords(read)
        .select("record_id", "target_uri", "content_length", "payload")
        .as[(String, String, Long, String)].collect().toSet
      assert(good === Set(
        ("urn:uuid:aa-11", "http://x/1", 17L, "hello crawl world"),
        ("urn:uuid:bb-22", "http://x/2", 11L, "second body")),
        "well-formed records must round-trip exactly")
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
}
