package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** JSONL ingestion with malformed-line quarantine: good lines parse
  * against the schema, bad lines survive with their RAW text (the
  * replayable dead-letter), and neither FAILFAST's job-kill nor
  * DROPMALFORMED's silent shrink can happen.
  */
class JsonlCorpusSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("source", StringType)
    .add("text", StringType)

  test("malformed lines quarantine with their raw text; good lines " +
      "round-trip field-exactly; counts reconcile to the input") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl")
    try {
      val path = tmp.resolve("corpus").toString
      val docs = Seq(
        (1L, "web", "alpha beta"),
        (2L, "web", "gamma \"quoted\" delta\nwith newline"),
        (3L, "book", "epsilon"),
        (4L, "book", "zeta eta"))
        .toDF("doc_id", "source", "text")
      // lines 2 and 4 truncated (closing brace cut) — malformed JSON
      docs.select(
          to_json(struct(col("doc_id"), col("source"), col("text")))
            .as("l"), col("doc_id"))
        .select(when(col("doc_id") % 2 === 0,
            expr("substring(l, 1, length(l) - 1)"))
          .otherwise(col("l")).as("value"))
        .write.mode("overwrite").text(path)
      val read = JsonlCorpus.readQuarantined(spark, path, schema)
      val good = JsonlCorpus.goodRows(read)
        .as[(Long, String, String)].collect().toSet
      assert(good === Set((1L, "web", "alpha beta"),
        (3L, "book", "epsilon")),
        "good rows must round-trip field-exactly (escapes included)")
      val rej = JsonlCorpus.rejects(read).as[String].collect().toSet
      assert(rej.size === 2, "both truncated lines must quarantine")
      assert(rej.forall(l => l.startsWith("{\"doc_id\":")
        && !l.endsWith("}")),
        "quarantine rows must hold the RAW malformed line")
      // nothing dropped, nothing invented
      assert(good.size + rej.size === 4)
      // reserved-name guard
      val e = intercept[IllegalArgumentException] {
        JsonlCorpus.readQuarantined(spark, path,
          schema.add(JsonlCorpus.CorruptCol, StringType))
      }
      assert(e.getMessage.contains(JsonlCorpus.CorruptCol))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("a quarantined row is ALL-null in its schema fields even when " +
      "the parser could salvage some (r14 advice: partial results " +
      "must not leak half-parsed data past the contract)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_pr")
    try {
      val path = tmp.resolve("corpus").toString
      // a TYPE-mismatch malformation: doc_id is a string — exactly the
      // shape Spark's enablePartialResults can half-parse (source and
      // text salvageable); the quarantine contract demands all-null
      java.nio.file.Files.write(java.nio.file.Paths.get(path + ".d"),
        ("""{"doc_id":"oops","source":"web","text":"alpha"}""" + "\n" +
          """{"doc_id":7,"source":"web","text":"beta"}""" + "\n")
          .getBytes("UTF-8"))
      val read = JsonlCorpus.readQuarantined(spark, path + ".d", schema)
      // collect (all columns) rather than count: a corrupt-col-only
      // plan is the documented reader restriction
      val quarantined = read
        .filter(col(JsonlCorpus.CorruptCol).isNotNull).collect()
      assert(quarantined.length === 1)
      val r = quarantined(0)
      assert(r.isNullAt(r.fieldIndex("doc_id"))
        && r.isNullAt(r.fieldIndex("source"))
        && r.isNullAt(r.fieldIndex("text")),
        "schema fields must be null on a quarantine row whatever the " +
          "parser salvaged")
      assert(JsonlCorpus.goodRows(read).as[(Long, String, String)]
        .collect().toSeq === Seq((7L, "web", "beta")))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  private def gzBytes(lines: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(lines.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  test("gzip inputs: the line quarantine works through compression, " +
      "and an unreadable FILE (truncated or garbled member) " +
      "dead-letters to the file-rejects table instead of killing " +
      "the read") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_gz")
    try {
      val dir = tmp.resolve("feed").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir))
      val rejects = tmp.resolve("file_rejects").toString
      def jline(id: Long, text: String): String =
        s"""{"doc_id":$id,"source":"web","text":"$text"}"""
      // a GOOD member: one parseable line + one truncated LINE (the
      // line-level quarantine must still fire through the codec)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/good.jsonl.gz"),
        gzBytes(jline(1L, "alpha") + "\n" +
          jline(2L, "beta").dropRight(1) + "\n"))
      // a TRUNCATED member: valid gzip bytes cut mid-stream — the
      // shape a died upload leaves; fails only mid-decompression
      val full = gzBytes((3L to 400L)
        .map(i => jline(i, s"doc number $i with some body text"))
        .mkString("", "\n", "\n"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/truncated.jsonl.gz"),
        full.take(full.length / 2))
      // a GARBLED member: .gz extension, junk bytes — fails at the
      // codec header (the open-error path; a permission error takes
      // the same catch)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/garbage.jsonl.gz"),
        Array.tabulate[Byte](64)(i => (i * 7 + 1).toByte))
      // the hazard is real: the stock read dies on the bad files
      intercept[org.apache.spark.SparkException] {
        JsonlCorpus.goodRows(
          JsonlCorpus.readQuarantined(spark, dir, schema)).collect()
      }
      // the checked read survives: bad FILES dead-letter, the good
      // member's rows flow with line-level quarantine intact
      val read = JsonlCorpus.readQuarantinedChecked(spark, dir, schema,
        rejects)
      assert(JsonlCorpus.goodRows(read).as[(Long, String, String)]
        .collect().toSeq === Seq((1L, "web", "alpha")))
      assert(JsonlCorpus.rejects(read).collect().length === 1,
        "the truncated LINE inside the good member must quarantine")
      val fr = spark.read.parquet(rejects)
        .select("file", "err").as[(String, String)].collect()
      assert(fr.map(_._1).toSet
        === Set(s"file:$dir/truncated.jsonl.gz",
          s"file:$dir/garbage.jsonl.gz"),
        s"both unreadable files must land in the rejects table, got " +
          fr.mkString(", "))
      assert(fr.forall(_._2 != null),
        "each file reject must carry its error")
      // all files bad → empty frame in the reader's schema, not a
      // failure (evidence stays in the table)
      val allBad = tmp.resolve("allbad").toString
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(allBad))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$allBad/junk.jsonl.gz"),
        Array.tabulate[Byte](32)(_.toByte))
      val empty = JsonlCorpus.readQuarantinedChecked(spark, allBad,
        schema, rejects)
      assert(empty.isEmpty && empty.columns.contains("doc_id"))
      // r15 advice: the reserved-name refusal is hoisted above the
      // branch — with every file bad it must still fail LOUDLY, not
      // return a duplicate-column empty frame
      val e = intercept[IllegalArgumentException] {
        JsonlCorpus.readQuarantinedChecked(spark, allBad,
          schema.add(JsonlCorpus.CorruptCol, StringType), rejects)
      }
      assert(e.getMessage.contains(JsonlCorpus.CorruptCol))
      // r15 advice: re-reading the same directory must not grow the
      // rejects table — identical (file, err) evidence absorbs
      val before = spark.read.parquet(rejects).count()
      JsonlCorpus.readQuarantinedChecked(spark, dir, schema, rejects)
        .collect()
      JsonlCorpus.readQuarantinedChecked(spark, allBad, schema, rejects)
        .collect()
      assert(spark.read.parquet(rejects).count() === before,
        "repeated checked reads must not duplicate reject evidence")
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("admitFiles landing sweep: survivors move to the feed, " +
      "unreadable files quarantine under the rejects table, and the " +
      "sweep is incremental") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_lz")
    try {
      val landing = tmp.resolve("landing").toString
      val feed = tmp.resolve("feed").toString
      val rejects = tmp.resolve("file_rejects").toString
      java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(landing))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/a.jsonl"),
        """{"doc_id":1,"source":"web","text":"alpha"}""".getBytes)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/bad.jsonl.gz"),
        Array.tabulate[Byte](48)(i => (i * 3 + 7).toByte))
      assert(JsonlCorpus.admitFiles(spark, landing, feed, rejects)
        === ((1L, 1L)))
      assert(new java.io.File(s"$feed/a.jsonl").exists,
        "the readable file must move into the feed")
      assert(new java.io.File(s"$rejects/_files/bad.jsonl.gz").exists,
        "the unreadable file must move under the rejects table")
      assert(new java.io.File(landing).listFiles().isEmpty,
        "the landing zone drains")
      // incremental: a second sweep sees only NEW arrivals
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/b.jsonl"),
        """{"doc_id":2,"source":"web","text":"beta"}""".getBytes)
      assert(JsonlCorpus.admitFiles(spark, landing, feed, rejects)
        === ((1L, 0L)))
      assert(spark.read.parquet(rejects).count() === 1,
        "rejects accumulate one row per bad file, no re-probes")
      // the feed now reads clean end to end
      assert(JsonlCorpus.goodRows(JsonlCorpus.readQuarantined(spark,
        feed, schema)).select("doc_id").as[Long].collect().sorted
        .toSeq === Seq(1L, 2L))
      // r15 advice: a name collision in the feed (same filename
      // delivered twice) makes the rename FAIL — the file must be
      // excluded from the admitted count, left in the landing zone,
      // and recorded with a move-failed error, never silently counted
      // admitted while it re-probes forever
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/a.jsonl"),
        """{"doc_id":9,"source":"web","text":"redelivered"}""".getBytes)
      assert(JsonlCorpus.admitFiles(spark, landing, feed, rejects)
        === ((0L, 0L)),
        "a collision-blocked file counts neither admitted nor rejected")
      assert(new java.io.File(s"$landing/a.jsonl").exists,
        "the blocked file stays in the landing zone")
      val moveFailed = spark.read.parquet(rejects)
        .filter(col("err").contains("rename"))
        .select("file").as[String].collect()
      assert(moveFailed.exists(_.endsWith("a.jsonl")),
        "the move failure must be recorded as evidence")
      // and the feed's committed content is untouched
      assert(JsonlCorpus.goodRows(JsonlCorpus.readQuarantined(spark,
        s"$feed/a.jsonl", schema)).select("doc_id").as[Long].collect()
        .toSeq === Seq(1L))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }
}
