package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC ingestion with malformed-record quarantine — the raw-crawl
  * front door beside [[JsonlCorpus]] (JSONL covers processed dumps;
  * crawls ship as WARC). Spark-first split: the text source's custom
  * `lineSep` makes the record header the SPLIT DELIMITER, so the scan
  * is the stock distributed line reader (splittable on uncompressed
  * files, one task per gzip member — the same layout note as JSONL)
  * with zero custom input formats; per-record parsing is native
  * column expressions (regexp_extract / instr / octet_length), fully
  * codegen, no UDFs.
  *
  * Quarantine discipline is [[JsonlCorpus]]'s verbatim: a record that
  * fails ANY structural rule (no blank line, missing required header,
  * unparseable or mismatched Content-Length) survives as a row whose
  * [[CorruptCol]] holds the RAW record text — replayable, never
  * dropped, never fatal. This also bounds the header-delimited
  * split's one theoretical hazard: a payload that itself contains the
  * record header bytes splits into fragments that fail validation and
  * QUARANTINE (loud, replayable) instead of corrupting neighbors
  * silently — Content-Length validation is exactly the cross-check
  * the WARC spec provides for.
  *
  * Scope: text-bearing response records decoded as UTF-8 (the corpus
  * ingestion case). Content-Length is validated against the UTF-8
  * byte length of the decoded payload; archival binary payloads
  * belong to a `binaryFile`-based reader, not this one.
  */
object WarcCorpus {

  /** The quarantine column — [[JsonlCorpus.CorruptCol]]'s contract. */
  val CorruptCol: String = JsonlCorpus.CorruptCol

  /** The record header the split keys on (WARC 1.0/1.1 both open
    * records with the version line; 1.1 files would use their own
    * constant — parameterizing is a one-line change when needed).
    */
  val RecordHeader: String = "WARC/1.0\r\n"

  private val Required =
    Seq("WARC-Record-ID", "WARC-Type", "WARC-Target-URI")

  private def header(name: String): Column =
    nullif(regexp_extract(col("_hdr"), name + ": ([^\\r\\n]+)", 1),
      lit(""))

  /** The record-parse projection over a frame of raw record chunks
    * (`value` column) — shared verbatim by the batch and streaming
    * reads so the split semantics cannot drift.
    *
    * Payload extraction is BYTE-EXACT (r15 advice, the medium item):
    * exactly Content-Length bytes are sliced after the blank line
    * (binary `substr` — character substring would miscount multi-byte
    * UTF-8), and the record is well-formed only when what remains
    * after them is exactly the `\r\n\r\n` record terminator the WARC
    * spec mandates. The earlier strip-all-trailing-CR/LF rule could
    * not tell terminator CRLFs from payload bytes, so any legitimate
    * payload ending in a newline (most HTML/HTTP bodies) was falsely
    * quarantined.
    */
  private def parsed(raw: DataFrame): DataFrame = {
    val blankAt = instr(col("value"), "\r\n\r\n")
    val terminator = lit("\r\n\r\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val rows = raw
      .filter(length(trim(col("value"))) > 0)
      .withColumn("_hdr",
        when(blankAt > 0, substring_index(col("value"), "\r\n\r\n", 1)))
      .withColumn("_clen",
        nullif(regexp_extract(col("_hdr"), "Content-Length: ([0-9]+)",
          1), lit("")).cast("long"))
      .withColumn("_bin", col("value").cast("binary"))
      // payload bytes start right after header + "\r\n\r\n" (1-based)
      .withColumn("_pstart", octet_length(col("_hdr")).cast("long") + 5L)
      .withColumn("_payload",
        when(col("_clen").isNotNull,
          col("_bin").substr(col("_pstart"), col("_clen"))
            .cast("string")))
    // ok is never NULL: the header-presence clauses are isNotNull
    // (false, not null, on a missing blank line), and every later
    // clause's operands are non-null once those pass — so a record
    // always lands in exactly one of the two output worlds.
    val ok = Required.map(n => header(n).isNotNull)
      .reduce(_ && _) && col("_clen").isNotNull &&
      // total bytes = header + 4 (blank line) + payload + 4 (record
      // terminator) ⇔ _pstart + _clen + 3 as a 1-based end position
      octet_length(col("_bin")) === col("_pstart") + col("_clen") + 3L &&
      (col("_bin").substr(col("_pstart") + col("_clen"), lit(4L))
        === terminator) &&
      // a Content-Length cutting a multi-byte char mid-sequence
      // re-encodes to a different byte count — malformed, quarantine
      octet_length(col("_payload")) === col("_clen")
    rows.select(
      when(ok, header("WARC-Record-ID")).as("record_id"),
      when(ok, header("WARC-Type")).as("warc_type"),
      when(ok, header("WARC-Target-URI")).as("target_uri"),
      when(ok, col("_clen")).as("content_length"),
      when(ok, col("_payload")).as("payload"),
      when(!ok, col("value")).as(CorruptCol))
  }

  /** Read `path` as WARC records, quarantining malformed records. The
    * returned frame is the union of both worlds: parsed rows
    * (CorruptCol null) and quarantine rows (all record fields null,
    * CorruptCol = the raw record text).
    */
  def readQuarantined(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.option("lineSep", RecordHeader).text(path))

  /** [[readQuarantined]]'s STREAMING form over a file-stream
    * directory — the same parse projection, so batch and stream can
    * never split differently. [[graft.streaming.CorpusIngest
    * .startWarc]] wires it into the gate → near-dup → committed
    * corpus chain.
    */
  def readStreamQuarantined(spark: SparkSession, path: String)
      : DataFrame =
    parsed(spark.readStream.option("lineSep", RecordHeader).text(path))

  // ------------------------------ file-level dead-letter (r15 item 2)

  /** The decoded-stream magic every WARC file must open with (1.0 and
    * 1.1 both — the version digit is not part of the check).
    */
  private val WarcMagic =
    "WARC/".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val warcValidator: String => Option[String] =
    f => JsonlCorpus.validateDecodeThrough(f, WarcMagic,
      "not a WARC file: decoded stream does not open with WARC/")

  /** One (file, ok, err) row per data file under `dir` —
    * [[JsonlCorpus.probeFiles]]'s distributed machinery with the WARC
    * decode-through validator: decompress to EOF (a truncated
    * `.warc.gz` member only fails mid-decompression) and check the
    * record-split magic, so an unreadable or non-WARC file
    * dead-letters instead of killing the scan — records inside
    * readable files stay the record-level quarantine's job.
    */
  def probeFiles(spark: SparkSession, dir: String): DataFrame =
    JsonlCorpus.probeFilesWith(spark, dir, warcValidator)

  /** [[readQuarantined]] with the file-level dead-letter in front
    * (r15 verdict item 2 — the exact hazard
    * [[JsonlCorpus.readQuarantinedChecked]] closed for JSONL): probe
    * every data file, append the unreadable ones (with their errors,
    * deduped) to the `fileRejectsPath` parquet table, and read ONLY
    * the survivors. All files bad → an empty frame in the record
    * schema (the rejects table holds the evidence).
    */
  def readQuarantinedChecked(spark: SparkSession, dir: String,
      fileRejectsPath: String): DataFrame = {
    val good = JsonlCorpus.checkedGoodFiles(spark, dir,
      fileRejectsPath, warcValidator)
    if (good.isEmpty) {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType()
          .add("record_id", StringType).add("warc_type", StringType)
          .add("target_uri", StringType)
          .add("content_length", LongType)
          .add("payload", StringType).add(CorruptCol, StringType))
    } else
      parsed(spark.read.option("lineSep", RecordHeader).text(good: _*))
  }

  /** The landing-zone admission sweep for a WARC file stream —
    * [[JsonlCorpus.admitFiles]]'s machinery with the WARC validator:
    * survivors move into the directory
    * [[graft.streaming.CorpusIngest.startWarc]] watches, unreadable
    * files quarantine under `fileRejectsPath/_files/` with their
    * evidence rows, so the file-stream source (which fatally fails on
    * an unreadable file it has discovered) never sees one.
    */
  def admitFiles(spark: SparkSession, landingDir: String,
      feedDir: String, fileRejectsPath: String): (Long, Long) =
    JsonlCorpus.admitFilesWith(spark, landingDir, feedDir,
      fileRejectsPath, warcValidator)

  /** The well-formed records. */
  def goodRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: one raw-record row per malformed record. */
  def rejects(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .select(coalesce(col(CorruptCol), col("payload")).as("raw_record"))
}
