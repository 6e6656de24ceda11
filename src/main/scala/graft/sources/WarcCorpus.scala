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
    */
  private def parsed(raw: DataFrame): DataFrame = {
    val blankAt = instr(col("value"), "\r\n\r\n")
    val rows = raw
      .filter(length(trim(col("value"))) > 0)
      .withColumn("_hdr",
        when(blankAt > 0, substring_index(col("value"), "\r\n\r\n", 1)))
      .withColumn("_payload",
        when(blankAt > 0, regexp_replace(
          expr("substring(value, instr(value, '\r\n\r\n') + 4)"),
          "[\\r\\n]+$", "")))
      .withColumn("_clen",
        nullif(regexp_extract(col("_hdr"), "Content-Length: ([0-9]+)",
          1), lit("")).cast("long"))
    val ok = Required.map(n => header(n).isNotNull)
      .reduce(_ && _) && col("_clen").isNotNull &&
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

  /** The well-formed records. */
  def goodRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: one raw-record row per malformed record. */
  def rejects(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .select(coalesce(col(CorruptCol), col("payload")).as("raw_record"))
}
