package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON ingestion with a malformed-line quarantine —
  * the file-format half of the dead-letter discipline the engine
  * already applies to field-level payloads (q53's rejects frame): a
  * crawl dump at 100 TB always carries truncated/garbled lines, and
  * the three stock behaviors are all wrong for a pipeline — FAILFAST
  * kills a day-long job on one bad line, DROPMALFORMED silently
  * shrinks the corpus (the integrity bug class the reference's legacy
  * stack was rebuilt to escape — ~85% data integrity,
  * `/root/reference/README.md:7`), and default PERMISSIVE without a
  * corrupt column leaves bad lines as all-null rows indistinguishable
  * from legitimately-null data. This reader makes the quarantine
  * explicit: malformed lines survive as rows whose [[CorruptCol]]
  * holds the RAW line (replayable once the producer is fixed), and
  * the well-formed rows parse against the caller's schema.
  *
  * Scale shape: `spark.read.json` with an explicit schema is a
  * map-only scan (no inference pass over the corpus — inference at
  * 100 TB is a full extra read), splittable per line, predicate
  * pushdown on the parsed columns.
  */
object JsonlCorpus {

  /** The quarantine column: holds the raw line iff it failed to
    * parse, null otherwise. Underscore-prefixed like the engine's
    * other internal columns; callers split on `isNotNull`.
    */
  val CorruptCol = "_graft_corrupt"

  /** The all-null-quarantine contract, ENFORCED rather than assumed
    * (r14 advice): Spark's PERMISSIVE parser under
    * `spark.sql.json.enablePartialResults` (default true on 3.4+/4.x)
    * can retain successfully-parsed fields on a corrupt row for some
    * malformation shapes (a field-level type mismatch, not just EOF
    * truncation) — and that conf is a session SQLConf read at parse
    * time, not a per-read option, so a library cannot pin it on the
    * scan. Instead the contract is enforced in the projection: every
    * schema field reads as NULL whenever [[CorruptCol]] is non-null,
    * whatever the parser salvaged. The raw line keeps the full record
    * for replay, so no information is lost — partial results on a
    * quarantined row are exactly the ambiguity (half-parsed data
    * indistinguishable from good data) the quarantine exists to
    * prevent.
    */
  private def allNullQuarantine(df: DataFrame,
      schema: StructType): DataFrame =
    df.select(schema.fields.toIndexedSeq.map(f =>
      when(col(CorruptCol).isNull, col(f.name)).as(f.name))
      :+ col(CorruptCol): _*)

  /** Read `path` as line-delimited JSON against `schema`, quarantining
    * malformed lines instead of failing or dropping them. The
    * returned frame is the union of both worlds: parsed rows
    * (CorruptCol null) and quarantine rows (schema fields null — all
    * of them, see [[allNullQuarantine]] — CorruptCol = the raw line).
    * Spark caveat, handled by contract: a query referencing ONLY the
    * corrupt column is rejected by the parser's pushdown — callers
    * always project at least one schema field alongside it (the gate
    * and [[rejects]] do).
    */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(schema.fields.nonEmpty,
      "need at least one schema field to parse")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not use the reserved quarantine column $CorruptCol")
    allNullQuarantine(spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path), schema)
  }

  /** [[readQuarantined]]'s STREAMING form — the same PERMISSIVE +
    * explicit-corrupt-column contract over a file-stream directory
    * (the JSON source's parser is shared between batch and streaming,
    * so the split semantics cannot drift). The crawl front door:
    * [[graft.streaming.CorpusIngest.startJsonl]] wires it.
    */
  def readStreamQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(schema.fields.nonEmpty,
      "need at least one schema field to parse")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not use the reserved quarantine column $CorruptCol")
    allNullQuarantine(spark.readStream
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path), schema)
  }

  /** The well-formed rows, quarantine column dropped. */
  def goodRows(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: one (raw line) row per malformed input line —
    * the replay feed once the producer is fixed. Spark REFUSES a scan
    * whose only referenced column is the internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    * column pruning would reduce a naive projection to exactly that —
    * so the raw line projects through a coalesce that keeps the
    * schema fields genuinely referenced in the scan (for quarantine
    * rows the corrupt column is non-null, so the fallback never
    * surfaces; a pruning pass cannot remove it).
    */
  def rejects(df: DataFrame): DataFrame = {
    val fields = df.columns.filter(_ != CorruptCol).map(col)
    df.filter(col(CorruptCol).isNotNull)
      .select(coalesce(col(CorruptCol),
        to_json(struct(fields.toIndexedSeq: _*))).as("raw_line"))
  }
}
