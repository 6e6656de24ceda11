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

  // ------------------------------------ file-level dead-letter (r14 #2)

  /** The data files a directory read would consume, by the reader's own
    * visibility rule (underscore/dot-prefixed names are hidden). File
    * LISTING is inherently driver-side in Spark's FileIndex — this
    * mirrors that, it does not add a driver bottleneck the stock read
    * doesn't have.
    */
  private def listDataFiles(spark: SparkSession, dir: String)
      : Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath.toString)
  }

  /** Validate one file the way the reader will consume it: open it,
    * optionally check a leading format magic (decode-through for WARC
    * = decompress + the record header the split keys on — r15 verdict
    * item 2's factoring), and for COMPRESSED files decode the stream
    * to EOF (a truncated or garbled gzip member only fails
    * mid-decompression — there is no cheaper sound check). Plain
    * files without a magic stop at open+first block: any byte
    * sequence is valid lines for a text reader, so only open/read
    * errors (missing file, permissions, IO) can kill them. Runs
    * inside tasks with a fresh Hadoop Configuration — correct for
    * local/HDFS-default deployments; a deployment with custom FS conf
    * would broadcast its own. Returns None when readable, the error
    * message otherwise.
    */
  private[sources] def validateDecodeThrough(f: String,
      magic: Array[Byte], magicErr: String): Option[String] =
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
        conf).getCodec(p)
      val raw = fs.open(p)
      try {
        val in: java.io.InputStream =
          if (codec == null) raw else codec.createInputStream(raw)
        try {
          val magicFail =
            if (magic.isEmpty) None
            else {
              // fill exactly |magic| DECODED bytes (short reads legal)
              val head = new Array[Byte](magic.length)
              var got = 0
              var n = in.read(head, got, head.length - got)
              while (n > 0 && got + n < head.length) {
                got += n
                n = in.read(head, got, head.length - got)
              }
              if (n > 0) got += n
              if (got < magic.length ||
                !java.util.Arrays.equals(head, magic)) Some(magicErr)
              else None
            }
          if (magicFail.isDefined) magicFail
          else {
            val buf = new Array[Byte](65536)
            if (codec == null) { in.read(buf); () }
            else while (in.read(buf) >= 0) ()
            None
          }
        } finally in.close()
      } finally raw.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
    }

  /** The JSONL per-file validator: decode-through, no format magic (a
    * JSON line file has none — line-level damage is the line
    * quarantine's job).
    */
  private def validateFile(f: String): Option[String] =
    validateDecodeThrough(f, Array.emptyByteArray, "")

  /** One row per data file under `dir`: (file, ok, err). The probe is
    * DISTRIBUTED (one task per file batch) because compressed files
    * must be decoded through — at 100 TB this is a real second pass
    * over the compressed bytes, and that is the honest price of
    * file-level dead-lettering: Spark's own escape hatch
    * (`ignoreCorruptFiles=true`) silently DROPS the whole file, the
    * exact DROPMALFORMED integrity hazard the line-level quarantine
    * exists to prevent, and a fatal task error kills a day-long job.
    * Deployments that cannot afford the pass run it once in the
    * landing zone ([[admitFiles]]) instead of per read.
    */
  def probeFiles(spark: SparkSession, dir: String): DataFrame =
    probeFilesWith(spark, dir, validateFile)

  /** [[probeFiles]] parameterized on the per-file validator — the
    * piece each front door swaps ([[WarcCorpus.probeFiles]] plugs a
    * decode-through + WARC-magic check into the same machinery).
    */
  private[sources] def probeFilesWith(spark: SparkSession, dir: String,
      validate: String => Option[String]): DataFrame = {
    import spark.implicits._
    val files = listDataFiles(spark, dir)
    if (files.isEmpty)
      Seq.empty[(String, Boolean, String)].toDF("file", "ok", "err")
    else
      spark.sparkContext
        .parallelize(files, math.min(files.size, 32))
        .map { f =>
          val err = validate(f)
          (f, err.isEmpty, err.orNull)
        }.toDF("file", "ok", "err")
  }

  /** Append (file, ok, err) evidence rows, DEDUPED against what the
    * rejects table already holds (r15 advice): without this, every
    * re-read of a directory whose bad file is still in place re-appends
    * identical rows and the evidence grows unboundedly. Key is
    * (file, err) — a path re-observed with a DIFFERENT failure (file
    * replaced, move-failure vs decode-failure) still records, an
    * identical observation absorbs.
    */
  private[sources] def appendFileRejects(spark: SparkSession,
      rows: DataFrame, fileRejectsPath: String): Unit =
    Evidence.appendDeduped(spark, rows, fileRejectsPath,
      Seq("file", "err"))

  /** Probe `dir` with `validate`, record the unreadable files (deduped)
    * in the rejects table, and return the survivors' paths — the
    * shared front half of every checked read.
    */
  private[sources] def checkedGoodFiles(spark: SparkSession, dir: String,
      fileRejectsPath: String, validate: String => Option[String])
      : Seq[String] = {
    import spark.implicits._
    val probe = probeFilesWith(spark, dir, validate).localCheckpoint()
    val bad = probe.filter(!col("ok"))
    if (!bad.isEmpty) appendFileRejects(spark, bad, fileRejectsPath)
    probe.filter(col("ok")).select("file").as[String].collect()
      .toIndexedSeq
  }

  /** [[readQuarantined]] with the file-level dead-letter in front:
    * probe every data file, append the unreadable ones (with their
    * errors) to the `fileRejectsPath` parquet table, and read ONLY the
    * survivors — so a truncated gzip member or an unreadable file can
    * neither kill the job (FAILFAST-at-file-level) nor silently vanish
    * (`ignoreCorruptFiles`). Line-level quarantine still applies to
    * the survivors' contents. All files bad → an empty frame in the
    * reader's schema (the rejects table holds the evidence).
    */
  def readQuarantinedChecked(spark: SparkSession, dir: String,
      schema: StructType, fileRejectsPath: String): DataFrame = {
    // hoisted above the branch (r15 advice): with every file bad, the
    // survivors branch never ran and a reserved-name schema reached
    // `schema.add(CorruptCol, ...)` below — a duplicate-column empty
    // frame instead of this loud refusal
    require(schema.fields.nonEmpty,
      "need at least one schema field to parse")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not use the reserved quarantine column $CorruptCol")
    val good = checkedGoodFiles(spark, dir, fileRejectsPath,
      validateFile)
    if (good.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[
          org.apache.spark.sql.Row],
        schema.add(CorruptCol, StringType, nullable = true))
    else
      allNullQuarantine(spark.read
        .schema(schema.add(CorruptCol, StringType, nullable = true))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(good: _*), schema)
  }

  /** The STREAMING form of the file-level dead-letter: a landing-zone
    * admission sweep. A file stream source fatally fails on an
    * unreadable file it has discovered — there is no per-file recovery
    * once the source owns it — so the checked stream topology keeps
    * bad files out of the source's sight: raw files land in
    * `landingDir`, this sweep probes them, MOVES survivors into
    * `feedDir` (the directory [[graft.streaming.CorpusIngest
    * .startJsonl]] watches), moves unreadable files under
    * `fileRejectsPath/_files/` (underscore-prefixed so a parquet read
    * of the rejects table never descends into raw payloads) and
    * appends their (file, err) evidence to the `fileRejectsPath`
    * table. Idempotent and incremental: each
    * sweep only sees files still in the landing zone; run it per
    * ingest cycle (cron, or the feed deliverer's post-upload hook).
    * Returns (admitted, rejected) counts.
    *
    * 100 TB layout note: a single-member .gz is ONE unsplittable task
    * for the reader — crawl deliverers should target ~128 MB members
    * (or zstd frames); the quarantine semantics are identical either
    * way.
    */
  def admitFiles(spark: SparkSession, landingDir: String,
      feedDir: String, fileRejectsPath: String): (Long, Long) =
    admitFilesWith(spark, landingDir, feedDir, fileRejectsPath,
      validateFile)

  /** [[admitFiles]] parameterized on the per-file validator (shared
    * with [[WarcCorpus.admitFiles]] — r15 verdict item 2). Rename
    * results are CHECKED (r15 advice): a move that fails (name
    * collision in the feed or quarantine dir — the same filename
    * delivered twice) leaves the file in the landing zone, is
    * EXCLUDED from the returned counts, and records a move-failed
    * evidence row — without this the file was counted admitted yet
    * silently re-probed and re-failed on every sweep forever.
    */
  private[sources] def admitFilesWith(spark: SparkSession,
      landingDir: String, feedDir: String, fileRejectsPath: String,
      validate: String => Option[String]): (Long, Long) = {
    import spark.implicits._
    val probe = probeFilesWith(spark, landingDir, validate)
      .localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(landingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val feed = new org.apache.hadoop.fs.Path(feedDir)
    fs.mkdirs(feed)
    val quarantineDir =
      new org.apache.hadoop.fs.Path(s"$fileRejectsPath/_files")
    // no-overwrite move: HDFS rename returns false on an existing
    // destination but the local/posix filesystems silently REPLACE it
    // — an explicit existence check pins the no-clobber semantics on
    // every filesystem (the residual check-to-rename window is the
    // usual directory-table honesty; it shrinks the exposure from
    // "always overwrites" to one race)
    def move(f: String, into: org.apache.hadoop.fs.Path): Boolean = {
      val p = new org.apache.hadoop.fs.Path(f)
      val target = new org.apache.hadoop.fs.Path(into, p.getName)
      !fs.exists(target) && fs.rename(p, target)
    }
    val bad = probe.filter(!col("ok"))
    val movedBad =
      if (bad.isEmpty) Array.empty[(String, Boolean)]
      else {
        appendFileRejects(spark, bad, fileRejectsPath)
        fs.mkdirs(quarantineDir)
        bad.select("file").as[String].collect()
          .map(f => f -> move(f, quarantineDir))
      }
    val movedGood = probe.filter(col("ok")).select("file").as[String]
      .collect().map(f => f -> move(f, feed))
    val moveFailed = (movedBad ++ movedGood).collect {
      case (f, false) => f
    }
    if (moveFailed.nonEmpty)
      appendFileRejects(spark,
        moveFailed.toIndexedSeq
          .map(f => (f, false,
            "rename out of the landing zone failed (name collision " +
              "in the target dir?) — file remains in the landing zone"))
          .toDF("file", "ok", "err"),
        fileRejectsPath)
    (movedGood.count(_._2).toLong, movedBad.count(_._2).toLong)
  }

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
