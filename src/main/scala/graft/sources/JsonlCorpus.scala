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
    * and for COMPRESSED files decode the stream to EOF (a truncated or
    * garbled gzip member only fails mid-decompression — there is no
    * cheaper sound check). Plain text files stop at open+first block:
    * any byte sequence is valid lines for a text reader, so only
    * open/read errors (missing file, permissions, IO) can kill them.
    * Runs inside tasks with a fresh Hadoop Configuration — correct for
    * local/HDFS-default deployments; a deployment with custom FS conf
    * would broadcast its own. Returns None when readable, the error
    * message otherwise.
    */
  private def validateFile(f: String): Option[String] =
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
        conf).getCodec(p)
      val raw = fs.open(p)
      try {
        val buf = new Array[Byte](65536)
        if (codec == null) { raw.read(buf); () }
        else {
          val in = codec.createInputStream(raw)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
        None
      } finally raw.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
    }

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
  def probeFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = listDataFiles(spark, dir)
    if (files.isEmpty)
      Seq.empty[(String, Boolean, String)].toDF("file", "ok", "err")
    else
      spark.sparkContext
        .parallelize(files, math.min(files.size, 32))
        .map { f =>
          val err = validateFile(f)
          (f, err.isEmpty, err.orNull)
        }.toDF("file", "ok", "err")
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
    import spark.implicits._
    val probe = probeFiles(spark, dir).localCheckpoint()
    val bad = probe.filter(!col("ok"))
    if (!bad.isEmpty)
      bad.write.mode("append").parquet(fileRejectsPath)
    val good = probe.filter(col("ok"))
      .select("file").as[String].collect()
    if (good.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[
          org.apache.spark.sql.Row],
        schema.add(CorruptCol, StringType, nullable = true))
    else {
      require(!schema.fieldNames.contains(CorruptCol),
        s"schema may not use the reserved quarantine column $CorruptCol")
      allNullQuarantine(spark.read
        .schema(schema.add(CorruptCol, StringType, nullable = true))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(good.toIndexedSeq: _*), schema)
    }
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
      feedDir: String, fileRejectsPath: String): (Long, Long) = {
    import spark.implicits._
    val probe = probeFiles(spark, landingDir).localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(landingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val feed = new org.apache.hadoop.fs.Path(feedDir)
    fs.mkdirs(feed)
    val quarantineDir =
      new org.apache.hadoop.fs.Path(s"$fileRejectsPath/_files")
    val bad = probe.filter(!col("ok"))
    if (!bad.isEmpty) {
      bad.write.mode("append").parquet(fileRejectsPath)
      fs.mkdirs(quarantineDir)
      bad.select("file").as[String].collect().foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        fs.rename(p,
          new org.apache.hadoop.fs.Path(quarantineDir, p.getName))
        ()
      }
    }
    val good = probe.filter(col("ok")).select("file").as[String].collect()
    good.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      fs.rename(p, new org.apache.hadoop.fs.Path(feed, p.getName))
      ()
    }
    (good.length.toLong, bad.count())
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
