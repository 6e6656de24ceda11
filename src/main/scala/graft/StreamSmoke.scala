package graft

/** Standalone streaming-throughput smoke — [[Bench]]'s corpus_ingest
  * measurement without the 200+ timed queries around it, so a
  * round-over-round streaming delta can be classified by the ABAB
  * worktree-pair protocol in minutes instead of full-bench hours
  * (the r13 verdict's item 4: four consecutive declining round
  * medians needed exactly this tool). Both callers run the SAME
  * [[runCorpusIngest]] body — factored, not copied, so the smoke can
  * never drift from what the bench measures (session review).
  * Prints ONE JSON line shaped like Bench's `streaming` field.
  */
object StreamSmoke {

  /** THREE full CorpusIngest runs (gate → near-dup store →
    * partitioned corpus append) over the documents table replayed as
    * a file stream, fresh feed/corpus/store/checkpoint dirs per run —
    * state reuse would turn runs 2-3 into no-op replays. Returns
    * (input rows, per-run seconds); callers take the MIN (the
    * noise-is-additive statistic the query timings use — eight r8
    * runs spanned 630–1375 rows/s with no code change). Cleans its
    * temp tree on every path.
    */
  private[graft] def runCorpusIngest(
      spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : (Long, Seq[Double]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_smoke")
    try {
      val docsPath =
        new java.io.File(sfDir, "documents.parquet").getPath
      val schema = spark.read.parquet(docsPath).schema
      val rowsIn = spark.read.parquet(docsPath).count()
      val secs = (1 to 3).map { i =>
        // the file stream source requires a DIRECTORY (its basePath);
        // stage the single-file table into one — the copy is the feed
        // directory a real deployment would have
        val feedDir = tmp.resolve(s"feed$i")
        java.nio.file.Files.createDirectory(feedDir)
        java.nio.file.Files.copy(java.nio.file.Paths.get(docsPath),
          feedDir.resolve("documents.parquet"))
        val t0 = System.nanoTime()
        val q = graft.streaming.CorpusIngest.start(
          spark.readStream.schema(schema).parquet(feedDir.toString),
          corpusPath = tmp.resolve(s"corpus$i").toString,
          storePath = tmp.resolve(s"store$i").toString,
          checkpoint = tmp.resolve(s"ckpt$i").toString)
        // stop in finally: a micro-batch failure must not leave the
        // query's foreachBatch thread retrying behind the caller
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      (rowsIn, secs)
    } finally {
      // best-effort temp cleanup on every path, success or failure
      try {
        java.nio.file.Files.walk(tmp)
          .sorted(java.util.Comparator
            .reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", "graft-smoke",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (rowsIn, secs) = runCorpusIngest(spark, sfDir)
      val sec = secs.min
      val rps = if (sec > 0) rowsIn / sec else 0.0
      def fmt(p: String, v: Double) =
        String.format(java.util.Locale.ROOT, p, Double.box(v))
      println(s"""{"op":"corpus_ingest","rows_in":$rowsIn,""" +
        s""""sec":${fmt("%.3f", sec)},""" +
        s""""runs":[${secs.map(s => fmt("%.3f", s)).mkString(",")}],""" +
        s""""rows_per_sec":${fmt("%.1f", rps)},"stat":"min_of_3"}""")
    } finally spark.stop()
  }
}
