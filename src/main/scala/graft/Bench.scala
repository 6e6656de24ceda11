package graft
import org.apache.spark.sql.DataFrame
object Bench {

  /** Execute the query's OWN physical plan, not df.count(): count()
    * re-plans as an aggregate, so ColumnPruning deletes every
    * unreferenced projection expression and EliminateSorts drops the
    * final orderBy — a map-only query (langId, redaction, hashing)
    * would benchmark a near-empty scan while its actual operator body
    * never runs. executedPlan.execute() runs the full projection +
    * sort exactly as a consumer would receive it.
    */
  private def runOnce(df: DataFrame): Unit = {
    df.queryExecution.executedPlan.execute().count()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", "graft-bench",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet footer caches, so the
    // first timed query isn't charged ~5s of JVM startup — through the
    // SAME runOnce path as the timed runs, so the primed plan shape is
    // the one actually measured.
    try runOnce(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case scala.util.control.NonFatal(_) => () }
    var failed = List.empty[String]
    // Noise hygiene: this sandbox carries background load, and a single
    // timing after a GC-heavy neighbor query reads 20×+ slow. Each
    // query gets TWO timed runs and reports the MIN — the standard
    // noise-robust wall-clock statistic (noise is strictly additive);
    // with best-of-2 a transient stall can't masquerade as a
    // regression. Runs iterate per-query (not two full passes) so both
    // samples share warm caches.
    val runsPerQuery = 2
    // Dev/scale-probe filter (mirrors Verify's SPARK_GRAFT_ONLY): a
    // comma list restricts the timed set — used by the sfN scaling
    // runs so a 3×-data probe times only the scale-sensitive tier.
    // The driver never sets it, so official rounds always time the
    // full registry; a filtered run also skips the streaming smoke
    // (its number is only tracked on full sf0.1 runs).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Calibration probe (r14 verdict item 3): a FIXED trivial query —
    // one aggregate over an in-memory range, no IO, no data-size
    // dependence — timed interleaved through the run and reported as
    // min/median/max, so a driver-vs-attested divergence
    // self-classifies without worktree archaeology: an inflated
    // calibration band (r14's q2 0.29→4.98 s pattern) says the
    // ENVIRONMENT charged flat per-query surcharges; a calibration
    // band matching the attested run says a slow entry really
    // regressed. Interleaved (not just bracketing) because the r14
    // inflation was spread through the run, not concentrated at the
    // ends.
    val calibTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def calibrate(): Unit = {
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id)").head()
      calibTimes += (System.nanoTime() - t0) / 1e9
      ()
    }
    calibrate() // untimed-warmup twin: prime the probe's own codegen
    calibTimes.clear()
    calibrate()
    var sinceCalib = 0
    // Outlier self-classification (r15 verdict item 7): r15's q46 read
    // 60.4 s driver vs 1.69 s attested with a CLEAN calibration block
    // — the stall fell between probes, so the diagnosis needed a
    // worktree diff. Now any entry whose min-of-2 exceeds 5× its
    // COMMITTED attested sibling (bench_ref.json — the previous
    // round's attested per-entry map; env-overridable) is re-run once
    // with calibration probes immediately before and after, all five
    // numbers recorded under "outliers", and the reported time is the
    // min-of-3 — a transient stall self-classifies in the JSON itself.
    // Entries without a reference (new this round) are skipped.
    val refTimes: Map[String, Double] = try {
      val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_ref.json")
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8)
      val qs = txt.indexOf("\"queries\":{")
      val end = txt.indexOf("}", qs)
      val body = txt.substring(qs + "\"queries\":{".length, end)
      "\"([^\"]+)\":(-?[0-9.]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id)").head()
      (System.nanoTime() - t0) / 1e9
    }
    val outliers =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // keep the sorted Seq (a Map would scramble the printed key order)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      sinceCalib += 1
      if (sinceCalib >= 10) { calibrate(); sinceCalib = 0 }
      val times = (1 to runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { runOnce(fn(spark, sfDir)); true }
          catch { case scala.util.control.NonFatal(_) => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // min over SUCCESSFUL runs only — an exception path returns
      // faster than a real run, so a transient failure would otherwise
      // report a deflated time for a query that actually succeeded.
      // `failed` lists only queries with NO successful run — a query
      // that recovered on retry reports its good time and is not
      // contradictorily flagged failed in the same line.
      val good = times.filter(_._2).map(_._1)
      if (good.isEmpty) failed ::= name
      val min2 = if (good.nonEmpty) good.min else times.map(_._1).min
      val finalT = refTimes.get(name) match {
        case Some(ref) if good.nonEmpty && ref > 0.0 &&
            min2 > 5.0 * ref && min2 > 1.0 =>
          val cb = probeOnce()
          val t0 = System.nanoTime()
          val ok =
            try { runOnce(fn(spark, sfDir)); true }
            catch { case scala.util.control.NonFatal(_) => false }
          val rerun = (System.nanoTime() - t0) / 1e9
          val ca = probeOnce()
          def r4o(v: Double) = String.format(java.util.Locale.ROOT,
            "%.4f", Double.box(v))
          outliers += name -> (s"""{"ref":${r4o(ref)},"min2":${r4o(
            min2)},"rerun":${if (ok) r4o(rerun) else "-1.0"},""" +
            s""""calib_before":${r4o(cb)},"calib_after":${r4o(ca)}}""")
          if (ok) math.min(min2, rerun) else min2
        case _ => min2
      }
      name -> finalT
    }
    // A fully-failed query reports -1.0, never its fast exception
    // time: a deflated "timing" in queries{} would read as a speedup
    // to any consumer that doesn't join against failed[].
    // 4 decimals (0.1ms): full nanosecond precision printed ~18 chars
    // per query and the driver captures only a bounded tail of the one
    // output line — rounding keeps every query visible in it.
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    def r4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) =>
      val shown = if (failed.contains(k)) "-1.0" else r4(v)
      s"\"" + k + "\":" + shown
    }.mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total sums SUCCESSFUL queries only, for the same reason
    val total = results.collect {
      case (k, v) if !failed.contains(k) => v
    }.sum
    // Streaming throughput smoke: one end-to-end CorpusIngest run
    // (gate → near-dup store → partitioned corpus append) over the
    // documents table replayed as a file stream — the streaming path's
    // tracked perf number. rows/sec counts INPUT rows: the operator's
    // job is to gate and dedup, so its denominator is what it ingested,
    // not what survived. Failure reports failed:true, never a number.
    val streaming = if (only.isDefined)
      """{"op":"corpus_ingest","skipped":"filtered_run"}"""
    else {
      try {
        // the measurement body lives ONCE in StreamSmoke (the ABAB
        // classification tool) so the smoke can never drift from what
        // this bench reports — min-of-3 full ingest runs over fresh
        // dirs, the noise-is-additive statistic (see its scaladoc)
        val (rowsIn, secs) = StreamSmoke.runCorpusIngest(spark, sfDir)
        val sec = secs.min
        val rps = if (sec > 0) rowsIn / sec else 0.0
        // Regression floor (BASELINE.md "Engine streaming throughput
        // tracking"): half the last recorded round's rate — r5 measured
        // 1131 rows/s at sf0.1 (r4: 936). The sandbox noise band never
        // cost a run 2×, so floor_ok:false is a real regression, not
        // weather. The floor only applies at the tracked SF; other SFs
        // report it as ok so a sf0.01 smoke doesn't false-alarm.
        val floorRps = 565.0
        val floorOk = !sfDir.endsWith("sf0.1") || rps >= floorRps
        def fmt(p: String, v: Double) =
          String.format(java.util.Locale.ROOT, p, Double.box(v))
        s"""{"op":"corpus_ingest","rows_in":$rowsIn,"sec":${fmt("%.3f", sec)},"rows_per_sec":${fmt("%.1f", rps)},"stat":"min_of_3","floor_rps":$floorRps,"floor_ok":$floorOk}"""
      } catch { case e if scala.util.control.NonFatal(e) =>
        // full JSON escape (not a partial replaceAll): any raw control
        // char in the message would invalidate the ONE output line and
        // lose the whole round's timings, not just this field
        val msg = Verify.jsonQuote(String.valueOf(e.getMessage).take(200))
        s"""{"op":"corpus_ingest","failed":true,"err":$msg}"""
      }
    }
    // Provenance (r7 verdict item 5): round-over-round totals are only
    // comparable when measured against the same registry AND the same
    // generated testdata — r7's 336 s vs r6's 132 s was mostly 11 new
    // entries plus a full testdata regen, which the bench JSON could
    // not attest. registry = hash of the sorted query-name list (+
    // count), data_mtime = newest parquet mtime under the SF dir.
    val registryHash = java.security.MessageDigest.getInstance("MD5")
      .digest(SparkEntry.queries.keys.toSeq.sorted.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    def newestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles())
          .map(_.foldLeft(f.lastModified())(_ max newestMtime(_)))
          .getOrElse(f.lastModified())
      else f.lastModified()
    val dataMtime =
      try newestMtime(new java.io.File(sfDir)) / 1000L
      catch { case scala.util.control.NonFatal(_) => 0L }
    val prov = s""""registry_n":${SparkEntry.queries.size},"registry":"$registryHash","data_mtime":$dataMtime"""
    // Per-entry gate map (r8 verdict item 7): "oracle" = driver-hash-
    // gated DuckDB SQL exists; anything else carries its declared
    // rows-only gate from SparkEntry.rowsOnlyGate (RegistryGuardSpec
    // pins that the two exactly partition the registry). Emitted only
    // in the FULL line/file — the compact tail-safe line stays short.
    val gates = results.map { case (k, _) =>
      val g = if (SparkEntry.oracleSql.contains(k)) "oracle"
        else SparkEntry.rowsOnlyGate.getOrElse(k, "UNDECLARED")
      s"\"" + k + "\":\"" + g + "\""
    }.mkString("{", ",", "}")
    // Per-entry evidence counters (r9 verdict item 6): untimed probes
    // making data-dependent scale caveats measurable — e.g. q82's
    // A-priori candidates_pruned, 0 on this fixture by measurement
    // rather than by prose. Failures report {"failed":1}, never kill
    // the line.
    val observed = SparkEntry.evidence.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(_.contains(name)) && results.exists(_._1 == name) }
      .map { case (name, fn) =>
        val m =
          try fn(spark, sfDir)
          // NonFatal only: an OOM/interrupt must kill the run, not be
          // recorded as a probe hiccup (r10 advice)
          catch { case scala.util.control.NonFatal(_) =>
            Map("failed" -> 1L) }
        "\"" + name + "\":" + m.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    // the trailing calibration sample closes the bracket around the
    // whole timed run
    calibrate()
    val cs = calibTimes.sorted.toIndexedSeq
    val calib = s""""calibration":{"probe":"range1M_sum","n":${cs.length},"min":${r4(cs.head)},"median":${r4(cs(cs.length / 2))},"max":${r4(cs.last)}}"""
    val outliersJson = "\"outliers\":" + outliers
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline fields LAST: the driver's capture keeps the tail of
    // this (long) line, so the per-query map is what truncation may
    // cost, never the totals / streaming floor / failure list
    val full = s"""{"metric":"total","unit":"sec","queries":$qs,"gates":$gates,"observed":$observed,"failed":$fs,"streaming":$streaming,"sf":"$sfDir",$prov,$calib,$outliersJson,"stat":"min_of_$runsPerQuery","value":${r4(total)}}"""
    println(full)
    // The driver keeps only the LAST ~2000 output chars, and the full
    // line above outgrew that long ago — its head (the ns* timings)
    // falls out of the capture and the whole line can never re-parse
    // as JSON from a truncated start. Two remedies: a compact headline
    // line that fits WHOLLY inside any tail capture (standalone-
    // parseable totals), and the complete line persisted to a file so
    // per-query data survives regardless of how stdout is captured.
    println(s"""{"metric":"total","unit":"sec","value":${r4(total)},"failed":$fs,"streaming":$streaming,"sf":"$sfDir",$prov,$calib,$outliersJson,"stat":"min_of_$runsPerQuery"}""")
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_full.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(_) => () } // file copy is best-effort
    spark.stop()
  }
}
