package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory — the library's front door.
  *
  * Settings a 100 TB deployment needs from the start:
  *  - AQE with partition coalescing and skew-join splitting (runtime
  *    re-planning replaces hand-tuned shuffle partition counts)
  *  - shuffle partitions sized to the cluster's parallelism, not the
  *    200 default
  *  - UTC session timezone (the reference stores formatted local
  *    timestamps — a known data-integrity hazard; we normalize)
  *  - graft SQL extensions (native expressions like `graft_dot`)
  */
object GraftSession {

  def create(master: String = "local[*]", appName: String = "graft",
      uiEnabled: Boolean = true): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // InferFiltersFromGenerate guards every explode(f(x)) with a
      // size(f(x))>0 filter that REPEATS the generator expression; the
      // filter then pushes past repartitions into the file scan, so an
      // expensive shingle/hash array is computed twice per doc — once
      // single-threaded on the pre-repartition scan. The rule only
      // pays off when many rows generate empty arrays, which a cleaned
      // corpus never does; the generators here handle empties anyway.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // duplicate map keys resolve last-wins, the reference's dict-
      // assignment semantics (PodioApiWrapper.py:101) — Spark's
      // default EXCEPTION policy turns a duplicated field_id in one
      // webhook payload into a mid-job crash
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // the testdata events feed carries parquet TIMESTAMP(NANOS),
      // which Spark 4 rejects at schema inference; read the nanos as
      // long once here (Tables.events rebuilds a proper timestamp) —
      // a library loader must not flip session confs per call
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", uiEnabled.toString)
      .getOrCreate()
    // getOrCreate silently returns a PRE-EXISTING session with none of
    // the builder configs above applied (a host harness may have built
    // its own session first). Re-assert every runtime-settable conf on
    // the returned session and register the native functions
    // imperatively (idempotent), so the library's semantics — UTC,
    // last-wins maps, nanos reads, the excluded optimizer rule,
    // graft_dot — hold regardless of who built the session. Only
    // static confs (spark.sql.extensions itself) cannot be re-applied,
    // and the imperative registration covers that one's effect.
    // excludedRules MERGES with (never replaces) any rules the host
    // had already excluded, and repurposing a pre-existing session logs
    // a warning so host-side conf drift is visible rather than silent.
    val preExisting = s.conf.get("spark.sql.extensions", "") !=
      "graft.functions.GraftExtensions"
    if (preExisting)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn("GraftSession.create() repurposed a pre-existing " +
          "SparkSession: graft re-asserts session.timeZone=UTC, " +
          "mapKeyDedupPolicy=LAST_WIN, nanosAsLong and AQE confs on " +
          "it, which affects the host's other work on this session")
    val inferFilters =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val mergedExcluded =
      (s.conf.get("spark.sql.optimizer.excludedRules", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq :+ inferFilters)
        .distinct.mkString(",")
    Seq(
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.optimizer.excludedRules" -> mergedExcluded,
      "spark.sql.mapKeyDedupPolicy" -> "LAST_WIN",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.shuffle.partitions" ->
        s.sparkContext.defaultParallelism.toString
    ).foreach { case (k, v) => s.conf.set(k, v) }
    graft.functions.GraftExtensions.register(s)
    s
  }
}
