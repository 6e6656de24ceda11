package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL or an exception
    * message would otherwise make a consumer's json.load fail and
    * silently zero the round's gate output. Shared with Bench.
    */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      s"usage: graft.Verify <sfDir> <outDir> (got ${args.length} args)")
    val Array(sfDir, outDir) = args
    // dev-loop filter: SPARK_GRAFT_ONLY=q1_agg,ns46_bm25 restricts the
    // dump (and the oracle json) to the named queries — the driver
    // never sets it, so driver runs always dump the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", "graft-verify",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Clear ALL prior-round output UP FRONT — per-query deletion would
    // still leave stale parquet + a stale oracle_sql.json behind a
    // mid-run process death (OOM/kill), and the driver would then
    // hash-compare the previous round's results as a false pass for
    // every query the run never reached. listFiles() is null-guarded
    // (I/O errors / races) and the sweep is fail-safe: a dir that
    // cannot be deleted surfaces as a parquet-write error on that
    // query, not a silent stale compare.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    try {
      rm(new java.io.File(s"$outDir/oracle_sql.json"))
      SparkEntry.queries.keys.foreach(n => rm(new java.io.File(s"$outDir/$n")))
    } catch { case e if scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] pre-clean failed: ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e if scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
