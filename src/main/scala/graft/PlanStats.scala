package graft

/** Dev tool: one-line plan-shape stats (formatted-plan line count,
  * Exchange/Sort/Window/BroadcastExchange counts) for every registry
  * entry at a small SF — the whole-registry triage table an
  * optimization round starts from. Construction-eager entries execute
  * their fixture builds; run at sf0.001 to keep that cheap. Not part
  * of the driver contract.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(s"local[$cpus]", "graft-planstats",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        def c(p: String) = p.r.findAllIn(txt).length
        println(f"PLANSTAT $n%-28s lines=${txt.linesIterator.length}%6d " +
          f"exch=${c("(?m)^\\s*[+:]?[- ]*Exchange")}%3d " +
          f"bcast=${c("BroadcastExchange")}%3d " +
          f"sort=${c("(?m)Sort \\(")}%3d win=${c("Window \\(")}%3d")
      } catch { case e if scala.util.control.NonFatal(e) =>
        println(s"PLANSTAT $n FAILED ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
