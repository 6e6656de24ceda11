package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` for named registry entries to
  * files — the before/after plan evidence the optimization rounds
  * commit under `plans/rNN/`. Not part of the driver contract.
  *
  * usage: runMain graft.PlanDump <outDir> <suffix> <q>[,<q>...]
  * writes <outDir>/<q>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: graft.PlanDump <outDir> <suffix> <q>[,q...]")
    val outDir = args(0); val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-plandump",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
