package graft
import java.nio.file.{Files, Paths}

/** Scratch runner for iterating on a subset of registry queries:
  * dumps only the named queries (plus their oracle subset json) so
  * tools/check.py gates just those. Not part of the driver contract.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: graft.Dev <sfDir> <outDir> <q>...")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(s"local[$cpus]", "graft-dev",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[dev] $name rows=${spark.read.parquet(s"$outDir/$name").count()} sec=$sec%.2f")
    }
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
