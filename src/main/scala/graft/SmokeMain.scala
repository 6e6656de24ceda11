package graft
object SmokeMain {
  def main(args: Array[String]): Unit = {
    // through GraftSession, not a hand-built session: the smoke gate
    // must run under the same semantics (extensions, UTC, map dedup
    // policy, optimizer exclusions) as every other gate, or a future
    // entry() change could crash here for a config-drift reason the
    // real gates cannot reproduce
    val spark = GraftSession.create("local[4]", "graft-smoke",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, false)
    spark.stop()
  }
}
