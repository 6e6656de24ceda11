package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Append-only evidence tables (file rejects, compliance ledgers,
  * forgotten-id ledgers) share one discipline: append rows DEDUPED
  * against what the table already holds, keyed on the caller's
  * identity columns, so replays and repeated reads never grow the
  * evidence unboundedly (the r15 advice rule; factored here in r16 —
  * three sites had re-implemented the same
  * exists→read→left_anti→append sequence). Single-writer per table
  * (the engine's directory-table contract); the read-to-append window
  * is the documented residual a transactional table format would
  * close.
  */
object Evidence {

  def appendDeduped(spark: SparkSession, rows: DataFrame,
      path: String, keyCols: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(p)) rows
      else rows.join(
        spark.read.parquet(path).select(keyCols.map(col): _*),
        keyCols, "left_anti")
    if (!fresh.isEmpty)
      fresh.write.mode("append").parquet(path)
  }
}
