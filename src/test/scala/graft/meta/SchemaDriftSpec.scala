package graft.meta

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** §1.2 dynamic schema: Podio admins add/rename/retype fields between
  * crawls. Two guarantees: (a) mergeSchema reads union old and new
  * file schemas with nulls for missing columns; (b) Catalog.schemaDiff
  * classifies the drift.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema read unions drifted file schemas") {
    val root = Files.createTempDirectory("graft_drift").toString
    Seq((1L, "alice"), (2L, "bob")).toDF("item_id", "name")
      .write.parquet(s"$root/batch=1")
    Seq((3L, "carol", 9.5)).toDF("item_id", "name", "score")
      .write.parquet(s"$root/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet === Set("item_id", "name", "score", "batch"))
    val noScore = merged.filter(col("score").isNull)
      .select("item_id").as[Long].collect().sorted
    assert(noScore.toSeq === Seq(1L, 2L))
    assert(merged.count() === 3)
  }

  test("schemaDiff classifies added, removed, and retyped fields") {
    val before = Seq(
      ("items", "name", "string"),
      ("items", "price", "double"),
      ("items", "legacy", "string")
    ).toDF("app_name", "field_name", "data_type")
    val after = Seq(
      ("items", "name", "string"),     // unchanged
      ("items", "price", "string"),    // retyped
      ("items", "score", "double")     // added; legacy removed
    ).toDF("app_name", "field_name", "data_type")
    val diff = Catalog.schemaDiff(before, after)
      .select("field_name", "change").as[(String, String)].collect().toMap
    assert(diff === Map("price" -> "retyped", "legacy" -> "removed",
      "score" -> "added"))
  }

  test("observe records row/byte counters during the action (A1)") {
    val df = Telemetry.observed(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      "ingest", "text")
    // the action must run the observed plan itself (a derived
    // count() plan is a different query execution)
    val n = df.collect().length
    val m = Telemetry.metrics(df, "ingest").get
    assert(m.getAs[Long]("n_rows") === n.toLong)
    assert(m.getAs[Long]("n_bytes") > 0L)
  }
}
