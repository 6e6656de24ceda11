package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("S5: apps lists every testdata table with composite keys") {
    val a = Catalog.apps(spark, dir).collect()
    assert(a.length === 10)
    assert(a.map(_.getAs[String]("app_name")).toSet.contains("lineitem"))
    assert(a.forall(_.getAs[String]("space_app_id").startsWith("graft.")))
  }

  test("S6: fields carries column metadata from the Spark schema") {
    val f = Catalog.fields(spark, dir)
    val li = f.filter(col("app_name") === "lineitem").collect()
    assert(li.length === 11)
    val q = li.find(_.getAs[String]("field_name") == "l_quantity").get
    assert(q.getAs[String]("data_type") === "double")
  }

  test("S6: hidden flag and return_type default (reference " +
      "PodioApiWrapper.py:226-234 coalesce semantics)") {
    val f = Catalog.fields(spark, dir).collect()
    // no testdata column is underscore-prefixed → nothing hidden, and
    // no parquet writer recorded a return_type → it coalesces to the
    // storage type everywhere
    assert(f.forall(!_.getAs[Boolean]("hidden")))
    assert(f.forall(r =>
      r.getAs[String]("return_type") === r.getAs[String]("data_type")))
    // the embeddings vector column round-trips its nested type
    val emb = f.find(_.getAs[String]("field_name") == "embedding").get
    assert(emb.getAs[String]("return_type") === "array<float>")
  }

  test("S7: crawl nests fields under apps, sorted by field index") {
    val c = Catalog.crawl(spark, dir)
    assert(c.count() === 10)
    val row = c.filter(col("app_name") === "region").collect()(0)
    val fields = row.getSeq[org.apache.spark.sql.Row](2)
    assert(fields.map(_.getAs[String]("field_name")) ===
      Seq("r_regionkey", "r_name"))
  }

  test("schemaDiff detects added / removed / retyped fields") {
    val before = Seq(
      ("t", "a", "int"), ("t", "b", "string"), ("t", "c", "double")
    ).toDF("app_name", "field_name", "data_type")
    val after = Seq(
      ("t", "a", "bigint"), ("t", "b", "string"), ("t", "d", "string")
    ).toDF("app_name", "field_name", "data_type")
    val diff = Catalog.schemaDiff(before, after)
      .select("field_name", "change").as[(String, String)].collect().toMap
    assert(diff === Map("a" -> "retyped", "c" -> "removed", "d" -> "added"))
  }
}
