package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's metadata catalog (S4–S7: org → spaces → apps →
  * fields crawl, PodioApiWrapper.py:169-268) as metadata DataFrames.
  *
  * The reference walks a remote REST hierarchy (~380 calls); here the
  * "org" is the testdata directory, each parquet table is an "app", and
  * its Spark schema supplies the field metadata (S6's
  * {field_label, field_id, hidden, type, return_type} becomes
  * {field_name, field_index, data_type, nullable}).
  */
object Catalog {

  /** S5: one row per table ("app"): composite key + column count
    * (the reference's `(f'{space_id}.{app_id}', app_name)` projection,
    * PodioApiWrapper.py:199-205).
    */
  def apps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one inference path: n_fields is a count over the field catalog
    // (crawl()'s id-frame pattern) rather than a second hand-rolled
    // schema walk that could drift from fields()'s
    val ids = Tables.names.zipWithIndex
      .map { case (name, idx) => (s"graft.$idx", name) }
      .toDF("space_app_id", "app_name")
    // left join + coalesce: a zero-column table has no fields() rows
    // but must still appear with n_fields = 0, not vanish
    ids.join(fields(spark, dir).groupBy(col("app_name"))
        .agg(count(lit(1)).cast("int").as("n_fields")),
        Seq("app_name"), "left")
      .select(col("space_app_id"), col("app_name"),
        coalesce(col("n_fields"), lit(0)).as("n_fields"))
  }

  /** S6: one row per column ("field") with its metadata, mirroring the
    * reference's full field projection {field_label, field_id, hidden,
    * type, return_type} (PodioApiWrapper.py:226-234):
    *  - `hidden`: underscore-prefixed names are internal/hidden (the
    *    local analog of Podio's per-field hidden flag — parquet has no
    *    such flag, but engine-internal columns follow the `_` idiom);
    *  - `return_type`: the field's `return_type` metadata entry when
    *    a writer recorded one, else DEFAULTS TO the storage type — the
    *    reference's `field.get('return_type', field['type'])` coalesce.
    */
  def fields(spark: SparkSession, dir: String): DataFrame = {
    // timestamp_ntz vs timestamp is Spark parquet-inference flavor
    // (isAdjustedToUTC), not data-model information — the catalog
    // reports the one logical type, like the reference's single
    // 'date' field type
    def canon(t: String): String =
      if (t == "timestamp_ntz") "timestamp" else t
    val rows = Tables.names.flatMap { name =>
      Tables.table(spark, dir, name).schema.fields.zipWithIndex.map {
        case (f, i) =>
          val dt = canon(f.dataType.simpleString)
          val rt =
            if (f.metadata.contains("return_type"))
              f.metadata.getString("return_type")
            else dt
          (name, i, f.name, dt, f.nullable, f.name.startsWith("_"), rt)
      }
    }
    import spark.implicits._
    rows.toDF("app_name", "field_index", "field_name", "data_type",
      "nullable", "hidden", "return_type")
  }

  /** S7: the nested catalog crawl, aggregated to the reference's
    * nested `{app: [fields...]}` shape (PodioApiWrapper.py:261-267).
    * ONE schema-inference pass: the composite app ids come from a
    * driver-side literal frame (Tables.names carries the ordering), so
    * crawl doesn't pay `apps()`'s second round of parquet footer reads
    * per table — appDrift runs this on every app-event batch.
    */
  def crawl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.names.zipWithIndex
      .map { case (name, idx) => (s"graft.$idx", name) }
      .toDF("space_app_id", "app_name")
    ids.join(fields(spark, dir), Seq("app_name"))
      .groupBy(col("space_app_id"), col("app_name"))
      .agg(sort_array(collect_list(struct(
        col("field_index"), col("field_name"), col("data_type"))))
        .as("fields"))
  }

  /** Schema-drift diff between two catalog snapshots (the reference
    * re-crawls twice daily to pick up renames/retypes,
    * PodioApiWrapper.py:13; README.md:18). Returns one row per changed
    * field with a change kind: added / removed / retyped.
    */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("app_name"), col("field_name"),
      col("data_type").as("type_before"))
    val a = after.select(col("app_name"), col("field_name"),
      col("data_type").as("type_after"))
    val joined = b.join(a, Seq("app_name", "field_name"), "full_outer")
    joined.withColumn("change",
      when(col("type_before").isNull, lit("added"))
        .when(col("type_after").isNull, lit("removed"))
        .when(col("type_before") =!= col("type_after"), lit("retyped")))
      .filter(col("change").isNotNull)
  }
}
