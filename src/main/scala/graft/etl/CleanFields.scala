package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `clean_item` transform (reference:
  * PodioApiWrapper.py:45-102) re-expressed as pure Catalyst Column
  * expressions — no UDFs, fully codegen-able and optimizable.
  *
  * Input model (Spark-native form of the polymorphic Podio JSON): a raw
  * item row carries `fields: array<struct<field_id:long, label:string,
  * type:string, values:array<string>>>` where each element of `values`
  * is the raw JSON payload for one value (the reference iterates Python
  * dicts; we keep the JSON text and extract with `get_json_object`,
  * which preserves the reference's full polymorphism).
  *
  * Per-type semantics (PodioApiWrapper.py:59-94):
  *   date         → comma-join of `values[i].start`
  *   contact      → comma-join of `values[i].value.name`
  *   text         → HTML tags stripped (`<.*?>` → ""), comma-join
  *   category     → comma-join of `values[i].value.text`
  *   app          → comma-join of stringified `values[i].value.item_id`
  *   phone/email/number/location → comma-join of `values[i].value`
  *   calculation  → (a) payload has `start` → join of starts;
  *                  (b) else value date-parses → yyyy-MM-dd joined;
  *                  (c) else float-cast of FIRST value, string fallback
  *   money        → float of FIRST value only
  *   anything else → null (reference "skips" with a console note,
  *                  PodioApiWrapper.py:91-94 — we route to a rejects
  *                  filter instead)
  */
object CleanFields {

  /** Comma-join of a per-value JSON-path extraction over `values`. */
  private def joinPath(values: Column, path: String): Column =
    array_join(transform(values, v => get_json_object(v, path)), ",")

  /** Permissive date parse of a scalar string → `yyyy-MM-dd`, null if
    * unparseable (reference uses dateutil.parse;
    * PodioApiWrapper.py:75-79). try_to_timestamp covers ISO shapes; a
    * date-only fallback covers `yyyy-MM-dd`.
    */
  def permissiveDate(v: Column): Column =
    date_format(
      coalesce(
        try_to_timestamp(v),
        try_to_timestamp(v, lit("yyyy-MM-dd'T'HH:mm:ss")),
        try_to_timestamp(v, lit("yyyy/MM/dd")),
        try_to_timestamp(v, lit("MM/dd/yyyy"))),
      "yyyy-MM-dd")

  /** The `calculation` cascade (PodioApiWrapper.py:72-88), branch for
    * branch:
    *  (a) first payload has a `start` key → behave like `date`;
    *  (b) else if every value date-parses → join of yyyy-MM-dd;
    *  (c) else float(first value) if castable, else the raw first value.
    */
  def cleanCalculation(values: Column): Column = {
    // try_element_at: an empty `values` array must clean to null, not
    // throw (ANSI element_at errors on index-out-of-bounds; the
    // reference's values[0] IndexError was swallowed by the caller's
    // retry loop — we are total instead).
    // Branch (a) tests key PRESENCE ('start' in values[0].keys(),
    // PodioApiWrapper.py:73), not value non-nullness — a payload with
    // an explicit null start still belongs to the date branch, which
    // get_json_object alone cannot distinguish.
    val hasStartKey = array_contains(
      json_object_keys(try_element_at(values, lit(1))), "start")
    val rawVals = transform(values, v => get_json_object(v, "$.value"))
    val dateParsed = transform(rawVals, v => permissiveDate(v))
    val allDates = forall(dateParsed, d => d.isNotNull)
    val firstRaw = try_element_at(rawVals, lit(1))
    when(hasStartKey, joinPath(values, "$.start"))
      .when(size(values) > 0 && allDates, array_join(dateParsed, ","))
      .otherwise(coalesce(
        firstRaw.try_cast("double").cast("string"), firstRaw))
  }

  /** HTML strip, exactly the reference regex (PodioApiWrapper.py:65). */
  def stripHtml(v: Column): Column = regexp_replace(v, "<.*?>", "")

  /** Cleaned scalar value for one field, dispatched on `fieldType`
    * (the `match` at PodioApiWrapper.py:59-94).
    */
  def cleanValue(fieldType: Column, values: Column): Column =
    when(fieldType === "date", joinPath(values, "$.start"))
      .when(fieldType === "contact", joinPath(values, "$.value.name"))
      .when(fieldType === "text",
        array_join(transform(values,
          v => stripHtml(get_json_object(v, "$.value"))), ","))
      .when(fieldType === "category", joinPath(values, "$.value.text"))
      .when(fieldType === "app", joinPath(values, "$.value.item_id"))
      .when(fieldType.isin("phone", "email", "number", "location"),
        joinPath(values, "$.value"))
      .when(fieldType === "calculation", cleanCalculation(values))
      .when(fieldType === "money",
        get_json_object(try_element_at(values, lit(1)), "$.value").try_cast(
          "double").cast("string"))
      .otherwise(lit(null).cast("string"))

  /** The cleanable field types — THE single copy: [[cleanItems]]'s
    * keep-filter, [[rejects]]' complement, and (by construction)
    * [[cleanValue]]'s dispatch arms partition on this list, so a new
    * type added here cannot silently land in both or neither sink.
    */
  val knownTypes: Seq[String] = Seq("date", "contact", "text", "category",
    "app", "phone", "email", "number", "location", "calculation", "money")

  /** Whole-item clean (the reference's per-item output shape,
    * PodioApiWrapper.py:95-101): `item_id` + a map keyed by stringified
    * field_id of `{field_id, field_label, field_type, field_value}`
    * structs. Fields of unknown type are excluded from the map and
    * surfaced via [[rejects]] (dead-letter, PodioApiWrapper.py:91-94).
    *
    * Array-native (filter + transform + map_from_entries), NOT
    * explode/groupBy: the reference keeps EVERY item — an item with an
    * empty `fields` array or only unknown-typed fields returns `{}`
    * (PodioApiWrapper.py:137-139 keys every item) — and an explode
    * formulation silently drops those items because no row survives to
    * the re-group. Per-item local work, zero shuffle.
    *
    * Duplicate field_ids within one item resolve LAST-wins, matching
    * the reference's dict assignment (PodioApiWrapper.py:101) — see the
    * `spark.sql.mapKeyDedupPolicy=LAST_WIN` conf in GraftSession
    * (Spark's default EXCEPTION policy would throw mid-job instead).
    */
  def cleanItems(raw: DataFrame): DataFrame = {
    val kept = filter(col("fields"),
      f => f.getField("type").isin(knownTypes: _*))
    val entries = transform(kept, f => struct(
      f.getField("field_id").cast("string").as("k"),
      struct(
        f.getField("field_id").as("field_id"),
        f.getField("label").as("field_label"),
        f.getField("type").as("field_type"),
        cleanValue(f.getField("type"), f.getField("values"))
          .as("field_value")).as("v")))
    raw.select(col("item_id"), map_from_entries(entries).as("data"))
  }

  /** Dead-letter rows: fields whose type has no clean rule
    * (PodioApiWrapper.py:91-94 prints a note; we emit a DataFrame the
    * caller can sink to a rejects table).
    *
    * The predicate is the COMPLEMENT of cleanItems' keep-filter under
    * three-valued logic: a null `type` makes `isin` null, which the
    * keep-filter drops — so the reject side must treat null as "not
    * known" (coalesce to false before negating), or a null-typed field
    * would vanish from BOTH sinks.
    */
  def rejects(raw: DataFrame): DataFrame =
    raw.select(col("item_id"), explode(col("fields")).as("f"))
      .filter(!coalesce(col("f.type").isin(knownTypes: _*), lit(false)))
      .select(col("item_id"), col("f.field_id").as("field_id"),
        col("f.type").as("field_type"))
}
