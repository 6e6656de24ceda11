package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit fixtures mirror the reference's `clean_item` inputs
  * (FIXTURES.md §B; reference PodioApiWrapper.py:45-102).
  */
class CleanFieldsSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(fieldType: String, values: Seq[String]): String = {
    val df = Seq((fieldType, values)).toDF("t", "vs")
      .select(CleanFields.cleanValue(col("t"), col("vs")).as("out"))
    df.collect()(0).getAs[String]("out")
  }

  test("date: comma-join of starts (PodioApiWrapper.py:60-61)") {
    assert(cleanOne("date", Seq(
      """{"start": "2024-10-10 00:00:00"}""",
      """{"start": "2024-11-01 12:30:00"}""")) ===
      "2024-10-10 00:00:00,2024-11-01 12:30:00")
  }

  test("contact: nested name extract (PodioApiWrapper.py:62-63)") {
    assert(cleanOne("contact", Seq(
      """{"value": {"name": "Ada"}}""",
      """{"value": {"name": "Grace"}}""")) === "Ada,Grace")
  }

  test("text: HTML tags stripped (PodioApiWrapper.py:64-65)") {
    assert(cleanOne("text", Seq(
      """{"value": "<p>Hi <b>there</b></p>"}""")) === "Hi there")
  }

  test("category: option label (PodioApiWrapper.py:66-67)") {
    assert(cleanOne("category", Seq(
      """{"value": {"text": "Won"}}""",
      """{"value": {"text": "Lost"}}""")) === "Won,Lost")
  }

  test("app: FK item ids stringified (PodioApiWrapper.py:68-69)") {
    assert(cleanOne("app", Seq(
      """{"value": {"item_id": 42}}""",
      """{"value": {"item_id": 77}}""")) === "42,77")
  }

  test("phone/email/number/location passthrough (PodioApiWrapper.py:70-71)") {
    assert(cleanOne("phone", Seq("""{"value": "555-1234"}""")) === "555-1234")
    assert(cleanOne("email", Seq("""{"value": "a@b.c"}""")) === "a@b.c")
    assert(cleanOne("number", Seq("""{"value": "3.5"}""")) === "3.5")
    assert(cleanOne("location", Seq("""{"value": "Oslo"}""")) === "Oslo")
  }

  test("calculation branch (a): start key present (PodioApiWrapper.py:73-74)") {
    assert(cleanOne("calculation", Seq(
      """{"start": "2024-01-01 00:00:00"}""",
      """{"start": "2024-02-01 00:00:00"}""")) ===
      "2024-01-01 00:00:00,2024-02-01 00:00:00")
  }

  test("calculation branch (b): all values date-parse (PodioApiWrapper.py:75-79)") {
    assert(cleanOne("calculation", Seq(
      """{"value": "2024-01-02T00:00:00"}""",
      """{"value": "2024-03-04T10:00:00"}""")) === "2024-01-02,2024-03-04")
  }

  test("calculation branch (c): float cast of first (PodioApiWrapper.py:82-88)") {
    assert(cleanOne("calculation", Seq(
      """{"value": "3.14"}""", """{"value": "2.71"}""")) === "3.14")
  }

  test("calculation branch (c): string fallback keeps first raw value") {
    assert(cleanOne("calculation", Seq(
      """{"value": "abc"}""", """{"value": "def"}""")) === "abc")
  }

  test("money: float of FIRST value only (PodioApiWrapper.py:89-90)") {
    assert(cleanOne("money", Seq(
      """{"value": "19.99"}""", """{"value": "1.00"}""")) === "19.99")
  }

  test("unknown type → null (PodioApiWrapper.py:91-94)") {
    assert(cleanOne("embed", Seq("""{"value": "x"}""")) === null)
  }

  test("cleanValue is total: never throws on garbage payloads") {
    val garbage = Seq("", "not json", "{", """{"value": null}""", "[1,2]")
    for (t <- Seq("date", "contact", "text", "category", "app", "phone",
        "calculation", "money", "whatever")) {
      cleanOne(t, garbage) // must not throw
    }
  }

  test("cleanItems: map keyed by stringified field_id; rejects split off") {
    val raw = Seq(
      (1001L, Seq(
        (11L, "Status", "category", Seq("""{"value": {"text": "Won"}}""")),
        (12L, "Notes", "text", Seq("""{"value": "<i>hi</i>"}""")),
        (13L, "Img", "image", Seq("""{"value": "blob"}"""))))
    ).toDF("item_id", "fields_raw")
      .select(col("item_id"), expr(
        "transform(fields_raw, f -> named_struct(" +
          "'field_id', f._1, 'label', f._2, 'type', f._3, 'values', f._4))")
        .as("fields"))

    val cleaned = CleanFields.cleanItems(raw).collect()
    assert(cleaned.length === 1)
    val data = cleaned(0).getAs[Map[String, Row]]("data")
    assert(data.keySet === Set("11", "12"))
    assert(data("11").getAs[String]("field_value") === "Won")
    assert(data("12").getAs[String]("field_value") === "hi")
    assert(data("12").getAs[String]("field_label") === "Notes")

    val rej = CleanFields.rejects(raw).collect()
    assert(rej.length === 1)
    assert(rej(0).getAs[Long]("field_id") === 13L)
    assert(rej(0).getAs[String]("field_type") === "image")
  }

  test("a null-typed field lands in rejects, never in neither sink " +
      "(three-valued isin complement)") {
    val raw = Seq(
      (5L, Seq(
        (21L, "Ok", "text", Seq("""{"value": "fine"}""")),
        (22L, "Broken", null.asInstanceOf[String], Seq("""{"value": "?"}"""))))
    ).toDF("item_id", "fields_raw")
      .select(col("item_id"), expr(
        "transform(fields_raw, f -> named_struct(" +
          "'field_id', f._1, 'label', f._2, 'type', f._3, 'values', f._4))")
        .as("fields"))
    val data = CleanFields.cleanItems(raw).collect()(0)
      .getAs[Map[String, Row]]("data")
    assert(data.keySet === Set("21"), "null-typed field must not be kept")
    val rej = CleanFields.rejects(raw).collect()
    assert(rej.length === 1)
    assert(rej(0).getAs[Long]("field_id") === 22L)
    assert(rej(0).isNullAt(rej(0).fieldIndex("field_type")))
  }

  test("cleanItems keeps items with empty or all-unknown fields as an " +
      "empty map (reference keys every item, PodioApiWrapper.py:137-139)") {
    val raw = Seq(
      (1L, Seq(
        (11L, "Img", "image", Seq("""{"value": "blob"}""")))),
      (2L, Seq.empty[(Long, String, String, Seq[String])])
    ).toDF("item_id", "fields_raw")
      .select(col("item_id"), expr(
        "transform(fields_raw, f -> named_struct(" +
          "'field_id', f._1, 'label', f._2, 'type', f._3, 'values', f._4))")
        .as("fields"))
    val cleaned = CleanFields.cleanItems(raw).collect()
      .map(r => r.getLong(0) -> r.getAs[Map[String, Row]]("data")).toMap
    assert(cleaned.keySet === Set(1L, 2L), "no item may be dropped")
    assert(cleaned(1L).isEmpty && cleaned(2L).isEmpty)
  }

  test("duplicate field_id within an item resolves last-wins " +
      "(reference dict assignment, PodioApiWrapper.py:101)") {
    val raw = Seq(
      (1L, Seq(
        (11L, "A", "text", Seq("""{"value": "first"}""")),
        (11L, "A", "text", Seq("""{"value": "second"}"""))))
    ).toDF("item_id", "fields_raw")
      .select(col("item_id"), expr(
        "transform(fields_raw, f -> named_struct(" +
          "'field_id', f._1, 'label', f._2, 'type', f._3, 'values', f._4))")
        .as("fields"))
    val data = CleanFields.cleanItems(raw).collect()(0)
      .getAs[Map[String, Row]]("data")
    assert(data("11").getAs[String]("field_value") === "second")
  }
}
