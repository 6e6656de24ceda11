package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** JSONL ingestion with malformed-line quarantine: good lines parse
  * against the schema, bad lines survive with their RAW text (the
  * replayable dead-letter), and neither FAILFAST's job-kill nor
  * DROPMALFORMED's silent shrink can happen.
  */
class JsonlCorpusSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("source", StringType)
    .add("text", StringType)

  test("malformed lines quarantine with their raw text; good lines " +
      "round-trip field-exactly; counts reconcile to the input") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl")
    try {
      val path = tmp.resolve("corpus").toString
      val docs = Seq(
        (1L, "web", "alpha beta"),
        (2L, "web", "gamma \"quoted\" delta\nwith newline"),
        (3L, "book", "epsilon"),
        (4L, "book", "zeta eta"))
        .toDF("doc_id", "source", "text")
      // lines 2 and 4 truncated (closing brace cut) — malformed JSON
      docs.select(
          to_json(struct(col("doc_id"), col("source"), col("text")))
            .as("l"), col("doc_id"))
        .select(when(col("doc_id") % 2 === 0,
            expr("substring(l, 1, length(l) - 1)"))
          .otherwise(col("l")).as("value"))
        .write.mode("overwrite").text(path)
      val read = JsonlCorpus.readQuarantined(spark, path, schema)
      val good = JsonlCorpus.goodRows(read)
        .as[(Long, String, String)].collect().toSet
      assert(good === Set((1L, "web", "alpha beta"),
        (3L, "book", "epsilon")),
        "good rows must round-trip field-exactly (escapes included)")
      val rej = JsonlCorpus.rejects(read).as[String].collect().toSet
      assert(rej.size === 2, "both truncated lines must quarantine")
      assert(rej.forall(l => l.startsWith("{\"doc_id\":")
        && !l.endsWith("}")),
        "quarantine rows must hold the RAW malformed line")
      // nothing dropped, nothing invented
      assert(good.size + rej.size === 4)
      // reserved-name guard
      val e = intercept[IllegalArgumentException] {
        JsonlCorpus.readQuarantined(spark, path,
          schema.add(JsonlCorpus.CorruptCol, StringType))
      }
      assert(e.getMessage.contains(JsonlCorpus.CorruptCol))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }
}
