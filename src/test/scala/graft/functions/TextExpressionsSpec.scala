package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_nfc folds combining marks to precomposed, via Column, " +
      "SQL, and the interpreted path; ASCII passes through untouched") {
    GraftExtensions.register(spark)
    val decomposed = "cafe\u0301" // e + COMBINING ACUTE: 5 codepoints
    val precomposed = "caf\u00e9" // precomposed: 4 codepoints
    // Column route (whole-stage codegen)
    val viaColumn = Seq(decomposed, precomposed, "plain ascii", null)
      .toDF("s")
      .select(NfcNormalize(col("s")).as("n"), length(col("s")).as("l"))
      .collect()
    assert(viaColumn(0).getString(0) === precomposed)
    assert(viaColumn(1).getString(0) === precomposed)
    assert(viaColumn(2).getString(0) === "plain ascii")
    assert(viaColumn(3).isNullAt(0), "null in, null out")
    // SQL route through the registered function
    val viaSql = spark.sql(s"SELECT graft_nfc('$decomposed')")
      .collect()(0).getString(0)
    assert(viaSql === precomposed)
    // interpreted path (nullSafeEval) agrees with codegen
    assert(NfcNormalize.nfc(UTF8String.fromString(decomposed))
      === UTF8String.fromString(precomposed))
    // already-normalized input returns the SAME object (no allocation)
    val in = UTF8String.fromString("plain")
    assert(NfcNormalize.nfc(in) eq in)
  }
}
