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

  test("graft_shingle_stats matches the HOF wordShingles pipeline " +
      "on real documents and on edge cases") {
    GraftExtensions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3)) {
      val w = split(col("text"), " ")
      val hof = docs.select(col("doc_id"),
        greatest(size(w) - (n - 1), lit(0)).as("n_grams"),
        size(graft.ml.HashUtils.wordShingles(col("text"), n))
          .as("n_distinct"))
      val native = docs.select(col("doc_id"),
        ShingleStats(col("text"), n).as("st"))
        .select(col("doc_id"), col("st.n_grams").as("n_grams"),
          col("st.n_distinct").as("n_distinct"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"n=$n: native shingle stats diverge from the HOF pipeline")
    }
    // edge cases: repeats, short docs, empty string, empty tokens
    // (consecutive spaces — split keeps them, so shingles can contain
    // empty words), and null
    val edge = Seq("a b a b a b", "a b", "", "x  y  z", "w w w w", null)
      .toDF("text")
      .select(ShingleStats(col("text"), 3).as("st"))
      .select(col("st.n_grams"), col("st.n_distinct")).collect()
    assert(edge(0).getInt(0) === 4 && edge(0).getInt(1) === 2) // aba/bab
    assert(edge(1).getInt(0) === 0 && edge(1).getInt(1) === 0) // too short
    assert(edge(2).getInt(0) === 0 && edge(2).getInt(1) === 0) // [""] len 1
    assert(edge(3).getInt(0) === 3 && edge(3).getInt(1) === 3) // x,"",y...
    assert(edge(4).getInt(0) === 2 && edge(4).getInt(1) === 1) // w w w x2
    assert(edge(5).isNullAt(0) && edge(5).isNullAt(1), "null in, null out")
    // SQL route through the registered function
    val viaSql = spark.sql(
      "SELECT graft_shingle_stats('a b c d', 2) AS st").select(
      col("st.n_grams"), col("st.n_distinct")).collect()(0)
    assert(viaSql.getInt(0) === 3 && viaSql.getInt(1) === 3)
    // interpreted path agrees with codegen
    val row = ShingleStats.stats(UTF8String.fromString("a b a b a b"), 3)
    assert(row.getInt(0) === 4 && row.getInt(1) === 2)
    // the ns20 plan must evaluate ONE split: the codegen'd kernel is
    // subexpression-eliminated; the old HOF pipeline put 14 split()
    // calls in the Project (r7 verdict)
    val plan = graft.MlQueries.all("ns20_repetition")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan
    assert(!plan.toString.contains("split("),
      "ns20 should carry no HOF split() pipeline in its physical plan")
  }

  test("graft_shingles (the wordShingles kernel) equals the HOF " +
      "array_distinct/transform pipeline element-for-element") {
    GraftExtensions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3, 4)) {
      // the pre-kernel declarative form, restated inline as the oracle
      val words = split(col("text"), " ")
      val hof = when(size(words) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), size(words) - n),
            i => concat_ws(" ",
              (1 to n).map(o => element_at(words, i + o)): _*))))
      val diff = docs.select(col("doc_id"),
        graft.ml.HashUtils.wordShingles(col("text"), n).as("k"),
        hof.as("h"))
        .filter(not(col("k") <=> col("h"))).count()
      assert(diff === 0,
        s"n=$n: kernel shingles diverge from the HOF pipeline " +
          "(order or content)")
    }
    // edge cases: first-occurrence order, short, empty-token words
    val got = Seq("b a b a c a", "a b", "x  y")
      .toDF("text")
      .select(graft.ml.HashUtils.wordShingles(col("text"), 2).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("b a", "a b", "a c", "c a"))
    assert(got(1) === Seq("a b"))
    assert(got(2) === Seq("x ", " y")) // empty middle token kept
    // SQL route
    assert(spark.sql("SELECT graft_shingles('a b a', 2) AS s")
      .collect()(0).getSeq[String](0) === Seq("a b", "b a"))
  }

  test("graft_hash60 equals conv(substring(md5, 1, 15), 16, 10) on " +
      "corpus words, unicode, empty, and null") {
    GraftExtensions.register(spark)
    val convForm = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    // every word of the corpus (the real per-word hot path input)
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
    val diff = words.select(
      graft.ml.HashUtils.hash60(col("w")).as("k"),
      convForm(col("w")).as("c"))
      .filter(not(col("k") <=> col("c"))).count()
    assert(diff === 0, "kernel hash60 diverges from the conv form")
    // edge values + the DuckDB-documented example
    val edge = Seq("", "café élève", "a", null)
      .toDF("s")
      .select(graft.ml.HashUtils.hash60(col("s")).as("k"),
        convForm(col("s")).as("c")).collect()
    edge.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), "null in, null out")
      else assert(r.getLong(0) === r.getLong(1))
    }
    // hashes are 60-bit: always non-negative
    assert(words.select(graft.ml.HashUtils.hash60(col("w")).as("k"))
      .filter(col("k") < 0).count() === 0)
    // SQL route
    val viaSql = spark.sql(
      "SELECT graft_hash60(cast('a' AS BINARY)) AS h").collect()(0)
    assert(viaSql.getLong(0) ===
      java.lang.Long.parseLong(
        // md5("a") = 0cc175b9c0f1b6a831c399e269772661; first 15 hex
        "0cc175b9c0f1b6a", 16))
  }

  test("ml Column helpers carry no function-registry precondition: " +
      "hash60/wordShingles work on a session without graft functions") {
    // the public ml APIs (Dedup, Corpus, SetSimJoin, ...) build their
    // hash/shingle columns through HashUtils; those must not require
    // GraftExtensions registration (a plain SparkSession.builder()
    // session never registers it). Simulate one: a newSession() with
    // the graft functions explicitly dropped from its registry.
    val s2 = spark.newSession()
    for (f <- Seq("graft_hash60", "graft_shingles",
        "graft_shingle_stats"))
      s2.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(f))
    import s2.implicits._
    val out = Seq((1L, "a b a b")).toDF("doc_id", "text")
      .select(graft.ml.HashUtils.hash60(col("text")).as("h"),
        graft.ml.HashUtils.wordShingles(col("text"), 2).as("s"),
        ShingleStats(col("text"), 2).as("st"))
      .collect()(0)
    assert(out.getLong(0) > 0L)
    assert(out.getSeq[String](1) === Seq("a b", "b a"))
    assert(out.getStruct(2).getInt(0) === 3)
    // and a registry-dependent SQL call on that session DOES fail —
    // proving the drop took effect and the Column route is what works
    intercept[Exception] {
      s2.sql("SELECT graft_hash60(cast('a' AS BINARY))").collect()
    }
  }

  test("graft_all_shingles: position order with duplicates kept, " +
      "array_distinct(all) == graft_shingles, HOF parity on corpus") {
    GraftExtensions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3)) {
      // the declarative positional form, restated inline as the oracle
      val words = split(col("text"), " ")
      val hof = when(size(words) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ",
            (1 to n).map(o => element_at(words, i + o)): _*)))
      val diff = docs.select(
        AllShingles(col("text"), n).as("k"), hof.as("h"))
        .filter(not(col("k") <=> col("h"))).count()
      assert(diff === 0,
        s"n=$n: positional kernel diverges from the HOF pipeline")
      // the pinned cross-kernel invariant: distinct-projected positions
      // equal the distinct kernel exactly (same split, same join)
      val inv = docs.select(
        array_distinct(AllShingles(col("text"), n)).as("d"),
        graft.ml.HashUtils.wordShingles(col("text"), n).as("s"))
        .filter(not(col("d") <=> col("s"))).count()
      assert(inv === 0,
        s"n=$n: array_distinct(all_shingles) != graft_shingles")
    }
    // edge cases: duplicates kept in order, short, empty, null
    val got = Seq("a b a b a", "a b", "", null).toDF("text")
      .select(AllShingles(col("text"), 2).as("s")).collect()
    assert(got(0).getSeq[String](0)
      === Seq("a b", "b a", "a b", "b a"))
    assert(got(1).getSeq[String](0) === Seq("a b"))
    assert(got(2).getSeq[String](0) === Seq())
    assert(got(3).isNullAt(0), "null in, null out")
    // SQL route through the registered function
    assert(spark.sql("SELECT graft_all_shingles('x y x', 2) AS s")
      .collect()(0).getSeq[String](0) === Seq("x y", "y x"))
  }
}
