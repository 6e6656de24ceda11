package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard join vs the brute-force all-pairs
  * restatement: identical results (the prefix theorem loses nothing),
  * with measurably fewer candidate pairs than the full posting-list
  * join generates.
  */
class SetSimJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  private def bruteForce(n: Int, threshold: Double) = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(HashUtils.wordShingles(col("text"), n)).as("s"))
      .select(col("doc_id"), HashUtils.hash60(col("s")).as("h"))
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    tok.select(col("doc_id").as("i"), col("h"))
      .join(tok.select(col("doc_id").as("j"), col("h")), Seq("h"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).cast("double").as("common"))
      .join(sz.select(col("doc_id").as("i"), col("sz").as("si")), Seq("i"))
      .join(sz.select(col("doc_id").as("j"), col("sz").as("sj")), Seq("j"))
      .withColumn("jaccard", round(col("common") /
        (col("si") + col("sj") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  test("prefix join equals brute force at several thresholds") {
    for (t <- Seq(0.4, 0.5, 0.8)) {
      val got = SetSimJoin
        .prefixJaccardJoin(Tables.documents(spark, dir), n = 3,
          threshold = t)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val want = bruteForce(3, t)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(got === want, s"threshold $t")
      assert(want.nonEmpty || t > 0.7, s"vacuous fixture at $t")
    }
  }

  test("threshold 1.0 returns only identical shingle sets") {
    val got = SetSimJoin
      .prefixJaccardJoin(Tables.documents(spark, dir), n = 3,
        threshold = 1.0)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(_._3 == 1.0))
    // must agree with brute force exactly (the fixture may or may not
    // contain identical-set pairs at this scale)
    val want = bruteForce(3, 1.0)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got.sorted.toSeq === want)
  }

  test("prefix posting lists are smaller than the full token universe") {
    // the pruning claim, measured: prefix tokens are a strict subset
    // of all tokens, and the ratio is bounded by ~(1 - tau) + 1/|s|
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"),
        explode(HashUtils.wordShingles(col("text"), 3)).as("s"))
    val full = tok.count()
    val t = 0.5
    val prefixRows = {
      val hashed = tok.select(col("doc_id"),
        HashUtils.hash60(col("s")).as("h"))
      val dfreq = hashed.groupBy("h").agg(count(lit(1)).as("df"))
      import org.apache.spark.sql.expressions.Window
      hashed.join(dfreq, Seq("h"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
        .withColumn("sz", count(lit(1)).over(
          Window.partitionBy(col("doc_id"))))
        .filter(col("pos") <=
          col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1)
        .count()
    }
    assert(prefixRows < full * 0.6,
      s"prefix $prefixRows of $full — filter not pruning")
  }
}
