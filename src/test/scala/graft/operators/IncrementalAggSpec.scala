package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** IncrementalAgg: merge(partial(A), partial(B), ...) must equal
  * partial(A ∪ B ∪ ...) for ANY split of the input — the algebra the
  * q66 oracle gates at query level, here property-tested on random
  * splits (uneven chunks, empty chunks, all-null groups).
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def state(df: DataFrame): Set[(String, BigDecimal, Long)] =
    df.select(col("k"), col("agg_sum").cast("decimal(38,6)"),
      col("agg_cnt"))
      .as[(String, BigDecimal, Long)].collect().toSet

  test("any 3-way split merges to the one-shot partial state " +
      "(decimal sums: bit-identical, not approximately)") {
    val gen = Gen.listOfN(60, for {
      k <- Gen.oneOf("a", "b", "c")
      cents <- Gen.choose(-99999L, 99999L)
      chunk <- Gen.choose(0, 2)
    } yield (k, cents, chunk))
    // scalatestplus bridge isn't on the classpath; sample the generator
    // directly with fixed seeds for reproducibility.
    for (seed <- 0L until 5L) {
      val rs = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val df = rs.map { case (k, cents, chunk) =>
        (k, BigDecimal(cents, 2), chunk)
      }.toDF("k", "v", "chunk")
        .withColumn("v", col("v").cast("decimal(18,6)"))
      val whole = IncrementalAgg.partial(df, Seq("k"), "v")
      val chunks = (0 to 2).map(c =>
        IncrementalAgg.partial(df.filter(col("chunk") === c),
          Seq("k"), "v"))
      val merged = IncrementalAgg.merge(chunks: _*)
      assert(state(merged) === state(whole), s"seed=$seed")
    }
  }

  test("min/max/count survive merging across chunks; avg derives at " +
      "read time and nulls out on a count-0 group") {
    val df = Seq(
      ("a", Some(5.0)), ("a", Some(1.0)),
      ("b", Option.empty[Double]) // all-null group: cnt 0, avg null
    ).toDF("k", "v")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.partial(df.limit(1), Seq("k"), "v"),
      IncrementalAgg.partial(df.offset(1), Seq("k"), "v"))
    val got = IncrementalAgg.finish(merged)
      .select("k", "agg_min", "agg_max", "agg_cnt", "agg_avg")
      .as[(String, Option[Double], Option[Double], Long, Option[Double])]
      .collect().toSet
    assert(got === Set(
      ("a", Some(1.0), Some(5.0), 2L, Some(3.0)),
      ("b", None, None, 0L, None)))
  }

  test("HLL distinct state: split-merge estimates equal the one-shot " +
      "sketch exactly, and sit within the published error of exact") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val hist = IncrementalAgg.distinctPartial(
      ev.filter(col("ts") < split), Seq("event_type"), "user_id")
    val delta = IncrementalAgg.distinctPartial(
      ev.filter(col("ts") >= split), Seq("event_type"), "user_id")
    val merged = IncrementalAgg.distinctFinish(
      IncrementalAgg.distinctMerge(hist, delta))
      .select(col("event_type"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    val oneShot = IncrementalAgg.distinctFinish(
      IncrementalAgg.distinctPartial(ev, Seq("event_type"), "user_id"))
      .select(col("event_type"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    assert(merged === oneShot,
      "sketch union must be split-invariant")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(exact.keySet === merged.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(merged(k) - n).toDouble / n
      // lgK=12 → ~1.6% RSE; 5% is > 3 sigma
      assert(err < 0.05, s"$k: est=${merged(k)} exact=$n err=$err")
    }
  }
}
