package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.IncrementalAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance: per-batch merges must
  * equal a one-shot aggregation of everything ingested, replays must
  * be absorbed (no double counting), and checkpoint resets over live
  * state must fail loudly.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def viewOf(statePath: String) =
    StreamingAgg.read(spark, statePath).get
      .select("k", "agg_sum", "agg_cnt", "agg_min", "agg_max")
      .as[(String, Double, Long, Option[Double], Option[Double])]
      .collect().toSet

  test("streamed merges equal the one-shot aggregation of all batches") {
    val statePath = tmp("graft_stream_agg")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = StreamingAgg.start(in.toDF().toDF("k", "v"),
      statePath, tmp("graft_stream_agg_ckpt"), Seq("k"), "v")
    try {
      in.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      in.addData(("a", 3.0), ("c", 4.0))
      q.processAllAvailable()
      in.addData(("b", -1.0))
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = IncrementalAgg.finish(IncrementalAgg.partial(
      Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("c", 4.0), ("b", -1.0))
        .toDF("k", "v"), Seq("k"), "v"))
      .select("k", "agg_sum", "agg_cnt", "agg_min", "agg_max")
      .as[(String, Double, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(viewOf(statePath) === oneShot)
  }

  test("a replayed batch (same id, same content) is absorbed — no " +
      "double counting; a recycled id (different content) fails loudly") {
    val statePath = tmp("graft_agg_replay")
    val b0 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val b1 = Seq(("a", 10.0)).toDF("k", "v")
    StreamingAgg.mergeBatch(b0, 0L, statePath, Seq("k"), "v")
    StreamingAgg.mergeBatch(b1, 1L, statePath, Seq("k"), "v")
    val before = viewOf(statePath)
    // crash-after-commit replay: foreachBatch re-runs the last batch
    StreamingAgg.mergeBatch(b1, 1L, statePath, Seq("k"), "v")
    assert(viewOf(statePath) === before, "replay must not double-count")
    // checkpoint reset: id 0 comes around again with different rows
    val recycled = Seq(("z", 9.0)).toDF("k", "v")
    val e = intercept[IllegalStateException] {
      StreamingAgg.mergeBatch(recycled, 0L, statePath, Seq("k"), "v")
    }
    assert(e.getMessage.contains("checkpoint reset"))
    assert(viewOf(statePath) === before, "failed merge must not mutate")
  }

  test("streamed KMV state equals the batch sketch over the whole " +
      "history, and readOverlap estimates pair intersections from " +
      "state alone") {
    val statePath = tmp("graft_agg_kmv")
    val k = 16
    // audiences: 'a' sees users 1-30, 'b' sees 21-50 (overlap 10),
    // split across two out-of-order batches
    def rows(pairs: Seq[(String, Long)]) = pairs.toDF("aud", "u")
    val all = (1L to 30L).map(("a", _)) ++ (21L to 50L).map(("b", _))
    val (b0, b1) = all.splitAt(17)
    StreamingAgg.mergeBatchKmv(rows(b1), 0L, statePath, "aud", "u", k)
    StreamingAgg.mergeBatchKmv(rows(b0), 1L, statePath, "aud", "u", k)
    // state equals the one-shot Aggregator sketch over all rows
    val kmv = udaf(new graft.functions.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val oneShot = rows(all)
      .select(col("aud"),
        graft.ml.HashUtils.hash60(col("u").cast("string")).as("h"))
      .groupBy(col("aud")).agg(kmv(col("h")).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    val st = StreamingAgg.readState(spark, statePath).get
      .as[(String, Seq[Long])].collect().toMap
    assert(st === oneShot)
    // overlap estimate from state alone: both sketches are full
    // (30 > k), so the estimator path runs; truth is |a∩b| = 10,
    // |a∪b| = 50 — KMV at k=16 is coarse, assert the loose bound
    val ov = StreamingAgg.readOverlap(spark, statePath, "aud", k).get
      .collect()(0)
    val (estU, estI) = (ov.getDouble(4), ov.getDouble(5))
    assert(estU > 25 && estU < 100, s"union estimate $estU off truth 50")
    assert(estI >= 0 && estI < 30, s"inter estimate $estI off truth 10")
    // a replay of the last batch is absorbed bit-for-bit
    StreamingAgg.mergeBatchKmv(rows(b0), 1L, statePath, "aud", "u", k)
    val replayed = StreamingAgg.readState(spark, statePath).get
      .as[(String, Seq[Long])].collect().toMap
    assert(replayed === st)
  }

  test("streamed HLL distinct state: batch merges equal the one-shot " +
      "sketch and the replay guard holds") {
    val statePath = tmp("graft_agg_hll")
    val b0 = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("k", "u")
    val b1 = Seq(("a", 2L), ("a", 3L)).toDF("k", "u")
    StreamingAgg.mergeBatchDistinct(b0, 0L, statePath, Seq("k"), "u")
    StreamingAgg.mergeBatchDistinct(b1, 1L, statePath, Seq("k"), "u")
    def estimates = StreamingAgg.readDistinct(spark, statePath).get
      .select(col("k"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    val oneShot = IncrementalAgg.distinctFinish(
      IncrementalAgg.distinctPartial(b0.unionByName(b1), Seq("k"), "u"))
      .select(col("k"), col("est_distinct"))
      .as[(String, Long)].collect().toMap
    assert(estimates === oneShot)
    assert(estimates === Map("a" -> 3L, "b" -> 1L),
      "tiny exact-regime sketches must be exact")
    val before = estimates
    StreamingAgg.mergeBatchDistinct(b1, 1L, statePath, Seq("k"), "u")
    assert(estimates === before, "replay must not inflate the sketch")
  }

  test("a mid-swap crash leaves a recoverable state (bak restored on " +
      "next read)") {
    val statePath = tmp("graft_agg_crash")
    StreamingAgg.mergeBatch(Seq(("a", 1.0)).toDF("k", "v"),
      0L, statePath, Seq("k"), "v")
    val before = viewOf(statePath)
    // simulate the crash window between live→bak and tmp→live
    val live = new org.apache.hadoop.fs.Path(statePath, "state")
    val bak = new org.apache.hadoop.fs.Path(statePath, "state_bak")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(live, bak))
    assert(viewOf(statePath) === before,
      "read must restore the staged-aside generation")
    // and the restored state keeps merging normally
    StreamingAgg.mergeBatch(Seq(("a", 2.0)).toDF("k", "v"),
      1L, statePath, Seq("k"), "v")
    assert(viewOf(statePath).exists {
      case ("a", sum, cnt, _, _) => sum == 3.0 && cnt == 2L
      case _ => false
    })
  }

  test("streamed top-terms sketch keeps the space-saving guarantees " +
      "across batch merges, and is exact when capacity covers the " +
      "vocabulary") {
    val rnd = new scala.util.Random(11L)
    // zipf-ish skew split across 3 batches in shuffled order
    val terms = (1 to 60).flatMap(i => Seq.fill(600 / i)(s"t$i"))
    val shuffled = rnd.shuffle(terms)
    val docs = shuffled.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    val batches = docs.grouped((docs.length + 2) / 3).toSeq
    val truth = terms.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val n = terms.length.toLong
    val capacity = 24
    val statePath = tmp("graft_topterms")
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingAgg.mergeBatchTopTerms(b.toDF("doc_id", "text"), i.toLong,
        statePath, capacity)
    }
    val sketch = StreamingAgg.readTopTerms(spark, statePath, capacity)
      .get.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.length === capacity)
    sketch.foreach { case (t, c, e) =>
      assert(c >= truth(t), s"$t undercounted")
      assert(c - e <= truth(t), s"$t overcount exceeds err bound")
    }
    val est = sketch.map { case (t, c, _) => t -> c }.toMap
    truth.filter(_._2 > n / capacity).keys.foreach { t =>
      assert(est.contains(t), s"frequent term $t evicted")
    }
    // replay absorption holds for sketch state too
    StreamingAgg.mergeBatchTopTerms(
      batches.last.toDF("doc_id", "text"), (batches.length - 1).toLong,
      statePath, capacity)
    val replayed = StreamingAgg.readTopTerms(spark, statePath, capacity)
      .get.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(replayed.toSet === sketch.toSet, "replay must not re-merge")
    // wide capacity ⇒ nothing ever evicts ⇒ exact counts, zero err
    val wide = tmp("graft_topterms_wide")
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingAgg.mergeBatchTopTerms(b.toDF("doc_id", "text"), i.toLong,
        wide, capacity = 1000)
    }
    val exact = StreamingAgg.readTopTerms(spark, wide, 1000)
      .get.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.map(x => x._1 -> x._2).toMap === truth)
    assert(exact.forall(_._3 === 0L), "no eviction ⇒ zero err")
  }

  test("sketch shape is stamped with the state: merging with different " +
      "parameters fails loudly instead of voiding the guarantees") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "b d e f")).toDF("doc_id", "text")
    val statePath = tmp("graft_shape_tt")
    StreamingAgg.mergeBatchTopTerms(docs, 0L, statePath, capacity = 4)
    // a restart that passes a different capacity would re-admit
    // evicted terms below their floor — must be refused
    intercept[IllegalArgumentException] {
      StreamingAgg.mergeBatchTopTerms(docs, 1L, statePath, capacity = 8)
    }
    // same shape continues fine
    StreamingAgg.mergeBatchTopTerms(
      Seq((3L, "a f g")).toDF("doc_id", "text"), 1L, statePath, 4)
    // KMV: k is part of the shape for merge AND for read-time
    // estimates (kth-minimum math against the wrong k is silent)
    val kmvPath = tmp("graft_shape_kmv")
    val rows = Seq(("x", 1L), ("x", 2L), ("y", 3L)).toDF("aud", "u")
    StreamingAgg.mergeBatchKmv(rows, 0L, kmvPath, "aud", "u", k = 16)
    intercept[IllegalArgumentException] {
      StreamingAgg.mergeBatchKmv(rows, 1L, kmvPath, "aud", "u", k = 32)
    }
    intercept[IllegalArgumentException] {
      StreamingAgg.readOverlap(spark, kmvPath, "aud", k = 32)
    }
    assert(StreamingAgg.readOverlap(spark, kmvPath, "aud", 16).isDefined)
  }
}
