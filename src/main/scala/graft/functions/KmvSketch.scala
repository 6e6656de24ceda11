package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch — the set-operation-capable
  * sibling of the HLL path (q69): where HLL unions but cannot
  * intersect, a KMV sketch supports BOTH, so audience-overlap
  * questions ("how many users are in segment A ∩ segment B?") run
  * from k-sized summaries instead of a full distinct shuffle per pair
  * (reference anchor: the per-field member lists that
  * PodioConnector.py:60's filtered reads are used to cross-tabulate).
  *
  * The sketch is the k smallest DISTINCT 60-bit hashes of the group's
  * values, kept sorted ascending. With uniform hashes, the kth
  * minimum r_k (normalized to (0, 1]) estimates the distinct count as
  * (k−1)/r_k; for two sketches, the k smallest of their union is
  * exactly the KMV sketch of A ∪ B, and the fraction ρ of those that
  * appear in both input sketches estimates the Jaccard similarity, so
  * |A ∩ B| ≈ ρ · |A ∪ B| (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * Scale shape: the buffer is a bounded sorted array, so partial
  * aggregation ships at most k longs per group per partition and
  * merges are linear two-pointer passes — a mergeable summary in the
  * same sense as the space-saving sketch (ns24b). When a group has
  * fewer than k distinct values the sketch IS the exact distinct hash
  * set, and downstream estimators switch to exact set algebra — the
  * query layer (q96) encodes that branch explicitly so small groups
  * lose nothing to estimation.
  *
  * The output encoder is an ExpressionEncoder (ArrayType(LongType)),
  * NOT kryo: the aggregated frame is tiny (one row per group) and the
  * pairwise overlap arithmetic downstream runs on native
  * array_union / array_intersect / element_at over that column —
  * keeping the whole estimator inside Catalyst instead of round-
  * tripping through opaque binary.
  */
class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, "k must be > 1: the (k-1)/r_k estimator degenerates")
  // input contract: values are hash60 outputs, i.e. uniform in
  // [0, 2^60) — the downstream estimators normalize by 2^60, so raw
  // (possibly negative) longs would sketch fine but estimate garbage

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already one of the minima
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // above the current kth min
      else {
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        if (ins < out.length - 1)
          System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  /** Two-pointer merge of two sorted distinct arrays, capped at k. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // shared minimum
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvSketch {

  /** Pairwise union/intersection estimates over a `(key, sk)` frame of
    * KMV sketches — the estimator arithmetic shared by the q96 batch
    * query and the streaming state reader
    * ([[graft.streaming.StreamingAgg.readOverlap]]). For each key pair:
    * the k smallest of the two sketches' union IS the union's KMV
    * sketch, `nu < k` means both inputs were exact sets (estimates
    * collapse to exact algebra), and ρ = c/k of shared minima scales
    * the union estimate down to the intersection. Outputs are
    * UNROUNDED; callers round at their gate boundary.
    */
  def overlapEstimates(sketches: DataFrame, keyCol: String, k: Int)
      : DataFrame = {
    require(k > 1, "k must match the sketches' k and exceed 1")
    require(sketches.columns.contains(keyCol) &&
      sketches.columns.contains("sk"),
      s"need ($keyCol, sk) columns, got ${sketches.columns.toSeq}")
    // same reserved-working-name contract as RangeJoin.intervalJoin:
    // a caller key named like an internal column would corrupt output
    val reserved = Seq("key_a", "key_b", "sk_a", "sk_b", "u", "nu", "c",
      "est_union", "est_inter")
    require(!reserved.contains(keyCol),
      s"keyCol may not use the reserved working names $reserved")
    val a = sketches.select(col(keyCol).as("key_a"), col("sk").as("sk_a"))
    val b = sketches.select(col(keyCol).as("key_b"), col("sk").as("sk_b"))
    a.crossJoin(b).filter(col("key_a") < col("key_b"))
      .withColumn("u",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("nu", size(col("u")))
      .withColumn("c", size(array_intersect(col("u"),
        array_intersect(col("sk_a"), col("sk_b")))).cast("long"))
      .withColumn("est_union",
        when(col("nu") < k, col("nu").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
            (element_at(col("u"), k) + lit(1L)).cast("double")))
      .withColumn("est_inter",
        when(col("nu") < k, col("c").cast("double"))
          .otherwise((col("c").cast("double") / lit(k.toDouble)) *
            col("est_union")))
      .select(col("key_a"), col("key_b"), col("nu"), col("c"),
        col("est_union"), col("est_inter"))
  }
}
