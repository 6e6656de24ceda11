package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed top-k-by-score aggregator — the `Aggregator[IN, BUF, OUT]`
  * extension point (SURVEY.md §7), used for per-query nearest-neighbor
  * collection.
  *
  * Scale rationale vs the window-function top-k: a window must shuffle
  * and sort EVERY candidate pair (N·candidates rows); an aggregator
  * partial-aggregates map-side, so each partition ships at most k
  * entries per group — the shuffle shrinks from O(candidates) to
  * O(groups·k·partitions). Determinism matches the window form:
  * ordering by (score desc, neighbor id asc).
  *
  * The buffer is a sorted List capped at k (kryo-encoded — it is
  * opaque state, never inspected by SQL); insertion is O(k), fine for
  * the k ≤ 100 regime ANN queries use.
  */
case class Scored(j: Long, score: Double)

/** One scored candidate pair: query i, neighbor j. */
case class ScoredPair(i: Long, j: Long, score: Double)

class TopKByScore(k: Int)
    extends Aggregator[ScoredPair, List[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive") // k<=0 would silently emit
                                       // an empty result per group

  // java.lang.Double.compare, not >: it totally orders NaN as the
  // greatest double, exactly like Spark's descending sort — plain >
  // is never true for NaN, which would leave the buffer unsorted and
  // make take(k) partition-order dependent. The +0.0 normalization
  // closes the one gap between the two orderings: Double.compare puts
  // -0.0 < 0.0 while Spark's sort treats them equal, so a -0.0 score
  // at the k boundary would otherwise rank differently from the
  // window-function form this aggregator is gated to match.
  private def norm(d: Double): Double = d + 0.0
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(norm(a.score), norm(b.score))
    c > 0 || (c == 0 && a.j < b.j)
  }

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], x: ScoredPair): List[Scored] =
    insert(buf, Scored(x.j, x.score))

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    val (pre, post) = buf.span(e => better(e, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: List[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[List[Scored]] =
    Encoders.kryo[List[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    Encoders.kryo[Seq[Scored]]
}
