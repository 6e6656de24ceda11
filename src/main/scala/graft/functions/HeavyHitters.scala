package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Space-saving heavy-hitters sketch (Metwally/Agrawal/El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a typed `Aggregator` — the scale path for
  * vocabulary / frequent-term queries when the distinct-term universe
  * no longer fits an exact groupBy (at 100 TB the term dictionary
  * alone can be billions of entries; the sketch is O(capacity) per
  * partition and per merge).
  *
  * State: at most `capacity` (term → (count, err)) entries. On
  * overflow the minimum-count entry is evicted and the newcomer
  * inherits its count + 1 with `err` = the evicted count (the classic
  * overestimate bound). Guarantees after any merge sequence:
  *  - estimated count ≥ true count (never undercounts),
  *  - estimated − err ≤ true count (err bounds the overcount),
  *  - any term with true count > N/capacity is present in the sketch.
  *
  * Merge follows the mergeable-summaries rule (Agarwal et al., PODS
  * 2012): a term absent from one side is credited that side's minimum
  * tracked count (a full sketch proves nothing smaller — the term may
  * have occurred up to min times there), with the same amount added to
  * err; then the union re-truncates to capacity by count. This keeps
  * both bounds through arbitrary partial-aggregation trees, which a
  * naive count-union does NOT (it silently undercounts terms evicted
  * on one side).
  */
/** Sketch buffer: the (term → (count, err)) map plus a (count, term)
  * sorted index, kept in lockstep so the eviction victim (minimum
  * count, term tiebreak) is an O(log c) head lookup instead of an
  * O(c) scan — the hot path is an UNSEEN term arriving at a FULL
  * sketch, which in the long-tailed huge-vocabulary regime this class
  * exists for is most tokens; an O(c) victim scan there would make
  * reduce O(tokens·capacity), slower than the exact groupBy the
  * sketch replaces.
  */
case class SpaceSavingBuf(m: Map[String, (Long, Long)],
    byCount: scala.collection.immutable.TreeSet[(Long, String)])

class SpaceSavingTopTerms(capacity: Int)
    extends Aggregator[String, SpaceSavingBuf, Seq[(String, Long, Long)]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: SpaceSavingBuf =
    SpaceSavingBuf(Map.empty,
      scala.collection.immutable.TreeSet.empty[(Long, String)])

  override def reduce(buf: SpaceSavingBuf, term: String): SpaceSavingBuf =
    buf.m.get(term) match {
      case Some((c, e)) =>
        SpaceSavingBuf(buf.m.updated(term, (c + 1, e)),
          buf.byCount - ((c, term)) + ((c + 1, term)))
      case None if buf.m.size < capacity =>
        SpaceSavingBuf(buf.m.updated(term, (1L, 0L)),
          buf.byCount + ((1L, term)))
      case None =>
        val (minC, minT) = buf.byCount.head
        SpaceSavingBuf((buf.m - minT).updated(term, (minC + 1, minC)),
          buf.byCount - ((minC, minT)) + ((minC + 1, term)))
    }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf)
      : SpaceSavingBuf = {
    // a full sketch bounds any untracked term's true count by its
    // minimum tracked count; a non-full sketch tracked everything it
    // saw, so absence there means count 0
    def floor(x: SpaceSavingBuf): Long =
      if (x.m.size >= capacity) x.byCount.head._1 else 0L
    val (fa, fb) = (floor(a), floor(b))
    val union = (a.m.keySet ++ b.m.keySet).iterator.map { t =>
      val (ca, ea) = a.m.getOrElse(t, (fa, fa))
      val (cb, eb) = b.m.getOrElse(t, (fb, fb))
      t -> (ca + cb, ea + eb)
    }.toMap
    val kept =
      if (union.size <= capacity) union
      else union.toSeq
        .sortBy { case (t, (c, _)) => (-c, t) }
        .take(capacity)
        .toMap
    SpaceSavingBuf(kept,
      scala.collection.immutable.TreeSet(
        kept.iterator.map { case (t, (c, _)) => (c, t) }.toSeq: _*))
  }

  override def finish(buf: SpaceSavingBuf): Seq[(String, Long, Long)] =
    buf.m.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }

  override def bufferEncoder: Encoder[SpaceSavingBuf] =
    Encoders.kryo[SpaceSavingBuf]

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    Encoders.kryo[Seq[(String, Long, Long)]]
}
