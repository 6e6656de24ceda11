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
class SpaceSavingTopTerms(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)],
      Seq[(String, Long, Long)]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)], term: String)
      : Map[String, (Long, Long)] =
    buf.get(term) match {
      case Some((c, e)) => buf.updated(term, (c + 1, e))
      case None if buf.size < capacity => buf.updated(term, (1L, 0L))
      case None =>
        val (minT, (minC, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        (buf - minT).updated(term, (minC + 1, minC))
    }

  override def merge(a: Map[String, (Long, Long)],
      b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    // a full sketch bounds any untracked term's true count by its
    // minimum tracked count; a non-full sketch tracked everything it
    // saw, so absence there means count 0
    def floor(m: Map[String, (Long, Long)]): Long =
      if (m.size >= capacity) m.values.map(_._1).min else 0L
    val (fa, fb) = (floor(a), floor(b))
    val union = (a.keySet ++ b.keySet).iterator.map { t =>
      val (ca, ea) = a.getOrElse(t, (fa, fa))
      val (cb, eb) = b.getOrElse(t, (fb, fb))
      t -> (ca + cb, ea + eb)
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq
      .sortBy { case (t, (c, _)) => (-c, t) }
      .take(capacity)
      .toMap
  }

  override def finish(buf: Map[String, (Long, Long)])
      : Seq[(String, Long, Long)] =
    buf.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    Encoders.kryo[Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    Encoders.kryo[Seq[(String, Long, Long)]]
}
