package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incremental JOIN-view maintenance: keep a materialized inner
  * equi-join J = A ⋈ B up to date under insert-only deltas without
  * re-joining the stored sides — the join counterpart of
  * [[IncrementalAgg]] (aggregates) and `Dedup.simhashIncrement`
  * (near-dup pairs). The reference rebuilds its joined reporting
  * extract from scratch every sync cycle (PodioApiWrapper.py:109 page
  * loop re-reads everything); at 100 TB the A⋈B quadrant IS the cost,
  * and the delta algebra never touches it:
  *
  *   J(A ∪ dA, B ∪ dB) = J(A, B) ∪ (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)
  *
  * — the three delta quadrants partition the new rows exactly (each
  * result row pairs an old/new row from each side, and its quadrant is
  * determined by that pair), so the union needs no dedup. Induction
  * extends it to any batch sequence: maintain(maintain(J, d1), d2)
  * equals the full join of the total input.
  *
  * Scale shape: each delta quadrant has the (small) delta on one side,
  * so AQE broadcasts it against the stored table — three broadcast
  * joins proportional to |delta| · match-rate, zero shuffles of A or
  * B, and the stored view is append-only (dJ rows are written, old
  * files untouched — the same no-rewrite posture as the SCD2 merge
  * pruning and the appended IVF cells).
  */
object IncrementalJoin {

  /** The join-view delta for insert-only batches dA, dB against stored
    * snapshots A, B: every view row involving at least one new input
    * row, each exactly once. Any of the four frames may be empty
    * (e.g. a batch touching only one side). */
  def delta(oldA: DataFrame, dA: DataFrame, oldB: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    val k = keys.map(col)
    dA.join(oldB, keys)
      .unionByName(oldA.join(dB, keys))
      .unionByName(dA.join(dB, keys))
      .select((k ++ (oldA.columns ++ oldB.columns).distinct
        .filterNot(keys.contains).map(col)): _*)
  }

  /** Maintained view = stored view ∪ delta (append-only write). */
  def maintain(view: DataFrame, dJ: DataFrame): DataFrame =
    view.unionByName(dJ)
}
