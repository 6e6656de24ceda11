package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (the All-Pairs /
  * PPJoin family): all document pairs whose n-gram shingle SETS have
  * Jaccard ≥ τ, with no df cap and no approximation — the exact-result
  * complement to [[Dedup.jaccardPairs]] (df-capped metric, posting
  * lists) and [[Dedup.minhashPairs]] (probabilistic recall).
  *
  * The scale lever is the prefix theorem: order every set by a global
  * token ordering (document frequency ascending, rarest first), take
  * each set's first |s| − ⌈τ·|s|⌉ + 1 tokens as its PREFIX, and any
  * pair with Jaccard ≥ τ must share at least one prefix token. So
  * candidate generation joins prefix tokens only — posting lists are
  * built from each document's RAREST tokens, whose document frequency
  * is by construction low, instead of from the full set universe where
  * one stop-word-like shingle with df = d would alone emit d² pairs.
  * Verification then computes exact Jaccard for the surviving
  * candidates from the full per-doc hash arrays.
  *
  * Cost shape at 100 TB: tokenize + df groupBy (one pass), a per-doc
  * window for the (df, hash) ordering (partitioned by doc_id — bounded
  * by doc length, never a global sort), the prefix-prefix equi-join
  * (shuffles 8-byte hashes of ~(1−τ) of each doc's tokens), and one
  * join back to the aggregated token arrays for candidates only. The
  * size filter τ·max ≤ min is applied before the distinct with a 1e-9
  * slack so a floating boundary can only ADMIT an extra candidate
  * (harmless — verification is exact), never drop a true pair.
  */
object SetSimJoin {

  /** @param docs      (doc_id, text)
    * @param n         shingle width in words
    * @param threshold exact Jaccard threshold τ in (0, 1]
    * @return (i, j, jaccard) with i < j, jaccard rounded to 6 dp
    */
  def prefixJaccardJoin(docs: DataFrame, n: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    // tokenize + md5-hash ONCE: tok feeds THREE consumers (the df
    // aggregate, the ordered prefix derivation, and the verification
    // arrays) — without the cut each re-runs the shingle explode and
    // per-shingle md5 from the source scan (the ns22 materialization
    // discipline)
    val tok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(HashUtils.wordShingles(col("text"), n)).as("s"))
      .select(col("doc_id"), HashUtils.hash60(col("s")).as("h"))
      .localCheckpoint()
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // rarest-first position within each doc; ties broken by hash so
    // the ordering is total and identical on every executor
    val ordered = tok.join(dfreq, Seq("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("h"))))
      .withColumn("sz", count(lit(1)).over(
        Window.partitionBy(col("doc_id"))))
    // prefix length |s| - ceil(tau*|s|) + 1; the 1e-9 nudge keeps a
    // floating tau*|s| that lands an ulp ABOVE an exact integer from
    // shortening the prefix (losing a true pair) — it can only ever
    // lengthen it by one token
    // The prefix table feeds BOTH sides of the candidate self-join,
    // and its derivation (df aggregate + join + two doc-partitioned
    // windows) canonicalizes differently under each side's renames, so
    // ReuseExchange cannot dedup it — without a cut the whole window
    // front executes twice (measured: doubled Window/HashAggregate
    // subtrees in the ns39 before plan). The prefix rows are the SMALL
    // end of the operator (~(1−τ)·|s|+1 tokens per doc, 3 narrow
    // columns), so materializing once is the right trade at any scale.
    val prefix = ordered.filter(col("pos") <=
      col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("h"), col("sz"))
      .localCheckpoint()
    val cand = prefix.select(col("doc_id").as("i"), col("h"),
        col("sz").as("sz_i"))
      .join(prefix.select(col("doc_id").as("j"), col("h"),
        col("sz").as("sz_j")), Seq("h"))
      .filter(col("i") < col("j"))
      .filter(lit(threshold) * greatest(col("sz_i"), col("sz_j")) <=
        least(col("sz_i"), col("sz_j")) + lit(1e-9))
      .select(col("i"), col("j")).distinct()
    val sets = tok.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"))
    cand
      .join(sets.select(col("doc_id").as("i"), col("hs").as("hs_i")),
        Seq("i"))
      .join(sets.select(col("doc_id").as("j"), col("hs").as("hs_j")),
        Seq("j"))
      .withColumn("common",
        size(array_intersect(col("hs_i"), col("hs_j"))).cast("double"))
      .withColumn("jaccard", round(col("common") /
        (size(col("hs_i")) + size(col("hs_j")) - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }
}
