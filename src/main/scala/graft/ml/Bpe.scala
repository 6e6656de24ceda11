package graft.ml

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training — the tokenizer-fitting step
  * of an LLM data pipeline (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016), run as
  * distributed algebra over the word-frequency table.
  *
  * Shape per merge round: ONE weighted pair-count aggregate over the
  * distinct-word table (explode adjacent symbol pairs × word
  * frequency, groupBy pair) and ONE codegen'd projection applying the
  * winning merge. The only driver action per round is the 1-row
  * argmax collect — the word table itself never leaves the cluster,
  * and its size is the DISTINCT vocabulary (millions of rows at
  * 100 TB, not the corpus token count, which only feeds the initial
  * frequency groupBy).
  *
  * The merge application is a regexp_replace on the space-joined
  * symbol string: the pattern ` \Qx\E \Qy\E(?= )` consumes the left
  * symbol and its separator but only LOOKS AT the trailing one, so
  * java.util.regex's replaceAll applies exactly the left-to-right
  * non-overlapping semantics BPE specifies ("a a a" merges to
  * "aa a", "x y x y" to "xy xy"). No UDF, no typed map — the hot
  * path stays inside whole-stage codegen.
  *
  * Ties (equal pair count) break lexicographically on (left, right),
  * making the learned table deterministic across partitionings and
  * engines.
  */
object Bpe {

  /** Learned merge table: rank-ordered pairs with their counts. */
  def learn(docs: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges > 0, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct words with corpus frequencies, as space-joined symbol
    // strings bracketed by one space each side (the regex boundary)
    // localCheckpoint, NOT persist: each round must TRUNCATE lineage,
    // not just cache it — a persisted iterate still nests the whole
    // prior plan inside its InMemoryRelation, and by ~20 rounds the
    // accumulated analysis state OOMs the driver (reproduced at
    // sf0.01). Checkpointing collapses the iterate to an RDD scan so
    // plan size stays O(1) across rounds; on a multi-executor cluster
    // the reliable checkpoint() variant trades speed for surviving
    // executor loss mid-loop.
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" "))
        .as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    while (rank < numMerges) {
      val syms = split(trim(col("syms")), " ")
      val best = words
        // fully-merged single-symbol words have no pairs; the guard
        // also keeps ANSI sequence() from the descending [0,-1] trap
        .filter(size(syms) >= 2)
        .select(explode(transform(sequence(lit(0), size(syms) - 2),
          i => struct(element_at(syms, i + 1).as("l"),
            element_at(syms, i + 2).as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1) // bounded driver action: exactly one argmax row
      if (best.isEmpty) rank = numMerges // all words fully merged
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, cnt))
        val pat = " " + Pattern.quote(l) + " " + Pattern.quote(r) + "(?= )"
        val rep = Matcher.quoteReplacement(" " + l + r)
        words = words
          .withColumn("syms", regexp_replace(col("syms"), pat, rep))
          .localCheckpoint(true) // eager: one bounded job per round
        rank += 1
      }
    }
    merges.result()
      .toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Segment text with a learned merge table: words explode with
    * their position (merges never cross word boundaries, exactly as
    * in training), the rank-ascending regex fold stacks numMerges
    * regexp_replace calls into ONE codegen projection, and the
    * per-doc token stream reassembles order-deterministically via
    * array_sort on (position, tokens). One explode + one groupBy —
    * no other shuffle.
    */
  def segment(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val w = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("pos"), concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" "))
        .as("syms"))
    val seg = merges.foldLeft(w) { case (df, (l, r)) =>
      df.withColumn("syms", regexp_replace(col("syms"),
        " " + Pattern.quote(l) + " " + Pattern.quote(r) + "(?= )",
        Matcher.quoteReplacement(" " + l + r)))
    }
    seg
      .select(col("doc_id"),
        struct(col("pos"), split(trim(col("syms")), " ").as("toks"))
          .as("pt"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(array_sort(collect_list(col("pt"))),
        s => s.getField("toks"))).as("tokens"))
      .select(col("doc_id"), col("tokens"),
        size(col("tokens")).as("n_tokens"))
  }
}
