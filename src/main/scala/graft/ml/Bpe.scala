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
  def learn(docs: DataFrame, numMerges: Int,
      reliable: Boolean = false): DataFrame = {
    require(numMerges > 0, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct words with corpus frequencies, as space-joined symbol
    // strings bracketed by one space each side (the regex boundary)
    // checkpoint, NOT persist: each round must TRUNCATE lineage,
    // not just cache it — a persisted iterate still nests the whole
    // prior plan inside its InMemoryRelation, and by ~20 rounds the
    // accumulated analysis state OOMs the driver (reproduced at
    // sf0.01). Checkpointing collapses the iterate to an RDD scan so
    // plan size stays O(1) across rounds. `reliable = false` uses
    // localCheckpoint (executor-storage blocks — fast, lost with an
    // executor, right for local mode); `reliable = true` writes each
    // generation through checkpoint() to the fault-tolerant dir so a
    // 30k-merge training loop survives executor loss mid-run.
    // eager-checkpoint each generation and FREE the previous one —
    // the [[GenCheckpointer]] contract (storage blocks locally,
    // rdd-<id> snapshot dirs on disk under reliable=true; a 30k-merge
    // run would otherwise accumulate 30k stale corpus copies)
    val ckpt = new GenCheckpointer(spark, reliable)
    var words = ckpt.cut(docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" "))
        .as("syms"), col("freq")))
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
        words = ckpt.cut(words
          .withColumn("syms", regexp_replace(col("syms"), pat, rep)))
        rank += 1
      }
    }
    // the merge table is already on the driver; free the last
    // generation (storage blocks or checkpoint files) too
    ckpt.close()
    merges.result()
      .toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Segment text with a learned merge table, rank-ascending and
    * never across word boundaries (exactly the training semantics).
    * Two physical strategies behind one contract:
    *
    *  - ≤ `regexFoldLimit` merges: the regex fold — numMerges stacked
    *    regexp_replace calls collapsing into ONE codegen projection.
    *    Zero per-row interpretation overhead, but the expression tree
    *    is as deep as the merge table, and Catalyst's recursive
    *    analysis stack-overflows in the thousands — fine for the
    *    demo-sized tables the registry trains, fatal for a production
    *    30k-merge tokenizer.
    *  - beyond the limit: a typed map applying the same left-to-right
    *    non-overlapping merges imperatively per word (O(merges ·
    *    word_len), the standard encoder cost) with the merge table
    *    broadcast once. Still a single map stage, no shuffle; this is
    *    the legitimate per-row-imperative seam, like the image
    *    decoder.
    *
    * Both paths drop documents with no words and emit identical
    * (doc_id, tokens, n_tokens) rows — BpeSpec pins the equality.
    */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      regexFoldLimit: Int = 256): DataFrame =
    if (merges.length <= regexFoldLimit) segmentRegex(docs, merges)
    else segmentImperative(docs, merges)

  private def segmentImperative(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Array.newBuilder[String]
        text.split(" ").foreach { wd =>
          if (wd.nonEmpty) {
            var syms: Array[String] = wd.map(_.toString).toArray
            val ms = bc.value
            var mi = 0
            while (mi < ms.length) {
              val (l, r) = ms(mi)
              if (syms.length >= 2) {
                val b = Array.newBuilder[String]
                var i = 0
                var changed = false
                while (i < syms.length) {
                  if (i + 1 < syms.length && syms(i) == l &&
                      syms(i + 1) == r) {
                    b += (l + r); i += 2; changed = true
                  } else { b += syms(i); i += 1 }
                }
                if (changed) syms = b.result()
              }
              mi += 1
            }
            toks ++= syms
          }
        }
        val t = toks.result()
        if (t.isEmpty) None else Some((id, t, t.length))
      }.toDF("doc_id", "tokens", "n_tokens")
  }

  private def segmentRegex(docs: DataFrame,
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
