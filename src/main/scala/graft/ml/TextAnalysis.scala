package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column math over the `documents` table — per-row, embarrassingly
  * parallel, no shuffle at all (the ideal 100 TB shape: map-only over
  * columnar scans).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language classifier. Deliberately small and hardcoded — the
    * classifier is a deterministic heuristic, not a model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  private def words(text: Column): Column = split(text, " ")

  /** Count of word occurrences belonging to a fixed set (duplicates
    * counted — avoids engine-specific set semantics in the oracle).
    */
  private def hits(text: Column, set: Seq[String]): Column =
    size(filter(words(text), w => w.isin(set: _*)))

  /** Per-language score: token hits for space-delimited languages,
    * CHARACTER-occurrence counts for zh — Chinese text is unsegmented
    * (no spaces), so token matching against single-character stopwords
    * can never fire; counting stopword-character occurrences is the
    * segmentation-free equivalent. Single-char removal via translate
    * keeps it mirrorable in the DuckDB oracle (replace).
    */
  def langScore(text: Column, code: String): Column =
    if (code == "zh")
      stopwords(code).map(ch =>
        length(text) - length(translate(text, ch, ""))).reduce(_ + _)
    else hits(text, stopwords(code))

  /** Heuristic language ID: stopword-score argmax per language (see
    * [[langScore]]) with deterministic tiebreak (alphabetically-first
    * language code wins ties); 'und' (undetermined) when nothing
    * matches.
    */
  def langId(text: Column): Column = {
    val codes = stopwords.keys.toSeq.sorted
    val scores = codes.map(c => langScore(text, c))
    val mx = greatest(scores: _*)
    codes.zip(scores).foldLeft(when(mx === 0, lit("und"))) {
      case (acc, (code, score)) => acc.when(score === mx, lit(code))
    }.otherwise(lit("und"))
  }

  /** Quality metrics per document: char length, word count, average
    * word length, punctuation ratio, English-stopword ratio, and a
    * composite [0,1] `quality_score` (the usual pre-training quality
    * gates): mean of length sufficiency (≥100 words saturates),
    * low-punctuation (ratio ≥ 0.25 zeroes the term), and natural-
    * language stopword density (ratio ≥ 1/3 saturates). Computed from
    * the ROUNDED ratio columns so the oracle's floats are bit-identical
    * inputs; null (unscorable empty doc) when punct_ratio is null.
    */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val text = col("text")
    val w = words(text)
    val nChars = length(text)
    val nWords = size(w)
    val avgWordLen = round(
      aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("double")
        / nWords, 4)
    // guarded: an empty doc (the thing a quality gate exists to score)
    // must yield a null ratio, not a 0/0 NaN that poisons downstream
    // comparisons — and engines disagree on 0/0 rendering
    val punct = when(nChars > 0, round(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
        .cast("double") / nChars, 4))
    val stopRatio = round(
      size(filter(w, x => x.isin(stopwords("en"): _*)))
        .cast("double") / nWords, 4)
    val base = docs.select(col("doc_id"), nChars.as("n_chars_calc"),
      nWords.as("n_words"), avgWordLen.as("avg_word_len"),
      punct.as("punct_ratio"), stopRatio.as("stopword_ratio"))
    // the punct term is guarded with `when` rather than relying on
    // least(null, …): Spark's least SKIPS nulls while the null must
    // make the whole score null — and the 1e-9 nudge keeps round()
    // off the .xxxx5 shortest-decimal boundary both engines round
    // differently (the q7 money-division discipline)
    base.withColumn("quality_score",
      round(((least(col("n_words").cast("double") / 100.0, lit(1.0))
        + when(col("punct_ratio").isNotNull,
            lit(1.0) - least(col("punct_ratio") * 4.0, lit(1.0)))
        + least(col("stopword_ratio") * 3.0, lit(1.0))) / 3.0)
        + 1e-9, 4))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single other non-space chars).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("re_tokens"))

  /** Canonical fingerprint (OpenRefine-style): md5 of the
    * sorted-distinct-word normalization — equal for any word-order or
    * duplicate-word variation of the same content.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(lower(text)))))
      .cast("binary"))

  /** Deterministic train/val/test split assignment: bucket =
    * hash(doc_id) mod 100, split by cumulative percentage. Hash-mod,
    * not `df.sample` — reproducible across runs/engines/cluster sizes
    * and stable under repartitioning, which is what a training
    * pipeline actually needs from a split.
    */
  def splitAssign(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val bucket = pmod(HashUtils.hash60(id.cast("string")), lit(100))
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Near-dup-leakage-free train/val/test split: [[splitAssign]]
    * keyed on the duplicate CLUSTER's id (from [[Dedup.clusters]])
    * instead of the document's own, so every member of a near-dup
    * cluster lands on the SAME side of the boundary — a per-doc hash
    * split leaks test content into training whenever a near-copy of
    * a test doc exists, and at web-corpus dup rates that is the rule,
    * not the edge case. `members` needs (doc_id, cluster_id); output
    * (doc_id, cluster_id, split) one row per doc. Singleton clusters
    * (cluster_id = doc_id under the min-label convention) degrade to
    * exactly the per-doc split, so the operator is a strict
    * refinement, not a different sampler. Map-only over the cluster
    * assignment — the split itself adds no shuffle.
    */
  def splitByCluster(members: DataFrame, trainPct: Int = 90,
      valPct: Int = 5): DataFrame =
    members.select(col("doc_id"), col("cluster_id"),
      splitAssign(col("cluster_id"), trainPct, valPct).as("split"))

  /** Deterministic stratified downsample: keep at most `perStratum`
    * docs per stratum, chosen by hash order (stable, engine-agnostic) —
    * the balanced-corpus sampler. Returns the kept rows.
    *
    * Rank via [[Corpus.cappedHashRank]]'s two-level bucket scheme, not
    * a per-stratum global window: strata are low-cardinality (a few
    * dozen languages), so the naive window would sort an entire
    * stratum in ONE task at 100 TB. Bit-identical results either way —
    * the ns17 oracle states the naive rank and still passes.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      perStratum: Int): DataFrame = {
    val targets = docs.select(col(stratumCol)).distinct()
      .withColumn("n_target", lit(perStratum.toLong))
    Corpus.cappedHashRank(docs, "doc_id", Seq(stratumCol), targets)
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Rolling polynomial hash over words (Rabin-Karp-flavored): a cheap
    * order-sensitive fingerprint, as a single fold. h = (h*31 +
    * hash60(word)) mod 2^40 in word order. The 2^40 modulus keeps every
    * intermediate below 2^63 so neither engine overflows signed 64-bit
    * (DuckDB errors on BIGINT overflow; JVM longs would silently wrap).
    */
  def rollingHash(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => pmod(acc * 31 + HashUtils.hash60(w), lit(1L << 40)))

  /** Canonical URL form for crawl dedup — the pre-pass a web corpus
    * runs before content near-dup (two fetches of one page under
    * trivially different URLs are EXACT duplicates; catching them by
    * URL is a map-only string rewrite, no shingles, no index): strip
    * the fragment, lowercase scheme and host, drop the scheme's
    * default port (http:80 / https:443), collapse trailing path
    * slashes (root stays `/`, an empty path becomes `/`), drop
    * `utm_*` tracking parameters, and sort the surviving query
    * parameters byte-wise (`?b=1&a=2` ≡ `?a=2&b=1` — order is
    * serving-stack noise). Pure codegen Column algebra (regexes +
    * the filter/array_sort/array_join higher-order builtins) — the
    * TextAnalysis map-only shape, linear in URLs at any corpus size.
    * Percent-encoding is deliberately NOT normalized: decoding can
    * change semantics (`%2F` vs `/`) and crawlers disagree — a
    * deployment wanting it composes its own decode in front. A value
    * with no `scheme://` (scheme-relative `//cdn…`, bare
    * `www.a.com/x`, `mailto:…`) passes through VERBATIM rather than
    * collapsing — every unparseable record canonicalizing to one
    * junk value would silently merge unrelated pages in the dedup
    * this feeds; a deployment wanting scheme-defaulting composes it
    * in front.
    */
  def canonicalizeUrl(url: Column): Column = {
    val base = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(
      regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmedPath = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val query = regexp_extract(base, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val qstr = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", trim(url))
      .otherwise(concat(scheme, lit("://"), host, path, qstr))
  }
}
