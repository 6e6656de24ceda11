package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Four families, in increasing fuzziness: exact (hash groupBy), n-gram
  * Jaccard (inverted-index candidate join), MinHash+LSH (banded
  * signature join), SimHash (banded hamming join). All are expressed as
  * declarative plans — shuffles only on hash keys, never on raw text,
  * which is what survives a 100× scale-up: at 100 TB the shuffled keys
  * are 8-byte longs, the full documents stay columnar in parquet and
  * are only re-read for the final verify step.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * canonical. Shuffles 60-bit digests, not document bodies.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(HashUtils.hash60(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Per-document distinct word n-gram shingle sets. */
  def shingled(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      HashUtils.wordShingles(col("text"), n).as("shingles"))

  /** Near-dup pairs by exact n-gram Jaccard ≥ threshold, found via an
    * inverted-index join: explode shingles → self-join on shingle →
    * count common shingles per pair → Jaccard from |A|,|B|,|A∩B|.
    *
    * Scale: the candidate join is on the shingle hash (8 bytes); very
    * common shingles explode the pair count, so production adds a
    * document-frequency cap on shingles (drop shingles appearing in
    * > maxDf docs — they only generate junk candidates). We keep the
    * cap here too so the plan is the scale plan.
    */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      maxDf: Long = 1000L): DataFrame = {
    val sh = shingled(docs, n)
      .select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
      .select(col("doc_id"), col("n_sh"), HashUtils.hash60(col("sh")).as("h"))
    val rare = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val filtered = sh.join(rare.select("h"), Seq("h"))
    val a = filtered.select(col("doc_id").as("i"), col("n_sh").as("ni"), col("h"))
    val b = filtered.select(col("doc_id").as("j"), col("n_sh").as("nj"), col("h"))
    a.join(b, Seq("h")).filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"), col("ni"), col("nj"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("ni") + col("nj") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** MinHash signatures: k independent 60-bit hash functions, signature
    * element s_k = min over shingles of hash_k(shingle). Runs entirely
    * inside one projection — no shuffle, no UDF.
    */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int): DataFrame =
    shingled(docs, n)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"),
        transform(sequence(lit(0), lit(k - 1)),
          seed => array_min(transform(col("shingles"),
            s => HashUtils.hash60Seeded(s, seed)))).as("sig"))

  /** MinHash+LSH candidate pairs: split the k-signature into `bands`
    * bands of k/bands rows, hash each band, join documents sharing any
    * band bucket, then verify candidates with the exact Jaccard.
    *
    * The band join is an equi-join on (band_index, band_hash) — the
    * classic LSH bucket join that scales linearly in corpus size for
    * fixed bucket occupancy, vs the quadratic all-pairs compare.
    */
  def minhashPairs(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(docs, n, k)
    val banded = sigs.select(col("doc_id"), col("shingles"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws(",",
          slice(col("sig"), b * r + 1, lit(r))).cast("binary")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val a = banded.select(col("doc_id").as("i"), col("shingles").as("sh_i"),
      col("band"), col("bh"))
    val b = banded.select(col("doc_id").as("j"), col("shingles").as("sh_j"),
      col("band"), col("bh"))
    val cand = a.join(b, Seq("band", "bh")).filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("sh_i"), col("sh_j")).distinct()
    cand.withColumn("common",
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("double"))
      .withColumn("jaccard", round(col("common") /
        (size(col("sh_i")) + size(col("sh_j")) - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** 60-bit SimHash over word features: bit j of the signature is the
    * majority vote of bit j across all word hashes (ties → 1).
    * Pure SQL expression — aggregate over the bit positions.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"),
        transform(col("words"), w => HashUtils.hash60(w)).as("whashes"))
      .select(col("doc_id"),
        expr(
          """aggregate(sequence(0, 59), cast(0 as bigint), (acc, j) ->
            |  acc + if(size(filter(whashes,
            |      h -> (shiftright(h, j) % 2) = 1)) * 2 >= size(whashes),
            |    shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin)
          .as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found
    * via exact pigeonhole banding: split 60 bits into `bands` bands; two
    * signatures within hamming h < bands must agree on ≥1 whole band, so
    * an equi-join on (band_index, band_bits) finds every such pair —
    * LSH-shaped plan, exact result.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int, bands: Int = 12)
      : DataFrame = {
    require(maxHamming < bands, "pigeonhole needs maxHamming < bands")
    bandedPairs(simhash(docs), maxHamming, bands, 60 / bands)
  }

  private def bandedPairs(sh: DataFrame, maxHamming: Int, bands: Int,
      bits: Int): DataFrame = {
    // band b = bits [b*bits, (b+1)*bits) of the signature
    val bandCols = (0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        expr(s"(shiftright(simhash, ${bIdx * bits}) % ${1L << bits})")
          .as("band_bits"))
    }
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))
    val a = banded.select(col("doc_id").as("i"), col("simhash").as("sig_i"),
      col("band"), col("band_bits"))
    val b = banded.select(col("doc_id").as("j"), col("simhash").as("sig_j"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits")).filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("sig_i"), col("sig_j")).distinct()
      .withColumn("hamming",
        bit_count(expr("sig_i ^ sig_j")))
      .filter(col("hamming") <= maxHamming)
      .select(col("i"), col("j"), col("hamming"))
  }
}
