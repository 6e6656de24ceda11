package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Distributed Bloom filter over 60-bit hashes: a typed `Aggregator`
  * builds the bitset (word-wise OR merge — a mergeable summary, so the
  * build is one partial-aggregation pass), and membership is pure
  * Column bit math against the broadcast-literal bitset — codegen'd,
  * map-only, no join. The classic runtime-filter play: when the probe
  * side of a semi-join is too big to broadcast as a hash relation, its
  * BLOOM FILTER still is (m/8 bytes regardless of element count), and
  * a `mightContain` prefilter drops non-candidates before the shuffle.
  * No false negatives ever; false positives are refined by the exact
  * join that follows (see [[graft.ml.Corpus.contaminationBloom]]).
  *
  * Probe arithmetic is the repo's Mersenne-prime affine family
  * (`Dedup.MinhashP` pattern): idx_i = ((a_i·(h mod P) + i + 1) mod P)
  * mod m with a_i = ((i+1)·2654435761) mod P. Every product stays
  * below 2^62, so the math is exact signed-64 in BOTH the JVM builder
  * and the Column evaluator under ANSI semantics — no wrap, no
  * engine divergence (the BandJoinRewrite overflow lesson).
  */
object BloomFilter {

  /** Per-probe affine coefficient a_i (< P). */
  private def coef(i: Int): Long =
    ((i + 1) * graft.ml.Dedup.MinhashA) % graft.ml.Dedup.MinhashP

  /** JVM-side probe index for insert (builder) and tests. */
  def probeIdx(h: Long, i: Int, mBits: Int): Int = {
    val p = graft.ml.Dedup.MinhashP
    val hm = h % p
    (((coef(i) * hm + i + 1) % p) % mBits).toInt
  }

  /** Column-side membership test against a driver-held bitset —
    * identical probe family to [[probeIdx]], all codegen-friendly
    * built-ins (the bitset ships to executors once, as a literal in
    * the plan, i.e. with the task binary — the broadcast path for
    * plan-constant data).
    */
  def mightContain(bloom: Array[Long], h: Column, k: Int,
      mBits: Int): Column = {
    val p = graft.ml.Dedup.MinhashP
    val words = typedLit(bloom.toSeq)
    val hm = h % p
    (0 until k).map { i =>
      val idx = ((lit(coef(i)) * hm + lit(i + 1L)) % p) % mBits
      // idx < 2^24 ≪ 2^53: the double division is exact, the cast
      // truncates — integer div without leaving codegen
      val word = element_at(words, (idx / 64L).cast("int") + 1)
      val bit = call_function("shiftrightunsigned", word,
        (idx % 64L).cast("int"))
      (bit.bitwiseAND(lit(1L)) === 1L)
    }.reduce(_ && _)
  }
}

/** Bitset builder: Aggregator[hash, bitset, bitset]. The buffer is a
  * primitive long array mutated in place (reduce/merge own their
  * buffers per Aggregator contract); merge is word-wise OR, so any
  * partial-aggregation tree yields the same bitset.
  */
class BloomFilterBuilder(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive x64")
  require(k > 0, "need at least one probe")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val idx = BloomFilter.probeIdx(h, i, mBits)
      buf(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
}
