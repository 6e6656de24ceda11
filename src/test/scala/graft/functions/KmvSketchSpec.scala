package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Encoders

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-hash stream: distinct positive longs in the
    * hash60 range, well-scattered (multiplicative hashing by an odd
    * constant mod 2^60 is a bijection on the low 60 bits, so values
    * never collide).
    */
  private def scat(i: Long): Long =
    (i * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1)

  test("the aggregated sketch is exactly the k smallest distinct " +
      "hashes, regardless of partitioning and duplication") {
    val k = 32
    val vals = (1L to 500L).map(scat)
    // duplicate every value 3x and shuffle deterministically across
    // many partitions: reduce-side dedup and merge both get exercised
    val dup = (vals ++ vals ++ vals).sortBy(v => scat(v + 7))
    val df = dup.toDF("h").repartition(13)
    val kmv = F.udaf(new KmvSketch(k), Encoders.scalaLong)
    val got = df.agg(kmv(F.col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(got === vals.distinct.sorted.take(k))
  }

  test("a group with fewer than k distinct values yields its exact " +
      "sorted distinct set") {
    val k = 64
    val vals = Seq(9L, 3L, 9L, 1L, 3L)
    val kmv = F.udaf(new KmvSketch(k), Encoders.scalaLong)
    val got = vals.toDF("h").agg(kmv(F.col("h")))
      .collect()(0).getSeq[Long](0)
    assert(got === Seq(1L, 3L, 9L))
  }

  test("merge is a deduplicating sorted-set union capped at k") {
    val agg = new KmvSketch(4)
    val a = Array(1L, 5L, 9L)
    val b = Array(1L, 2L, 9L, 11L)
    // shared minima 1 and 9 collapse; cap keeps the 4 smallest
    assert(agg.merge(a, b).toSeq === Seq(1L, 2L, 5L, 9L))
    assert(agg.merge(b, a).toSeq === Seq(1L, 2L, 5L, 9L))
    assert(agg.merge(a, Array.emptyLongArray).toSeq === a.toSeq)
    assert(agg.merge(Array.emptyLongArray, b).toSeq === b.toSeq)
  }

  test("(k-1)/r_k estimates the distinct count within 15% at k=256 " +
      "over 20k uniform hashes") {
    val k = 256
    val n = 20000
    val agg = new KmvSketch(k)
    // single-reduce path plus a chunked merge path must agree
    val hashes = (1L to n.toLong).map(scat)
    val direct = hashes.foldLeft(agg.zero)(agg.reduce)
    val merged = hashes.grouped(997)
      .map(ch => ch.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(direct.toSeq === merged.toSeq)
    val rk = (direct(k - 1) + 1).toDouble / math.pow(2.0, 60)
    val est = (k - 1).toDouble / rk
    assert(math.abs(est - n) / n < 0.15,
      s"estimate $est too far from $n")
  }
}
