package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the r6 chunking / weighted-sampling / edit-distance
  * operators, each asserted against a brute-force restatement on
  * synthetic edge-case data (the sf oracles cover the bulk data).
  */
class ChunkSampleSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens covers every word, only the tail chunk is short, " +
    "and the chunk count matches the closed form") {
    val chunkSize = 5
    val stride = 3
    // n spanning: empty-ish, n<size, n==size, n==size+1, multiple-of-
    // stride tail, exact cover
    val docs = Seq(1 -> 1, 2 -> 4, 3 -> 5, 4 -> 6, 5 -> 11, 6 -> 17)
      .map { case (id, n) =>
        (id.toLong, (1 to n).map(i => s"w$i").mkString(" "))
      }.toDF("doc_id", "text")
    val out = Corpus.chunkTokens(docs, chunkSize, stride)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val n = r.getString(1).split(" ").length
      val chunks = out(id).sortBy(_._2)
      val expectK =
        if (n <= chunkSize) 0
        else math.ceil((n - chunkSize).toDouble / stride).toLong
      assert(chunks.map(_._2).toSeq == (0L to expectK),
        s"doc $id (n=$n): chunk indices")
      chunks.foreach { case (_, idx, nTok) =>
        val start = idx * stride // 0-based
        val expectLen = math.min(chunkSize.toLong, n - start)
        assert(nTok == expectLen, s"doc $id chunk $idx length")
      }
      // coverage: last chunk must reach the last word
      val lastStart = expectK * stride
      assert(lastStart + chunks.last._3 == n, s"doc $id tail coverage")
    }
  }

  test("chunkTokens rejects invalid window parameters") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Corpus.chunkTokens(docs, 0, 1))
    intercept[IllegalArgumentException](Corpus.chunkTokens(docs, 4, 0))
    intercept[IllegalArgumentException](Corpus.chunkTokens(docs, 4, 5))
  }

  test("weightedSample is deterministic and matches the brute A-ES " +
    "ranking") {
    val rows = (1 to 500)
      .map(i => (i.toLong, if (i % 7 == 0) 100.0 else 1.0))
      .toDF("id", "w")
    val got = Corpus.weightedSample(rows, "id", col("w"), 50, "t")
      .select("id").as[Long].collect().sorted.toSeq
    val again = Corpus.weightedSample(rows, "id", col("w"), 50, "t")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == again, "same salt must reproduce the same sample")
    // brute restatement of ln(u)/w over the same hash-uniforms
    val brute = rows
      .withColumn("_u", (graft.ml.HashUtils.hash60(
        concat(lit("t:"), col("id").cast("string"))) + 1)
        .cast("double") / lit(1152921504606846976.0))
      .withColumn("_k", log(col("_u")) / col("w"))
      .orderBy(col("_k").desc, col("id"))
      .limit(50).select("id").as[Long].collect().sorted.toSeq
    assert(got == brute, "top-k under the A-ES key")
    // weight sensitivity: the 100x-weighted ids (71 of 500) should
    // dominate a 50-row sample overwhelmingly
    assert(got.count(_ % 7 == 0) >= 40,
      s"heavy ids underrepresented: ${got.count(_ % 7 == 0)}/50")
    // different salt → different draw
    val other = Corpus.weightedSample(rows, "id", col("w"), 50, "u")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got != other, "salt must perturb the draw")
  }

  test("editDistancePairs finds exactly the brute-force distance<=1 " +
    "pairs (substitution, insert, delete; no transposition leak)") {
    val strings = Seq("cat", "cut", "cart", "ca", "dog", "dig", "dogs",
      "act", // transposition of cat: distance 2, must NOT pair
      "xyz", "cat") // duplicate input collapses
    val rows = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    val got = Dedup.editDistancePairs(rows, "name")
      .as[(String, String)].collect().toSet
    val distinct = strings.distinct
    val brute = (for {
      a <- distinct; b <- distinct
      if a < b
    } yield (a, b)).filter { case (a, b) =>
      // classic DP Levenshtein
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length) <= 1
    }.toSet
    assert(got == brute,
      s"missing=${brute -- got} extra=${got -- brute}")
    assert(!got.contains(("act", "cat")), "transpositions are distance 2")
  }

  test("editDistancePairs maxVariantDf cap: generous cap is exact, " +
    "binding cap drops only dense-family pairs") {
    // a dense family: k0..k9 all share the deletion variant "k" (df
    // 10) plus pairwise substitution variants (df 2); an isolated pair
    // far from the family survives any cap >= 2
    val strings = (0 to 9).map(i => s"k$i") ++ Seq("solo", "soloX")
    val rows = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    val exact = Dedup.editDistancePairs(rows, "name")
      .as[(String, String)].collect().toSet
    // cap far above every bucket: identical to exact
    val generous = Dedup.editDistancePairs(rows, "name", Some(100))
      .as[(String, String)].collect().toSet
    assert(generous == exact, "non-binding cap must not change results")
    // cap=5: the shared "k" variant (df 10) is dropped, but each kI/kJ
    // substitution pair still shares the "delete position 2" variant
    // "k" — no wait, deleting the digit leaves "k" for all; deleting
    // "k" leaves the digit (df 1 each). kI~kJ differ in position 2
    // (substitution), witnessed by variant "k" ONLY → all family pairs
    // drop; solo~soloX (insertion, witnessed by "solo" itself, df 2)
    // survives.
    val capped = Dedup.editDistancePairs(rows, "name", Some(5))
      .as[(String, String)].collect().toSet
    assert(capped.contains(("solo", "soloX")),
      "pair outside hot buckets must survive the cap")
    assert(capped == exact.filterNot { case (a, b) =>
      a.startsWith("k") && b.startsWith("k") },
      s"capped=$capped")
  }
}
