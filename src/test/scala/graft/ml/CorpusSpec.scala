package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("contamination flags exactly the train docs sharing a 5-gram " +
      "with the eval set, with correct counts and ratio") {
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // contains "alpha beta gamma delta epsilon" (1 of its 2 5-grams)
      (1L, "alpha beta gamma delta epsilon other"),
      (2L, "totally unrelated words in this training document here"),
      (3L, "too short")).toDF("doc_id", "text")
    val out = Corpus.contamination(train, eval, n = 5).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    val r = out.head
    assert(r.getAs[Long]("n_contaminated") === 1L)
    assert(r.getAs[Long]("n_ngrams") === 2L)
    assert(r.getAs[Double]("contamination_ratio") === 0.5)
  }

  test("vocabulary ranks by document frequency with total counts") {
    val docs = Seq(
      (1L, "red red blue"),
      (2L, "red green"),
      (3L, "blue green")).toDF("doc_id", "text")
    val v = Corpus.vocabulary(docs, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // blue/green/red all have df=2; red wins on total=3, then tiebreak
    // blue < green on term
    assert(v.toSeq === Seq(("red", 2L, 3L), ("blue", 2L, 2L)))
  }

  test("packSequences chunks cumulative tokens at the context length " +
      "and never splits a doc's assignment nondeterministically") {
    val docs = Seq(
      (1L, Seq.fill(6)("w").mkString(" ")),   // 6 toks, before=0  -> chunk 0
      (2L, Seq.fill(5)("w").mkString(" ")),   // 5 toks, before=6  -> chunk 0
      (3L, Seq.fill(4)("w").mkString(" ")),   // 4 toks, before=11 -> chunk 1
      (4L, Seq.fill(10)("w").mkString(" ")),  // 10 toks, before=15 -> chunk 1
      (5L, Seq.fill(1)("w").mkString(" "))    // 1 tok, before=25  -> chunk 2
    ).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, ctxLen = 10, shards = 1)
      .orderBy("chunk")
      .collect().map(r => (r.getAs[Long]("chunk"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("chunk_tokens"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc")))
    assert(out.toSeq === Seq(
      (0L, 2L, 11L, 1L, 2L),
      (1L, 2L, 14L, 3L, 4L),
      (2L, 1L, 1L, 5L, 5L)))
  }

  test("space-saving sketch: never undercounts, bounds the overcount, " +
      "and retains every guaranteed-frequent term under tight capacity") {
    val rnd = new scala.util.Random(7L)
    // zipf-ish skew: term_i appears ~ 600/i times across many docs
    val terms = (1 to 60).flatMap(i => Seq.fill(600 / i)(s"t$i"))
    val shuffled = rnd.shuffle(terms)
    val docs = shuffled.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val truth = terms.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val n = terms.length.toLong
    val capacity = 24
    val sketch = Corpus.vocabularySketch(docs, capacity, capacity)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val est = sketch.map { case (t, c, _) => t -> c }.toMap
    sketch.foreach { case (t, c, e) =>
      assert(c >= truth(t), s"$t undercounted")
      assert(c - e <= truth(t), s"$t overcount exceeds err bound")
    }
    // guaranteed retention: true count > N/capacity ⇒ present
    truth.filter(_._2 > n / capacity).keys.foreach { t =>
      assert(est.contains(t), s"frequent term $t evicted")
    }
  }

  test("bigramLogProb matches the hand-computed interpolated LM on a " +
      "tiny corpus and drops sub-bigram docs") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, "b a"),
      (3L, "solo")).toDF("doc_id", "text")
    // corpus counts over docs 1-3: bigrams {a b: 1, b a: 2};
    // unigrams {a: 3, b: 2, solo: 1}, N = 6
    val n = 6.0
    val pAb = 0.75 * 1.0 / 3.0 + 0.25 * 2.0 / n
    val pBa = 0.75 * 2.0 / 2.0 + 0.25 * 3.0 / n
    val out = Corpus.bigramLogProb(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("lm2_score")))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (1L, 2L, r6((math.log(pAb) + math.log(pBa)) / 2.0)),
      (2L, 1L, r6(math.log(pBa)))))
  }

  test("packSequences shards are deterministic and partition the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Corpus.packSequences(docs, 2048, 8)
    assert(packed.agg(sum("n_docs")).as[Long].head() === docs.count())
    val again = Corpus.packSequences(docs, 2048, 8)
    assert(packed.orderBy("shard", "chunk").collect().toSeq ===
      again.orderBy("shard", "chunk").collect().toSeq)
  }

  test("shufflePositions is a stable seeded permutation: positions " +
      "are exactly 1..N, runs repeat, seeds decorrelate") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"))
    val n = docs.count()
    val p1 = Corpus.shufflePositions(docs, "doc_id", "epoch0")
    // a permutation: N rows, distinct positions, min 1, max N
    val st = p1.agg(count(lit(1)).as("n"),
      countDistinct(col("position")).as("d"),
      min(col("position")).as("lo"), max(col("position")).as("hi"))
      .collect()(0)
    assert(st.getLong(0) === n && st.getLong(1) === n
      && st.getLong(2) === 1L && st.getLong(3) === n)
    // deterministic across runs
    val p2 = Corpus.shufflePositions(docs, "doc_id", "epoch0")
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
    // a different seed is a genuinely different permutation (equal
    // only with probability ~ 1/N! — any agreement beyond chance on
    // 500 docs would mean the seed never entered the hash)
    val q = Corpus.shufflePositions(docs, "doc_id", "epoch1")
    val same = p1.join(q, Seq("doc_id", "position"), "left_semi").count()
    assert(same < n / 10,
      s"seed change left $same of $n docs at the same position")
    // reserved working names are rejected loudly
    intercept[IllegalArgumentException] {
      Corpus.shufflePositions(docs.withColumn("position", lit(1)),
        "doc_id", "s")
    }
  }

  test("bottomKSample merges losslessly over any split and caps at k") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"))
    val full = Corpus.bottomKSample(docs, "doc_id", 20, "s")
    assert(full.count() === 20L)
    // mergeability: bottom-k of (bottom-k(left) U right) == bottom-k
    // of the whole, for an arbitrary uneven split
    val left = Corpus.bottomKSample(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", 20, "s")
    val merged = Corpus.mergeBottomK(left,
      docs.filter(col("doc_id") % 3 === 0), "doc_id", 20, "s")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merged bottom-k diverges from the from-scratch sample")
    // a different seed selects a (almost surely) different slice
    val other = Corpus.bottomKSample(docs, "doc_id", 20, "t")
    assert(other.join(full, Seq("doc_id"), "left_semi").count() < 15)
    // k larger than the corpus returns everything
    assert(Corpus.bottomKSample(docs.limit(5), "doc_id", 20, "s")
      .count() === 5L)
  }

  test("userHistories keeps the LAST maxLen events in time order " +
      "with event_id tie-break and a sorted-fold value sum") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val ev = Seq(
      // user 1: 4 events, maxLen 3 keeps the 3 most recent; two
      // events share a timestamp — event_id breaks the tie both for
      // the recency cut and the sequence order
      (1L, ts(0), 10L, "view", 1.0),
      (1L, ts(1), 11L, "click", 2.0),
      (1L, ts(2), 12L, "cart", 4.0),
      (1L, ts(2), 13L, "purchase", 8.0),
      (2L, ts(5), 20L, "view", 0.5))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Corpus.userHistories(ev, maxLen = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 4L && out(1L).getLong(2) === 3L)
    // kept = the 3 most recent (click, cart, purchase), emitted in
    // ascending (ts, event_id) order
    assert(out(1L).getString(3) === "click cart purchase")
    assert(out(1L).getDouble(4) === 14.0)
    assert(out(2L).getLong(1) === 1L
      && out(2L).getString(3) === "view")
  }

  test("negativeSamples never collides with a positive, fills k when " +
      "the space allows, and shortfalls honestly when it cannot") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // user 1 bought items 1..10 of a 20-item space; user 2 bought ALL
    val inter = ((1L to 10L).map(i => (1L, i))
      ++ (1L to 20L).map(i => (2L, i))).toDF("user_id", "item_id")
    val users = Seq(1L, 2L).toDF("user_id")
    val itemMax = Seq(20L).toDF("item_max")
    val out = Corpus.negativeSamples(inter, users, itemMax,
      k = 3, oversample = 4, seed = "s")
    // no negative is ever a positive
    assert(out.join(inter, Seq("user_id", "item_id"), "left_semi")
      .count() === 0L)
    // user 1 has 10 free items and 12 slots — k fills
    assert(out.filter(col("user_id") === 1L).count() === 3L)
    // user 2 interacted with the whole space — zero negatives, not
    // fabricated ones
    assert(out.filter(col("user_id") === 2L).count() === 0L)
    // items stay inside the universe and draws are deterministic
    assert(out.filter(col("item_id") < 1 || col("item_id") > 20)
      .count() === 0L)
    val again = Corpus.negativeSamples(inter, users, itemMax,
      k = 3, oversample = 4, seed = "s")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("epochOrder: each epoch is a complete independent permutation " +
      "— repeated docs change their relative order across passes") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // 40 docs of one source repeated for 3 full epochs
    val manifest = (0L until 40L).flatMap(d =>
      (0L until 3L).map(e => (d, e))).toDF("doc_id", "epoch")
    val ordered = Corpus.epochOrder(manifest, "run1")
    // positions within each epoch are exactly 1..40
    val perEpoch = ordered.groupBy(col("epoch"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("position")).as("d"),
        min(col("position")).as("lo"), max(col("position")).as("hi"))
      .collect()
    assert(perEpoch.length === 3)
    perEpoch.foreach { r =>
      assert(r.getLong(1) === 40L && r.getLong(2) === 40L
        && r.getLong(3) === 1L && r.getLong(4) === 40L)
    }
    // epochs decorrelate: the same docs land at mostly different
    // positions in different passes
    val e0 = ordered.filter(col("epoch") === 0L)
      .select(col("doc_id"), col("position"))
    val e1 = ordered.filter(col("epoch") === 1L)
      .select(col("doc_id"), col("position"))
    val same = e0.join(e1, Seq("doc_id", "position"), "left_semi").count()
    assert(same < 8, s"epoch permutations agree on $same of 40 docs")
    // deterministic across runs
    val again = Corpus.epochOrder(manifest, "run1")
    assert(ordered.exceptAll(again).isEmpty
      && again.exceptAll(ordered).isEmpty)
  }

  test("packEpochs: the block prefix-sum decomposition is " +
      "bit-identical across block sizes, chunks respect ctxLen, and " +
      "every epoch packs its full stream") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (0L until 120L)
      .map(d => (d, Seq.fill(1 + (d % 7).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val manifest = (0L until 120L).flatMap(d =>
      (0L until 2L).map(e => (d, e))).toDF("doc_id", "epoch")
    val ordered = Corpus.epochOrder(manifest, "run1")
    def pack(bs: Long) =
      Corpus.packEpochs(ordered, docs, ctxLen = 16, blockSize = bs)
    // one block, a handful, and block-per-row must all agree — the
    // decomposition changes the plan, never the answer
    val ref = pack(1L << 20).collect().map(_.toSeq).toSet
    assert(pack(8L).collect().map(_.toSeq).toSet === ref)
    assert(pack(1L).collect().map(_.toSeq).toSet === ref)
    val rows = pack(8L)
    // every epoch's chunks cover positions 1..120 contiguously and
    // sum to the full epoch token count
    val perEpoch = rows.groupBy(col("epoch"))
      .agg(sum(col("n_docs")).as("nd"), sum(col("chunk_tokens")).as("tt"),
        min(col("first_pos")).as("lo"), max(col("last_pos")).as("hi"))
      .collect()
    val epochToks = (0L until 120L).map(d => 1L + d % 7).sum
    assert(perEpoch.length === 2)
    perEpoch.foreach { r =>
      assert(r.getLong(1) === 120L && r.getLong(2) === epochToks
        && r.getLong(3) === 1L && r.getLong(4) === 120L)
    }
    // a chunk never starts past its ctxLen boundary: chunk index is
    // tokens_before div 16, so consecutive chunks are dense per epoch
    val chunks = rows.select(col("epoch"), col("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    chunks.values.foreach { cs =>
      assert(cs === (0L until cs.length.toLong))
    }
  }

  test("cappedIdPrefix equals the naive per-group id window — skewed " +
      "groups, a null-keyed stratum, payload carried through — and " +
      "its plan has no window partitioned on the bare group over raw " +
      "rows (the hot-group serialization it replaces)") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.expressions.Window
    // one dominant group (700 of 760 rows), two cold ones, one null
    // stratum; ids deliberately NON-contiguous so buckets are
    // exercised. NULL ids too (r13 review finding): one in the hot
    // group (the cap binds there — no tie so the kept set is exact)
    // and two in a cold group where everything is kept anyway
    val rows = ((0 until 700).map(i =>
      (Some("hot"), Some(i * 37L), i % 5)) ++
      Seq((Some("hot"), Option.empty[Long], 990)) ++
      (0 until 40).map(i => (Some("c1"), Some(100000L + i * 3L), i)) ++
      Seq((Some("c1"), Option.empty[Long], 991),
        (Some("c1"), Option.empty[Long], 992)) ++
      (0 until 15).map(i => (Some("c2"), Some(200000L + i), i)) ++
      (0 until 5).map(i =>
        (Option.empty[String], Some(300000L + i), i)))
      .toDF("g", "id", "payload")
    val cap = 25L
    val got = Corpus.cappedIdPrefix(rows, "id", Seq("g"), cap)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val want = rows.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= cap).drop("_r")
    assert(got.columns.toSeq === rows.columns.toSeq)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "kept set must be bit-identical to the window form")
    // null ids rank FIRST (asc nulls-first), exactly as the window
    // form keeps them — the hot group's null row must survive the cap
    assert(got.filter(col("id").isNull).count() === 3L,
      "null-id rows must occupy the front of each group's prefix")
    // plan shape: any window partitioned by the group alone may only
    // run over the bucket histogram (an aggregate subtree), never the
    // raw rows — that single-task sort is what this operator removes
    val windows = got.queryExecution.optimizedPlan.collect {
      case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
    }
    assert(windows.nonEmpty)
    windows.foreach { wn =>
      if (wn.partitionSpec.size == 1) {
        val aggBelow = wn.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }
        assert(aggBelow.nonEmpty,
          "a bare-group window must rank the histogram, not the rows:\n" +
            wn.toString.take(800))
      }
    }
    // empty input keeps the schema, returns nothing
    assert(Corpus.cappedIdPrefix(rows.filter(lit(false)), "id",
      Seq("g"), cap).count() === 0L)
  }
}
