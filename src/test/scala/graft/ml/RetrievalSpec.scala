package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval against an independent in-driver reimplementation on
  * a tiny corpus (the same naive-equality discipline as BpeSpec /
  * ChunkSampleSpec: the distributed plan must equal the obvious
  * sequential computation exactly, after the shared 6-dp round).
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "red fox jumps over the lazy dog"),
    (2L, "red red wine stays red"),
    (3L, "the quick brown fox"),
    (4L, "lazy sunday morning"),
    (5L, "dog eats dog in a dog world"))

  /** Sequential BM25 over the same corpus: tf per doc, df over all
    * docs, ln(1 + (N−df+.5)/(df+.5)) idf — mirrors the operator's
    * documented formula, written against plain Scala collections.
    */
  private def naive(queries: Map[Long, Seq[String]], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Int, Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    queries.toSeq.flatMap { case (qid, terms) =>
      val scored = toks.toSeq.flatMap { case (did, ws) =>
        val s = terms.distinct.flatMap { t =>
          val tf = ws.count(_ == t)
          if (tf == 0 || !df.contains(t)) None
          else {
            val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
            Some(idf * tf * (k1 + 1) /
              (tf + k1 * (1 - b + b * ws.size / avgdl)))
          }
        }.sum
        if (s == 0.0) None
        else Some((did, BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, i + 1, did, s) }
    }.sortBy { case (q, r, _, _) => (q, r) }
  }

  private def run(queries: Map[Long, Seq[String]], k: Int) = {
    val docs = corpus.toDF("doc_id", "text")
    val qdf = queries.toSeq.map { case (q, ts) => (q, ts) }
      .toDF("query_id", "terms")
    Retrieval.bm25TopK(docs, qdf, k)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
  }

  test("bm25TopK equals the sequential computation, ranks the " +
      "rare-term doc first, and cuts at k") {
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
    assert(run(queries, 3) === naive(queries, 3))
    // 'wine' appears only in doc 2 → doc 2 must top a wine query
    val wine = run(Map(30L -> Seq("wine", "the")), 5)
    assert(wine.head._3 === 2L)
    // k=1 keeps exactly one row per query
    assert(run(queries, 1).map(_._1).distinct.size ===
      run(queries, 1).size)
  }

  test("query terms are deduplicated (bag-of-unique-terms), unknown " +
      "terms drop out, and an all-unknown query is absent") {
    // repeating 'dog' must not change any score
    val once = run(Map(1L -> Seq("dog")), 5)
    val twice = run(Map(1L -> Seq("dog", "dog")), 5)
    assert(once === twice)
    // a term absent from the corpus contributes nothing
    assert(run(Map(1L -> Seq("dog", "zzz")), 5) === once)
    // a query with no matching term produces no rows at all
    assert(run(Map(1L -> Seq("zzz")), 5).isEmpty)
  }

  test("tf saturation: higher raw tf scores higher but sub-linearly " +
      "(the k1 damping), and doc_id breaks exact ties") {
    // 'dog' tf: doc1=1 (len 7), doc5=3 (len 7) → doc5 first, but its
    // score is far below 3× doc1's
    val r = run(Map(1L -> Seq("dog")), 5)
    val byDoc = r.map(x => x._3 -> x._4).toMap
    assert(r.head._3 === 5L)
    assert(byDoc(5L) > byDoc(1L) && byDoc(5L) < 3 * byDoc(1L))
    // symmetric docs tie on score → doc_id ascending decides the rank
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((1L, Seq("alpha"))).toDF("query_id", "terms")
    val tie = Retrieval.bm25TopK(docs, q, 2)
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect()
    assert(tie.map(_._3).toSeq === Seq(1L, 2L))
    assert(tie(0)._4 === tie(1)._4)
  }

  test("served index equals the in-plan scorer row for row, reads " +
      "only the query terms' bucket directories, and rejects a " +
      "missing index loudly") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
      .toSeq.toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25")
    try {
      val path = tmp.resolve("idx").toString
      Retrieval.writeBm25Index(docs, path, nBuckets = 16)
      val served = Retrieval.queryBm25Index(spark, path, queries, k = 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val inPlan = Retrieval.bm25TopK(docs, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(served === inPlan && served.nonEmpty)
      // directory pruning is physically real: the scan's partition
      // filter admits at most |distinct query terms| of the bucket
      // dirs actually written
      val written = new java.io.File(path).listFiles()
        .count(_.getName.startsWith("bkt="))
      assert(written > 3, s"corpus too small to prove pruning: $written")
      val pruned = Retrieval.queryBm25Index(spark, path, queries, k = 3)
        .queryExecution.executedPlan.toString
      val m = """PartitionFilters: \[[^\]]*\]""".r.findFirstIn(pruned)
      assert(m.nonEmpty && m.get.contains("bkt"),
        s"no bucket partition filter in the served scan:\n$pruned")
      // a query set hitting ONE term reads one bucket's postings: the
      // pruned row count is that term's df, not the posting total
      val one = Retrieval.queryBm25Index(spark, path,
        Seq((1L, Seq("wine"))).toDF("query_id", "terms"), k = 5)
        .as[(Long, Int, Long, Double)].collect()
      assert(one.map(_._3).toSeq === Seq(2L)) // only doc 2 has 'wine'
      intercept[Exception] {
        Retrieval.queryBm25Index(spark, tmp.resolve("nope").toString,
          queries, k = 3).collect()
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("served maxDf cap: capped-served equals capped-in-plan row " +
      "for row, and a capped-out term contributes exactly nothing") {
    val docs = corpus.toDF("doc_id", "text")
    // df: red=2, wine=1 → maxDf=1 keeps only 'wine'
    val queries = Seq((10L, Seq("red", "wine"))).toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25c")
    try {
      val path = tmp.resolve("idx").toString
      Retrieval.writeBm25Index(docs, path, nBuckets = 16)
      val served = Retrieval.queryBm25Index(spark, path, queries,
          k = 3, maxDf = 1L)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val inPlan = Retrieval.bm25TopK(docs, queries, 3, maxDf = 1L)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(served === inPlan && served.nonEmpty)
      // the capped query scores exactly like one that never mentioned
      // the hot term — the stopword-removal contract, end to end
      val wineOnly = Retrieval.queryBm25Index(spark, path,
          Seq((10L, Seq("wine"))).toDF("query_id", "terms"), k = 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(served === wineOnly)
      // a query whose every term caps out is absent, served too
      assert(Retrieval.queryBm25Index(spark, path,
        Seq((10L, Seq("red"))).toDF("query_id", "terms"),
        k = 3, maxDf = 1L).isEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("appended index serves the union corpus identically to a " +
      "from-scratch build, leaves untouched buckets byte-identical, " +
      "and rejects re-appending an indexed doc") {
    val docs = corpus.toDF("doc_id", "text")
    val initial = corpus.filter(_._1 <= 3).toDF("doc_id", "text")
    val batch = corpus.filter(_._1 > 3).toDF("doc_id", "text")
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
      .toSeq.toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_inc")
    def bucketFiles(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("bkt=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    try {
      val inc = tmp.resolve("inc").toString
      val full = tmp.resolve("full").toString
      Retrieval.writeBm25Index(initial, inc, nBuckets = 16)
      val before = bucketFiles(inc)
      Retrieval.appendBm25Index(spark, batch, inc)
      val after = bucketFiles(inc)
      // every pre-append file survives the append bit-for-bit (same
      // path, same size, same mtime) — only new files appear
      before.foreach { case (p, meta) =>
        assert(after.get(p).contains(meta), s"append rewrote $p")
      }
      Retrieval.writeBm25Index(docs, full, nBuckets = 16)
      val servedInc = Retrieval.queryBm25Index(spark, inc, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val servedFull = Retrieval.queryBm25Index(spark, full, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(servedInc === servedFull && servedInc.nonEmpty)
      // an overlapping batch must fail loudly, not double postings
      intercept[IllegalArgumentException] {
        Retrieval.appendBm25Index(spark, initial, inc)
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("deleteBm25Docs: the tombstoned index serves exactly like a " +
      "from-scratch build without the deleted docs, rewrites no " +
      "posting file, is idempotent, and still rejects re-append") {
    val docs = corpus.toDF("doc_id", "text")
    val alive = corpus.filter(x => x._1 != 2L && x._1 != 5L)
      .toDF("doc_id", "text")
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
      .toSeq.toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_del")
    def bucketFiles(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("bkt=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    try {
      val del = tmp.resolve("del").toString
      val rebuilt = tmp.resolve("rebuilt").toString
      Retrieval.writeBm25Index(docs, del, nBuckets = 16)
      val before = bucketFiles(del)
      Retrieval.deleteBm25Docs(spark,
        Seq(2L, 5L).toDF("doc_id"), del)
      // the soft delete touched NO posting file (tombstones are a
      // sibling table) — every pre-delete file survives bit-for-bit
      assert(bucketFiles(del) === before)
      def serve(p: String) = Retrieval.queryBm25Index(spark, p, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      Retrieval.writeBm25Index(alive, rebuilt, nBuckets = 16)
      val served = serve(del)
      assert(served === serve(rebuilt) && served.nonEmpty)
      // deleted docs are gone from every result (doc 2 was the top
      // 'red' hit; doc 5 the top 'dog' hit — both must vanish, and
      // df/n_docs/avgdl re-derive so the SCORES match the rebuild,
      // which the equality above already proves)
      assert(!served.exists(r => r._3 == 2L || r._3 == 5L))
      // idempotent: re-deleting (plus an id that never existed)
      // changes nothing
      Retrieval.deleteBm25Docs(spark,
        Seq(2L, 999L).toDF("doc_id"), del)
      assert(serve(del) === served)
      // a deleted doc still cannot be re-appended (its physical
      // doc-length row remains): resurrection requires a rebuild
      intercept[IllegalArgumentException] {
        Retrieval.appendBm25Index(spark,
          corpus.filter(_._1 == 2L).toDF("doc_id", "text"), del)
      }
      // a NULL id in the delete batch fails loudly
      intercept[Exception] {
        Retrieval.deleteBm25Docs(spark,
          Seq(Some(1L), None).toDF("doc_id"), del)
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("compactBm25Index rewrites only dirty buckets, swaps the " +
      "doc-length table, drops the tombstones, serving is unchanged, " +
      "and a compacted-away doc may be re-appended") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
      .toSeq.toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_cmp")
    def bucketFiles(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("bkt=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    try {
      val path = tmp.resolve("idx").toString
      Retrieval.writeBm25Index(docs, path, nBuckets = 16)
      Retrieval.deleteBm25Docs(spark, Seq(2L, 5L).toDF("doc_id"), path)
      def serve() = Retrieval.queryBm25Index(spark, path, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val before = serve()
      val filesBefore = bucketFiles(path)
      val dirty = spark.read.parquet(path)
        .filter(col("doc_id").isin(2L, 5L))
        .select(col("bkt").cast("long")).distinct()
        .as[Long].collect().toSet
      val rewritten = Retrieval.compactBm25Index(spark, path)
      assert(rewritten === dirty.size.toLong)
      assert(tombstonesEmpty(path, "_graft_bm25_deleted"))
      assert(!new java.io.File(path, "_graft_bm25_docs_bak").exists())
      // dl holds exactly the survivors now
      val dlIds = spark.read.parquet(s"$path/_graft_bm25_docs")
        .select("doc_id").as[Long].collect().toSet
      assert(dlIds === Set(1L, 3L, 4L))
      val filesAfter = bucketFiles(path)
      filesBefore.foreach { case (p, meta) =>
        val b = p.replaceAll(".*bkt=([0-9]+)/.*", "$1").toLong
        if (!dirty.contains(b))
          assert(filesAfter.get(p).contains(meta),
            s"compaction rewrote clean-bucket file $p")
      }
      assert(serve() === before && before.nonEmpty)
      // second compaction: nothing to do
      assert(Retrieval.compactBm25Index(spark, path) === 0L)
      // resurrection after compaction is legitimate — the physical
      // rows are gone, so doc 2 appends as a genuinely new doc and
      // the index matches a from-scratch build of {1,2,3,4}
      Retrieval.appendBm25Index(spark,
        corpus.filter(_._1 == 2L).toDF("doc_id", "text"), path)
      val full = tmp.resolve("full").toString
      Retrieval.writeBm25Index(
        corpus.filter(_._1 != 5L).toDF("doc_id", "text"), full,
        nBuckets = 16)
      val servedRes = serve()
      val servedFull = Retrieval.queryBm25Index(spark, full, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(servedRes === servedFull)
      assert(servedRes.exists(_._3 == 2L), "resurrected doc absent")
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("serving falls back to the doc-length bak inside a crashed " +
      "swap window, and the next compaction entry repairs the swap") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Map(10L -> Seq("red", "fox"), 20L -> Seq("dog"))
      .toSeq.toDF("query_id", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_swap")
    try {
      val path = tmp.resolve("idx").toString
      Retrieval.writeBm25Index(docs, path, nBuckets = 16)
      Retrieval.deleteBm25Docs(spark, Seq(2L).toDF("doc_id"), path)
      def serve() = Retrieval.queryBm25Index(spark, path, queries, 3)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      val before = serve()
      // the crash: compaction died between live→bak and tmp→live —
      // the live doc-length dir is GONE, only bak remains; the
      // tombstones are still on disk, so bak serves correctly masked
      assert(new java.io.File(path, "_graft_bm25_docs").renameTo(
        new java.io.File(path, "_graft_bm25_docs_bak")))
      assert(serve() === before, "bak fallback must serve identically")
      // the next maintenance entry restores live and finishes the job
      Retrieval.compactBm25Index(spark, path)
      assert(new java.io.File(path, "_graft_bm25_docs").exists())
      assert(!new java.io.File(path, "_graft_bm25_docs_bak").exists())
      assert(tombstonesEmpty(path, "_graft_bm25_deleted"))
      assert(serve() === before)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("the sorted-fold score equals the plain-sum form at the 6 dp " +
      "contract on 5-term matches (accumulation-order hardening)") {
    // doc 1 matches all five query terms, so its score folds FIVE
    // double contributions — the regime where a plain sum() would
    // associate in partition-dependent order. naive() sums in query-
    // term order (the plain-sum form); the operator folds the SORTED
    // contribution list. Equality at the 6 dp contract proves the
    // hardening changed the accumulation ORDER, not the score.
    val q = Map(40L -> Seq("red", "fox", "the", "lazy", "dog"))
    val got = run(q, 5)
    assert(got === naive(q, 5))
    assert(got.head._3 === 1L) // the 5-term match ranks first
  }

  test("bm25TopKAuto routes by measured candidate volume: a cool " +
      "corpus scores exactly (the cap never engages), a hot-term " +
      "corpus engages the df cap, and the served router matches") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
    // cool: the 5-doc corpus — volume Σ df·nq = 6 against a
    // 100/query × 2-query budget → exact. maxDf = 1 would cap EVERY
    // term (all dfs ≥ 2), so equality with the uncapped scorer
    // proves the cap genuinely did not engage.
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, Seq("red", "fox")), (2L, Seq("dog")))
      .toDF("query_id", "terms")
    val cool = rows(Retrieval.bm25TopKAuto(docs, q, 5, maxDf = 1L,
      budgetDfPerQuery = 100L))
    assert(cool === rows(Retrieval.bm25TopK(docs, q, 5)))
    assert(cool.nonEmpty)
    // hot: every doc shares the template token 'the' (df = 60), so
    // one query costs 61 candidate rows against a 20/query budget →
    // the cap engages and 'the' contributes nothing
    val hotDocs = (1L to 60L).map(i => (i, s"the w$i"))
      .toDF("doc_id", "text")
    val hq = Seq((1L, Seq("the", "w7"))).toDF("query_id", "terms")
    val hot = rows(Retrieval.bm25TopKAuto(hotDocs, hq, 5,
      maxDf = 10L, budgetDfPerQuery = 20L))
    assert(hot === rows(Retrieval.bm25TopK(hotDocs, hq, 5,
      maxDf = 10L)))
    assert(hot !== rows(Retrieval.bm25TopK(hotDocs, hq, 5)),
      "hot fixture did not exercise the cap's loss")
    // the served router measures over the persisted postings and
    // routes identically
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_auto")
    try {
      val path = tmp.resolve("idx").toString
      Retrieval.writeBm25Index(hotDocs, path, nBuckets = 8)
      assert(rows(Retrieval.queryBm25IndexAuto(spark, path, hq, 5,
        maxDf = 10L, budgetDfPerQuery = 20L)) === hot)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("rrfFuse matches the hand-computed reciprocal-rank sum, " +
      "breaks ties on doc_id, and cuts at k") {
    // query 10: doc 1 in both lists (1/61 + 1/62), doc 2 lexical-only
    //   rank 2 (1/62), doc 3 semantic-only rank 1 (1/61) — 2 and 3
    //   differ, no tie; doc 4 and doc 5 each semantic-only at ranks
    //   3 and 3 in DIFFERENT lists can't happen within one list, so
    //   the tie case: doc 4 lexical rank 3, doc 5 semantic rank 3 —
    //   equal rrf 1/63, doc_id 4 must rank first
    val lex = Seq((10L, 1L, 1), (10L, 2L, 2), (10L, 4L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((10L, 3L, 1), (10L, 1L, 2), (10L, 5L, 3))
      .toDF("query_id", "doc_id", "rank")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      (10L, 1, 1L, r6(1.0 / 61 + 1.0 / 62)),
      (10L, 2, 3L, r6(1.0 / 61)),
      (10L, 3, 2L, r6(1.0 / 62)),
      (10L, 4, 4L, r6(1.0 / 63)),
      (10L, 5, 5L, r6(1.0 / 63)))
    val got = Retrieval.rrfFuse(Seq(lex, sem), k = 5)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === expected)
    // the cut: k=2 keeps exactly the two highest fused scores
    val cut = Retrieval.rrfFuse(Seq(lex, sem), k = 2)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(cut === expected.take(2))
    // three lists: the fused score must equal the SORTED-order fold
    // of the three contributions (the canonical accumulation order
    // that makes 3+-list fusion run- and engine-deterministic)
    val third = Seq((10L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val top3 = Retrieval.rrfFuse(Seq(lex, sem, third), k = 1)
      .as[(Long, Int, Long, Double)].collect().head
    val cs = Seq(1.0 / 61, 1.0 / 62, 1.0 / 61).sorted
    assert(top3 === ((10L, 1, 1L, r6(cs.foldLeft(0.0)(_ + _)))))
  }

  test("rrfFuse rejects a duplicate (query_id, doc_id) within one " +
      "ranking loudly instead of double-counting its contribution") {
    val lex = Seq((10L, 1L, 1), (10L, 2L, 2)).toDF("query_id", "doc_id", "rank")
    val dup = Seq((10L, 1L, 1), (10L, 1L, 3)).toDF("query_id", "doc_id", "rank")
    val ex = intercept[Exception] {
      Retrieval.rrfFuse(Seq(lex, dup), k = 5).collect()
    }
    assert(ex.getMessage.contains("duplicate (query_id, doc_id)"))
    // the same doc at the same rank in DIFFERENT lists is the normal
    // hybrid case and must still fuse
    val sem = Seq((10L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    assert(Retrieval.rrfFuse(Seq(lex, sem), k = 5).count() === 2L)
  }
}
