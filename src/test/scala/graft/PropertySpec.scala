package graft

import java.sql.Timestamp

import graft.etl.CleanFields
import graft.scd.Versioning
import org.apache.spark.sql.functions._

/** Property-style tests (SURVEY.md §5.3): randomized inputs with a
  * fixed seed, invariants asserted over the whole generated set in one
  * DataFrame pass (not per-case mini-jobs).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private val knownTypes = Seq("date", "contact", "text", "category",
    "app", "phone", "email", "number", "location", "calculation", "money")
  private val anyTypes = knownTypes ++ Seq("mystery", "", "TEXT", "file")

  private def randomJson(): String = rnd.nextInt(6) match {
    case 0 => s"""{"value": "${rnd.alphanumeric.take(8).mkString}"}"""
    case 1 => s"""{"value": ${rnd.nextInt(1000)}}"""
    case 2 => s"""{"start": "2024-0${1 + rnd.nextInt(9)}-1${rnd.nextInt(9)}"}"""
    case 3 => s"""{"value": {"name": "n${rnd.nextInt(99)}", "text": "t", "item_id": ${rnd.nextInt(999)}}}"""
    case 4 => "not json at all"
    case _ => "{}"
  }

  test("cleanItems is total over arbitrary payloads and never emits " +
      "unknown field types") {
    val rows = (1 to 300).map { i =>
      val nFields = 1 + rnd.nextInt(4)
      val fields = (1 to nFields).map { f =>
        (f.toLong, s"label$f", anyTypes(rnd.nextInt(anyTypes.length)),
          Seq.fill(rnd.nextInt(3))(randomJson()))
      }
      (i.toLong, fields)
    }
    val raw = rows.toDF("item_id", "fields")
      .select(col("item_id"), col("fields").cast(
        "array<struct<field_id:long,label:string,type:string,values:array<string>>>"))
    val cleaned = CleanFields.cleanItems(raw)
    // totality: the whole set evaluates without throwing
    val out = cleaned.select(col("item_id"),
      explode(map_values(col("data"))).as("v")).collect()
    assert(out.forall(r =>
      knownTypes.contains(r.getStruct(1).getAs[String]("field_type"))))
    // rejects carries exactly the unknown-typed fields
    val rej = CleanFields.rejects(raw)
      .select("field_type").distinct().as[String].collect()
    assert(rej.forall(t => !knownTypes.contains(t)))
  }

  test("SCD2 invariant: exactly one current=1 per key for arbitrary " +
      "event orders, including duplicate timestamps") {
    val rows = (1 to 500).map { i =>
      (i.toLong, rnd.nextInt(20).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L))
    }
    val df = rows.toDF("event_id", "item_id", "ts")
    val flagged = Versioning.withCurrentFlag(df, "item_id", "ts", "event_id")
    assert(Versioning.invariantViolations(flagged, "item_id").count() === 0)
    // and the current row is the max (ts, event_id) per key
    val cur = flagged.filter(col("current") === 1)
      .select(col("item_id"), col("ts"), col("event_id")).as[(Long, Timestamp, Long)]
      .collect().map(r => r._1 -> (r._2.getTime, r._3)).toMap
    val expected = rows.groupBy(_._2).map { case (k, g) =>
      k -> g.map(r => (r._3.getTime, r._1)).max
    }
    assert(cur === expected)
  }

  test("latestSnapshot is idempotent and agrees with the current flag") {
    val rows = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(30).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(500) * 1000L))
    }
    val df = rows.toDF("event_id", "item_id", "ts")
    val snap1 = Versioning.latestSnapshot(df, "item_id", "ts", "event_id")
    val snap2 = Versioning.latestSnapshot(snap1, "item_id", "ts", "event_id")
    assert(snap1.collect().toSet === snap2.collect().toSet)
    val fromFlag = Versioning.withCurrentFlag(df, "item_id", "ts", "event_id")
      .filter(col("current") === 1).drop("current")
    assert(snap1.collect().toSet === fromFlag.collect().toSet)
  }

  test("jaccard pairs: scores stay in [threshold, 1] and pairs are " +
      "strictly upper-triangular") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ml.Dedup.jaccardPairs(docs, 3, 0.3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { r =>
      val (i, j, jac) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      i < j && jac >= 0.3 && jac <= 1.0
    })
  }

  test("bandJoin equals the nested-loop join on random values for " +
      "random widths (negative, zero-straddling, boundary-heavy)") {
    import graft.operators.RangeJoin
    // values drawn near bucket multiples to stress the ±1 replication
    val widths = Seq(0.5, 1.0, 7.3)
    val lv = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(41) - 20) * 0.25 + rnd.nextInt(3) * 1e-3))
    val rv = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(41) - 20) * 0.25 + rnd.nextInt(3) * 1e-3))
    val l = lv.toDF("lid", "lval")
    val r = rv.toDF("rid", "rval")
    widths.foreach { w =>
      val banded = RangeJoin.bandJoin(l, col("lval"), r, col("rval"), w)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val brute = for {
        (li, lx) <- lv; (ri, rx) <- rv if math.abs(lx - rx) < w
      } yield (li, ri)
      assert(banded.toSet === brute.toSet, s"width=$w set mismatch")
      assert(banded.length === brute.length, s"width=$w duplicate pairs")
    }
  }

  test("as-of joins agree with per-row brute force on random event " +
      "streams, forward and backward, with and without tolerance") {
    import graft.operators.AsOfJoin
    val rightRows = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    val leftRows = (1 to 150).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, i.toLong))
    val right = rightRows.toDF("k", "t", "event_id")
    val left = leftRows.toDF("k", "t", "lid")
    def brutePick(k: Long, t: Long, fwd: Boolean, tol: Option[Long]) = {
      val cands = rightRows.filter { case (rk, rt, _) =>
        rk == k && (if (fwd) rt >= t else rt <= t) &&
          tol.forall(x => math.abs(rt - t) <= x)
      }
      if (cands.isEmpty) None
      else if (fwd) Some(cands.minBy { case (_, rt, id) => (rt, id) }._3)
      else Some(cands.maxBy { case (_, rt, id) => (rt, id) }._3)
    }
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(7L))) {
      val run = if (fwd)
        AsOfJoin.asofForward(left, right, "k", "k", "t", "t",
          Seq("event_id"), "event_id", tol.map(_.toString))
      else
        AsOfJoin.asofBackward(left, right, "k", "k", "t", "t",
          Seq("event_id"), "event_id", tol.map(_.toString))
      val got = run.select("lid", "asof_event_id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      leftRows.foreach { case (k, t, lid) =>
        assert(got(lid) === brutePick(k, t, fwd, tol),
          s"lid=$lid k=$k t=$t fwd=$fwd tol=$tol")
      }
    }
  }

  test("packSequences invariants: chunks cover every doc exactly once " +
      "and only a chunk's last doc may overflow the context length") {
    val docs = (1 to 400).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val ctx = 64
    val packed = graft.ml.Corpus.packSequences(docs, ctx, 4).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum === 400L)
    // a chunk minus its final doc always fits in ctx: tokens_before of
    // the last doc is < (chunk+1)*ctx by construction, so any chunk
    // with 2+ docs has chunk_tokens - last_doc_tokens < ctx… verified
    // via the cheap global bound: every chunk except possibly the
    // shard's last holds ≥ ctx total only when a single doc overflows
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val maxChunk = rows.map(_.getAs[Long]("chunk")).max
      rows.filter(_.getAs[Long]("chunk") < maxChunk).foreach { r =>
        assert(r.getAs[Long]("chunk_tokens") + 30 >= ctx,
          "non-final chunk left more than a max-doc of slack")
      }
    }
  }

  test("mixtureSample invariants on random weights: output composition " +
      "matches floor(w·T) per source, selection is a subset, and " +
      "appending docs never evicts an already-selected doc") {
    val docs = (1 to 600).map { i =>
      (i.toLong, s"text $i", s"s${rnd.nextInt(5)}")
    }.toDF("doc_id", "text", "source")
    val weights = Map("s0" -> 0.5, "s1" -> 0.25, "s3" -> 0.25)
    val out = graft.ml.Corpus.mixtureSample(docs, weights).collect()
    val avail = docs.filter(col("source").isin("s0", "s1", "s3"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (s, w) => math.floor(avail(s) / w) }.min
    val expected = weights.map { case (s, w) =>
      s -> math.floor(w * t).toLong }
    val got = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    assert(got === expected)
    assert(out.forall(r => weights.contains(r.getAs[String]("source"))))
    // append stability: a selected doc's hash rank can only grow when
    // docs are ADDED, so growing every source keeps T and the ranks of
    // previously selected docs may shift only by newly inserted ones —
    // re-running on a superset must keep selection deterministic
    val again = graft.ml.Corpus.mixtureSample(docs, weights).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === out.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("pruneVersions: output is a subset of the input with at most " +
      "keepLast rows per key, and the newest row always survives") {
    val hist = (1 to 500).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong, i.toLong)
    }.toDF("item_id", "ts", "event_id")
    val kept = Versioning.pruneVersions(hist, "item_id", "ts", "event_id", 3)
    val inSet = hist.select("event_id").as[Long].collect().toSet
    val keptRows = kept.select("item_id", "ts", "event_id")
      .as[(Long, Long, Long)].collect()
    assert(keptRows.map(_._3).toSet.subsetOf(inSet))
    assert(keptRows.groupBy(_._1).values.forall(_.length <= 3))
    // the max (ts, event_id) row of every key survives
    val newest = hist.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3))).toMap
    assert(newest.values.forall(keptRows.contains))
  }

  test("funnel stage equals brute-force longest-prefix-subsequence " +
      "on random event sequences") {
    val types = Seq("view", "click", "purchase", "signup", "error")
    val events = (1 to 2000).map { i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(50).toLong, i.toLong,
        types(rnd.nextInt(types.length)))
    }
    val df = events.toDF("user_id", "ts", "event_id", "event_type")
    val steps = Seq("view", "click", "purchase")
    val got = graft.operators.Funnel
      .stages(df, "user_id", "ts", "event_id", "event_type", steps)
      .as[(Long, Int)].collect().toMap
    // driver-side reference: greedy fold over the (ts, event_id)-
    // sorted sequence
    val expect = events.groupBy(_._1).view.mapValues { evs =>
      evs.sortBy(e => (e._2, e._3)).foldLeft(0) { (st, e) =>
        if (st < steps.length && e._4 == steps(st)) st + 1 else st
      }
    }.toMap
    assert(got === expect)
  }

  test("versionDiff partitions exactly the keys live at either " +
      "instant, consistently with the two snapshots") {
    val hist = (1 to 1500).map { i =>
      (rnd.nextInt(80).toLong, rnd.nextInt(100).toLong, i.toLong,
        rnd.nextInt(4) == 0) // 25% tombstones
    }
    val df = hist.toDF("item_id", "ts", "event_id", "deleted")
    val (from, to) = (30L, 70L)
    val got = Versioning.versionDiff(df, "item_id", "ts", "event_id",
        lit(from), lit(to))
      .select("item_id", "change_type").as[(Long, String)]
      .collect().toMap
    // driver-side reference snapshots
    def snap(asOf: Long): Map[Long, (Long, Boolean)] =
      hist.filter(_._2 <= asOf).groupBy(_._1).view.mapValues { vs =>
        val v = vs.maxBy(r => (r._2, r._3)); (v._3, v._4)
      }.toMap
    val s1 = snap(from); val s2 = snap(to)
    def live(s: Map[Long, (Long, Boolean)], k: Long) =
      s.get(k).exists(!_._2)
    val keys = (s1.keySet ++ s2.keySet)
      .filter(k => live(s1, k) || live(s2, k))
    assert(got.keySet === keys, "exactly the keys live at either instant")
    keys.foreach { k =>
      val expect =
        if (!live(s1, k) && !s1.contains(k)) "added"
        else if (!live(s1, k)) "restored"
        else if (!live(s2, k)) "removed"
        else if (s1(k)._1 == s2(k)._1) "unchanged"
        else "changed"
      assert(got(k) === expect, s"key $k: s1=${s1.get(k)} s2=${s2.get(k)}")
    }
  }

  test("band-join rewrite preserves results exactly on adversarial " +
      "values for both < and <= widths") {
    import graft.plans.BandJoinRewrite
    // mix of uniform doubles, signed zeros, denormal-scale values, and
    // exact multiples of the width (bucket-edge / |a-b| == w ties)
    def vals() = Seq.fill(120)(rnd.nextDouble() * 20 - 10) ++
      Seq(0.0, -0.0, 1e-300, -1e-300) ++
      Seq.fill(40)((rnd.nextInt(100) - 50) * 2.5)
    val l = vals().zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("lid", "lv")
    val r = vals().zipWithIndex.map { case (v, i) => (1000L + i, v) }
      .toDF("rid", "rv")
    for (strict <- Seq(true, false)) {
      val cond =
        if (strict) abs(col("lv") - col("rv")) < 2.5
        else abs(col("lv") - col("rv")) <= 2.5
      // def, not val: a Dataset caches its QueryExecution at first
      // use, so the rewrite-off baseline MUST rebuild the join after
      // flipping the conf or it silently re-runs the rewritten plan
      // (and on === off would hold vacuously)
      def q = l.join(r, cond).select("lid", "rid")
      val onQ = q
      assert(onQ.queryExecution.optimizedPlan.toString.contains("_graft_br"),
        "rule must fire")
      val on = onQ.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val off =
        try {
          spark.conf.set(BandJoinRewrite.confKey, "false")
          val offQ = q
          assert(!offQ.queryExecution.optimizedPlan.toString
            .contains("_graft_br"), "rule must abstain when disabled")
          offQ.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        } finally spark.conf.unset(BandJoinRewrite.confKey)
      assert(on === off, s"strict=$strict: rewrite changed the result " +
        s"(missing=${off -- on}, extra=${on -- off})")
    }
  }

  test("native text kernels equal their declarative forms on random " +
      "adversarial strings (unicode, repeated/leading/trailing spaces, " +
      "regex specials)") {
    // the corpus fixtures are space-normalized ASCII; the kernels'
    // parity guarantees must hold on the shapes the fixtures never
    // produce — empty tokens,  , combining marks, regex
    // metacharacters, 1-word and 0-char docs
    val pieces = Seq("a", "bb", "é", "汉", "é", ".*", "[", "\\",
      "$1", " ", "x y", "")
    val texts = (1 to 400).map { _ =>
      (0 until rnd.nextInt(12))
        .map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(" ") + (if (rnd.nextBoolean()) " " else "")
    } ++ Seq("", " ", "  ", "a")
    val df = texts.toDF("text")
    for (n <- Seq(1, 2, 3)) {
      val words = split(col("text"), " ")
      val hof = when(size(words) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), size(words) - n),
            i => concat_ws(" ",
              (1 to n).map(o => element_at(words, i + o)): _*))))
      val bad = df.select(
        graft.ml.HashUtils.wordShingles(col("text"), n).as("k"),
        hof.as("h"),
        graft.functions.ShingleStats(col("text"), n).as("st"),
        greatest(size(words) - (n - 1), lit(0)).as("tot"))
        .filter(not(col("k") <=> col("h")) ||
          col("st.n_grams") =!= col("tot") ||
          col("st.n_distinct") =!= size(col("k")))
        .count()
      assert(bad === 0, s"n=$n: kernel/HOF divergence on random text")
    }
    val hashBad = df.select(
      graft.ml.HashUtils.hash60(col("text")).as("k"),
      conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("c"))
      .filter(not(col("k") <=> col("c"))).count()
    assert(hashBad === 0, "hash60 kernel/conv divergence on random text")
  }

  test("SQ8 recall is monotone non-decreasing in refine depth") {
    val dim = 16
    val embs = (1 to 80).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val brute = graft.ml.Similarity.bruteTopK(embs, 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val recalls = Seq(3, 10, 79).map { refine =>
      val got = graft.ml.Similarity.sq8TopK(embs, 3, refine)
        .select("i", "j").as[(Long, Long)].collect().toSet
      (brute intersect got).size.toDouble / brute.size
    }
    assert(recalls === recalls.sorted,
      s"recall must not decrease with refine depth: $recalls")
    assert(recalls.last === 1.0, "refine = corpus size must be exact")
  }

  test("bfsHops equals brute-force BFS on random graphs with random " +
      "seed sets and depths") {
    import graft.operators.Graph
    (1 to 4).foreach { trial =>
      val n = 12 + rnd.nextInt(10)
      val edges = (for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextInt(100) < 18
      } yield (i.toLong, j.toLong))
      val seeds = (1 to n).filter(_ => rnd.nextInt(100) < 15)
        .map(_.toLong) match {
        case Nil => Seq(1L)
        case xs => xs
      }
      val depth = rnd.nextInt(5)
      // driver-side BFS over the adjacency map
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      (1 to depth).foreach { d =>
        val next = frontier.flatMap(x => adj.getOrElse(x, Nil))
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> d)
        frontier = next
      }
      val got = Graph.bfsHops(
        edges.toDF("p1", "p2"), seeds.toDF("node"), depth)
        .as[(Long, Int)].collect().toMap
      assert(got === dist, s"trial $trial n=$n depth=$depth")
    }
  }

  test("bm25TopK equals a driver-side naive BM25 on random corpora " +
      "and random queries") {
    import graft.ml.Retrieval
    val vocab = Vector("ax", "bv", "ce", "dr", "ek", "fo", "gu", "hm")
    (1 to 3).foreach { trial =>
      val corpus = (1 to 25).map(i => (i.toLong,
        Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val queries = (1 to 5).map(q => (q.toLong,
        Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))))
      val k = 1 + rnd.nextInt(4)
      val (k1, b) = (1.2, 0.75)
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val nD = corpus.size.toDouble
      val avgdl = toks.map(_._2.size).sum / nD
      val df = toks.flatMap(_._2.distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.size }
      val naive = queries.flatMap { case (qid, terms) =>
        toks.flatMap { case (did, ws) =>
          val sc = terms.distinct.collect {
            case t if ws.contains(t) =>
              val tf = ws.count(_ == t)
              math.log(1.0 + (nD - df(t) + 0.5) / (df(t) + 0.5)) *
                tf * (k1 + 1) / (tf + k1 * (1 - b + b * ws.size / avgdl))
          }.sum
          if (sc == 0.0) None else Some((did, BigDecimal(sc).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
        }.sortBy { case (did, sc) => (-sc, did) }.take(k).zipWithIndex
          .map { case ((did, sc), r) => (qid, r + 1, did, sc) }
      }.sortBy(x => (x._1, x._2))
      val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
          queries.toDF("query_id", "terms"), k)
        .orderBy(col("query_id"), col("rank"))
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got === naive, s"trial $trial k=$k")
    }
  }
}
