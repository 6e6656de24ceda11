package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph operators against brute-force restatements on small graphs
  * whose answers are computable by hand or by an O(n³) enumeration.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("coOccurrenceEdges pairs within bags, dedups across bags") {
    // bag 1: {1,2,3} → edges 12 13 23; bag 2: {2,3} → edge 23 (dup);
    // bag 3: {4} → no edge; item 2 repeated inside bag 1 → no self-edge
    val bags = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 3L), (3L, 4L)).toDF("bag", "item")
    val edges = Graph.coOccurrenceEdges(bags, "bag", "item")
      .as[(Long, Long)].collect().sorted
    assert(edges.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("triangleStats matches brute-force enumeration on K4 plus tail") {
    // K4 on {1,2,3,4} (4 triangles) + tail 4-5 (0 triangles).
    // Degrees: 3,3,3,4,1 → wedges = 3+3+3+6+0 = 15.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("p1", "p2")
    val r = Graph.triangleStats(edges).head()
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("n_wedges") === 15L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("global_cc") === 0.8) // 3*4/15
  }

  test("triangleStats equals the O(n^3) count on a pseudo-random graph") {
    // deterministic edge set: (i,j) present iff md5-ish hash parity —
    // seeded via Spark's sha2 on the pair, no Random (replay-safe)
    val n = 40
    val pairs = for (i <- 1 to n; j <- (i + 1) to n) yield (i.toLong, j.toLong)
    val all = pairs.toDF("p1", "p2")
      .filter(substring(sha2(concat_ws("-", col("p1"), col("p2")), 256),
        1, 1).isin("0", "1", "2", "3", "4", "5"))
    val edges = all.cache()
    val es = edges.as[(Long, Long)].collect().toSet
    val brute = (for {
      i <- 1 to n; j <- (i + 1) to n; k <- (j + 1) to n
      if es((i.toLong, j.toLong)) && es((i.toLong, k.toLong)) &&
        es((j.toLong, k.toLong))
    } yield 1).size.toLong
    val r = Graph.triangleStats(edges).head()
    assert(r.getAs[Long]("n_triangles") === brute)
    edges.unpersist()
  }

  test("triangleStatsSampled: the sampled count is exact on the kept " +
      "subgraph, the estimator scales by 1/p^3, and the seed-sweep " +
      "mean is unbiased on closed-form fixtures") {
    // K12: C(12,3) = 220 triangles, C(12,2) = 66 edges
    val k12 = (1L to 12L).combinations(2)
      .map { case Seq(a, b) => (a, b) }.toSeq.toDF("p1", "p2")
    val exact = 220.0
    def est(seed: Long): (Long, Long, Double) = {
      val r = Graph.triangleStatsSampled(k12, keepNum = 1,
        keepDen = 2, seed = seed).head()
      (r.getAs[Long]("n_edges_kept"), r.getAs[Long]("tri_sampled"),
        r.getAs[Double]("est_triangles"))
    }
    // structural: estimate == sampled / p^3 exactly, and the sampled
    // count equals a brute count over the hash-kept edge subset
    val (kept0, tri0, est0) = est(7L)
    assert(est0 === tri0 * 8.0)
    val keptEdges = k12.filter(
      pmod(graft.functions.Hash60(
          concat_ws("_", lit(7L), col("p1"), col("p2"))
            .cast("binary")), lit(2L)) < 1)
      .as[(Long, Long)].collect().toSet
    assert(keptEdges.size.toLong === kept0)
    val brute = (1L to 12L).combinations(3).count { case Seq(a, b, c) =>
      keptEdges((a, b)) && keptEdges((a, c)) && keptEdges((b, c)) }
    assert(brute.toLong === tri0,
      "sampled triangle count must be exact on the kept subgraph")
    // empirical unbiasedness: E[est] = T for ANY graph; a 30-seed
    // deterministic sweep's mean lands near 220 (tolerance covers
    // the estimator's variance on an edge-sharing clique)
    val seeds = (1L to 30L)
    val mean = seeds.map(s => est(s)._3).sum / seeds.size
    assert(math.abs(mean - exact) < 0.25 * exact,
      s"seed-sweep mean $mean too far from $exact")
    // a draw with ZERO surviving triangles has no finite relative
    // error: rse_indep is NULL, never inf/NaN (the r12 advice
    // finding). A 2-path has no triangle at any keep rate.
    val path2 = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val r0 = Graph.triangleStatsSampled(path2, keepNum = 1,
      keepDen = 1).head()
    assert(r0.getAs[Long]("tri_sampled") === 0L)
    assert(r0.isNullAt(r0.fieldIndex("rse_indep")),
      "zero-triangle draw must emit NULL rse_indep")
  }

  test("pageRank on a regular graph is uniform 1.0") {
    // 6-cycle: every node degree 2 → PageRank is exactly uniform at
    // every iteration, so pr_norm = 1.0 for all nodes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 6L)).toDF("p1", "p2")
    val pr = Graph.pageRank(edges, iters = 3)
      .select("pr_norm").as[Double].collect()
    assert(pr.length === 6)
    assert(pr.forall(_ === 1.0))
  }

  test("pageRank conserves total mass and ranks the hub highest") {
    // star 1-{2..6} plus edge 2-3: node 1 is the hub
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L)).toDF("p1", "p2")
    val rows = Graph.pageRank(edges, iters = 3)
      .select("node", "pr_norm").as[(Long, Double)].collect().toMap
    // pr_norm sums to N (pr sums to 1): no dangling mass in a graph
    // restricted to degree ≥ 1 nodes — tolerance covers the per-node
    // 6-dp output rounding (≤ 5e-7 each)
    assert(math.abs(rows.values.sum - 6.0) < 6 * 5e-7 + 1e-9)
    assert(rows(1L) === rows.values.max)
    // symmetric leaves tie exactly
    assert(rows(4L) === rows(5L) && rows(5L) === rows(6L))
  }

  test("pageRank reliable=true (fault-tolerant checkpoint) equals the " +
      "localCheckpoint path bit-for-bit; missing dir is rejected") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L)).toDF("p1", "p2")
    val sc = spark.sparkContext
    // reliable without a checkpoint dir must fail up front, not
    // mid-loop (getCheckpointDir may linger from an earlier suite —
    // only assert the guard when it is actually unset)
    if (sc.getCheckpointDir.isEmpty)
      intercept[IllegalArgumentException] {
        Graph.pageRank(edges, iters = 1, reliable = true)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    try {
      sc.setCheckpointDir(dir)
      val local = Graph.pageRank(edges, iters = 3)
        .select("node", "deg", "pr_norm")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val rel = Graph.pageRank(edges, iters = 3, reliable = true)
        .select("node", "deg", "pr_norm")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(rel === local)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("coOccurrenceEdgesMinSupport keeps only pairs sharing enough bags") {
    // pair (1,2) in bags 1,2 (support 2); (1,3) only in bag 1; (2,3)
    // only in bag 1 → threshold 2 keeps exactly (1,2)
    val bags = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 4L)).toDF("bag", "item")
    val strong = Graph.coOccurrenceEdgesMinSupport(bags, "bag", "item", 2L)
      .as[(Long, Long)].collect().sorted
    assert(strong.toSeq === Seq((1L, 2L)))
    // threshold 1 degenerates to the plain co-occurrence edge set
    val all = Graph.coOccurrenceEdgesMinSupport(bags, "bag", "item", 1L)
      .as[(Long, Long)].collect().sorted
    val plain = Graph.coOccurrenceEdges(bags, "bag", "item")
      .as[(Long, Long)].collect().sorted
    assert(all.toSeq === plain.toSeq)
  }

  test("bfsHops on a path graph labels exact hop distances and " +
      "respects maxDepth") {
    // path 1-2-3-4-5, seed {1}: hops 0,1,2,3,4 — with maxDepth 3 node
    // 5 must be absent, everything else exact
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("p1", "p2")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxDepth = 3)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
  }

  test("bfsHops takes the MINIMUM hop count over multiple seeds and " +
      "keeps isolated seeds at hops 0") {
    // path 1-2-3-4-5 with seeds {1, 5}: node 3 is 2 hops from either
    // end; node 9 is an isolated seed (touches no edge) → hops 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("p1", "p2")
    val seeds = Seq(1L, 5L, 9L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxDepth = 4)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 1), (5L, 0),
      (9L, 0)))
  }

  test("bfsHops never revisits: cycle distances are shortest-path, " +
      "and unreachable components are absent") {
    // 6-cycle seeded at 1 → max hop 3 (opposite node); separate
    // component {7,8} unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 6L), (7L, 8L)).toDF("p1", "p2")
    val got = Graph.bfsHops(edges, Seq(1L).toDF("node"), maxDepth = 10)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, 2),
      (6L, 1)))
  }

  test("shortestPathsBounded prefers a cheap long path over an " +
      "expensive direct edge, and respects the round bound") {
    // 1-3 direct costs 10; 1-2-3 costs 1+1=2 → dist(3)=2 needs two
    // rounds; with rounds=1 only the direct edge has fired (dist 10)
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("p1", "p2", "w")
    val seeds = Seq(1L).toDF("node")
    val r2 = Graph.shortestPathsBounded(edges, seeds, rounds = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(r2 === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    val r1 = Graph.shortestPathsBounded(edges, seeds, rounds = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(r1 === Seq((1L, 0L), (2L, 1L), (3L, 10L)))
  }

  test("shortestPathsBounded equals brute-force min over all ≤R-edge " +
      "paths on a pseudo-random weighted graph, multi-seed") {
    // deterministic sparse graph: same sha2-parity edge filter as the
    // triangle property test, weight = 1 + (first hex digit mod 4)
    val n = 25
    val pairs = for (i <- 1 to n; j <- (i + 1) to n)
      yield (i.toLong, j.toLong)
    val all = pairs.toDF("p1", "p2")
      .withColumn("h", substring(
        sha2(concat_ws("-", col("p1"), col("p2")), 256), 1, 1))
      .filter(col("h").isin("0", "1", "2"))
      .withColumn("w", (conv(col("h"), 16, 10).cast("long") % 4) + 1)
      .select(col("p1"), col("p2"), col("w"))
    val es = all.as[(Long, Long, Long)].collect()
    val adj = (es.map { case (a, b, w) => (a, (b, w)) } ++
      es.map { case (a, b, w) => (b, (a, w)) })
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val seeds = Seq(1L, 20L)
    val rounds = 3
    // textbook UNPRUNED Bellman-Ford: every round relaxes every
    // settled node again — after R rounds best(v) = min cost over all
    // ≤R-edge paths, the exact contract the frontier-pruned engine
    // form claims to preserve
    var best = seeds.map(s => s -> 0L).toMap
    for (_ <- 1 to rounds) {
      val next = scala.collection.mutable.Map(best.toSeq: _*)
      for ((u, du) <- best;
          (v, w) <- adj.getOrElse(u, Array.empty[(Long, Long)]))
        next(v) = math.min(next.getOrElse(v, Long.MaxValue), du + w)
      best = next.toMap
    }
    val got = Graph.shortestPathsBounded(all,
        seeds.toDF("node"), rounds)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === best.toSeq.sortBy(_._1))
  }

  test("shortestPathsBounded reliable=true (fault-tolerant checkpoint) " +
      "equals the localCheckpoint path bit-for-bit") {
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 2L)).toDF("p1", "p2", "w")
    val seeds = Seq(1L).toDF("node")
    val sc = spark.sparkContext
    val saved = sc.getCheckpointDir
    if (saved.isEmpty)
      intercept[IllegalArgumentException] {
        Graph.shortestPathsBounded(edges, seeds, 1, reliable = true)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    try {
      sc.setCheckpointDir(dir)
      val local = Graph.shortestPathsBounded(edges, seeds, 3)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val rel = Graph.shortestPathsBounded(edges, seeds, 3,
          reliable = true)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(rel === local && local.nonEmpty)
    } finally {
      // restore whatever dir the session had: later suites must not
      // inherit a checkpoint dir pointing at this test's deleted tmp
      saved.foreach(sc.setCheckpointDir)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("iterative loops reclaim superseded checkpoint generations: " +
      "net persisted-RDD growth is the live state, not one per round") {
    // deep rounds on a graph the loops cannot exhaust early (a long
    // path keeps the frontier non-empty), so every round really cuts
    val path = (1L to 30L).map(i => (i, i + 1, 1L)).toDF("p1", "p2", "w")
    val sc = spark.sparkContext
    val b1 = sc.getPersistentRDDs.size
    Graph.shortestPathsBounded(path, Seq(1L).toDF("node"), rounds = 8)
      .count()
    // retained: ONLY the final dist generation — the 8 frontier
    // generations, 8 superseded dist generations, and the edge
    // snapshot are all freed (pre-fix this grew by ~18)
    val a1 = sc.getPersistentRDDs.size
    assert(a1 <= b1 + 1, s"shortestPathsBounded leaks state: $b1 -> $a1")
    val b2 = sc.getPersistentRDDs.size
    Graph.pageRank(path.drop("w"), iters = 8).count()
    // retained: deg (the returned plan derives n from it) + the final
    // rank generation; superseded ranks and the edge snapshot freed
    val a2 = sc.getPersistentRDDs.size
    assert(a2 <= b2 + 2, s"pageRank leaks rank generations: $b2 -> $a2")
  }
}
