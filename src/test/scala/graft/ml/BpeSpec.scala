package graft.ml

import scala.collection.mutable

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side BPE: hash-map pair counting over a
    * word-frequency table, (count desc, left, right) tie-break,
    * left-to-right non-overlapping merge application.
    */
  private def naive(wordFreq: Map[String, Long], m: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < m && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((rank, l, r, l + r, c))
        def app(syms: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]; var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }
        words = words.map { case (s, f) => (app(s), f) }
        rank += 1
      }
    }
    out.result()
  }

  test("the learned merge table equals an independent naive BPE, " +
      "including tie-breaks, on a mixed corpus") {
    val docs = Seq(
      (1L, "low lower lowest low"),
      (2L, "newer newest low new"),
      (3L, "wide wider widest new")
    ).toDF("doc_id", "text")
    val freq = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val got = Bpe.learn(docs, 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === naive(freq, 12))
  }

  test("learn reliable=true (fault-tolerant checkpoint generations) " +
      "equals the localCheckpoint path; missing dir is rejected") {
    val docs = Seq(
      (1L, "low lower lowest low"),
      (2L, "newer newest low new")
    ).toDF("doc_id", "text")
    val sc = spark.sparkContext
    val saved = sc.getCheckpointDir
    if (saved.isEmpty)
      intercept[IllegalArgumentException] {
        Bpe.learn(docs, 2, reliable = true)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_bpe").toString
    try {
      sc.setCheckpointDir(dir)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(rows(Bpe.learn(docs, 8, reliable = true)) ===
        rows(Bpe.learn(docs, 8)))
      // superseded generations are DELETED as the loop advances, and
      // the last one on close(): a 30k-merge run must not leave 30k
      // corpus snapshots behind (round-7 advice). getCheckpointDir is
      // a file: URI, so count through Hadoop FS; no checkpointed
      // part files may survive.
      val cd = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      val cfs = cd.getFileSystem(sc.hadoopConfiguration)
      var leftover = 0
      val it = cfs.listFiles(cd, true)
      while (it.hasNext)
        if (it.next().getPath.getName.startsWith("part-")) leftover += 1
      assert(leftover === 0,
        s"reliable BPE left $leftover checkpointed part files behind")
    } finally {
      // restore the session's prior checkpoint dir (later suites
      // must not inherit one pointing at this deleted tmp dir)
      saved.foreach(sc.setCheckpointDir)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("overlapping pairs count per position and merge " +
      "left-to-right non-overlapping") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.learn(docs, 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    // "a a a a": (a,a) counts 3 positions; merging gives "aa aa",
    // whose only pair is (aa,aa) once
    assert(got === Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("segment applies merges rank-ascending inside word boundaries " +
      "and preserves word order") {
    val train = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val merges = Bpe.learn(train, 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.segment(
      Seq((7L, "ab cd ab"), (8L, "abq")).toDF("doc_id", "text"), merges)
      .orderBy("doc_id").collect()
    // (a,b) then (ab,ab) learned; "ab" segments as one token, the
    // pair never merges ACROSS the word gap in "ab cd ab"
    assert(seg(0).getSeq[String](1) === Seq("ab", "cd", "ab"))
    assert(seg(0).getInt(2) === 3)
    // unseen symbol passes through untouched
    assert(seg(1).getSeq[String](1) === Seq("ab", "q"))
  }

  test("the imperative segmentation path (large merge tables) emits " +
      "exactly what the regex fold emits") {
    val train = Seq((1L, "low lower lowest low new newer newest wide"))
      .toDF("doc_id", "text")
    val merges = Bpe.learn(train, 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Seq((1L, "lower newest unseen"), (2L, "wide low qq"),
      (3L, "")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1), r.getInt(2))).toSeq
    val viaRegex = rows(Bpe.segment(docs, merges))
    val viaMap = rows(Bpe.segment(docs, merges, regexFoldLimit = 0))
    assert(viaMap === viaRegex)
    assert(viaRegex.map(_._1) === Seq(1L, 2L),
      "both paths drop the wordless doc")
  }

  test("learn releases each checkpoint generation: persisted-RDD " +
      "count does not grow with the merge count") {
    val docs = Seq((1L, "low lower lowest low new newer newest"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    Bpe.learn(docs, 12)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"stale checkpoint generations linger: $before -> $after")
  }
}
