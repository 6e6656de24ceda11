package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ml.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VecRow(vec_id: Long, embedding: Array[Float])

case class VecIdRow(vec_id: Long)

/** Streaming IVF maintenance: micro-batches of vectors append to the
  * served index's stream table against the STORED centroids; serving
  * base ∪ stream equals a from-scratch build of the union (assignment
  * is a pure function of the centroids); replays absorb; recycled
  * batch ids fail loudly.
  */
class VectorIngestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def embs = Tables.embeddings(spark, dir)

  private def vecRows(df: org.apache.spark.sql.DataFrame): Seq[VecRow] = {
    val spark0 = spark
    import spark0.implicits._
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .map { case (id, e) => VecRow(id, e) }
  }

  test("streamed appends serve identically to a from-scratch union " +
      "build; pre-stream queries fall back to the base alone") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val initial = embs.filter(col("vec_id") % 4 =!= 0)
    val cents = Similarity.seedCentroids(initial, nCells = 16)
    val tmp = java.nio.file.Files.createTempDirectory("vec_ingest")
    val idx = tmp.resolve("idx").toString
    Similarity.writeIvfIndex(initial, cents, idx)
    def served() = VectorIngest.queryServed(spark, idx, embs, cents,
      k = 5, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // before any batch: identical to querying the base index
    val baseOnly = Similarity.queryIvfIndex(spark, idx, embs, cents,
      k = 5, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served() === baseOnly)
    // stream the held-out quarter in two micro-batches
    val rest = vecRows(embs.filter(col("vec_id") % 4 === 0))
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val in = MemoryStream[VecRow]
    val q = VectorIngest.start(in.toDF(), idx,
      tmp.resolve("ckpt").toString)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // union-equivalence: same centroids → same assignment → the
    // streamed index IS the full index
    val full = tmp.resolve("full").toString
    Similarity.writeIvfIndex(embs, cents, full)
    val fromScratch = Similarity.queryIvfIndex(spark, full, embs, cents,
      k = 5, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served() === fromScratch)
  }

  test("PQ streamed appends (codes encoded against the stored " +
      "codebook) serve identically to a from-scratch PQ union build") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val initial = embs.filter(col("vec_id") % 4 =!= 0)
    val cents = Similarity.seedCentroids(initial, nCells = 16)
    val cb = Similarity.fitPqCodebook(initial, nSub = 8,
      codesPerSub = 16, iters = 1)
    val tmp = java.nio.file.Files.createTempDirectory("vec_ingest_pq")
    val idx = tmp.resolve("idx").toString
    Similarity.writeIvfPqIndex(initial, cents, cb, nSub = 8, idx)
    def served() = VectorIngest.queryServedPq(spark, idx, embs, embs,
      k = 5, refine = 50, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // before any batch: the base alone
    val baseOnly = Similarity.queryIvfPqIndex(spark, idx, embs, embs,
      k = 5, refine = 50, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served() === baseOnly)
    val rest = vecRows(embs.filter(col("vec_id") % 4 === 0))
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val in = MemoryStream[VecRow]
    val q = VectorIngest.startPq(in.toDF(), idx,
      tmp.resolve("ckpt").toString)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val full = tmp.resolve("full").toString
    Similarity.writeIvfPqIndex(embs, cents, cb, nSub = 8, full)
    val fromScratch = Similarity.queryIvfPqIndex(spark, full, embs,
      embs, k = 5, refine = 50, probes = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served() === fromScratch)
  }

  test("a replayed batch is absorbed; a recycled batch id with " +
      "different content fails loudly") {
    val initial = embs.filter(col("vec_id") % 4 =!= 0)
    val cents = Similarity.seedCentroids(initial, nCells = 16)
    val tmp = java.nio.file.Files.createTempDirectory("vec_replay")
    val idx = tmp.resolve("idx").toString
    Similarity.writeIvfIndex(initial, cents, idx)
    val batch = embs.filter(col("vec_id") % 4 === 0)
    VectorIngest.ingestBatch(batch, 0L, idx)
    val n1 = spark.read.parquet(VectorIngest.streamPath(idx)).count()
    // replay: same id, same content — absorbed, nothing duplicated
    VectorIngest.ingestBatch(batch, 0L, idx)
    assert(spark.read.parquet(VectorIngest.streamPath(idx)).count() === n1)
    // recycled id: same id, DIFFERENT content — loud failure
    intercept[IllegalArgumentException] {
      VectorIngest.ingestBatch(batch.limit(3), 0L, idx)
    }
  }

  test("streamed deletes mask base AND streamed vectors; compaction " +
      "refuses while the stream sibling exists") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val initial = embs.filter(col("vec_id") % 4 =!= 0)
    val cents = Similarity.seedCentroids(initial, nCells = 16)
    val tmp = java.nio.file.Files.createTempDirectory("vec_sdel")
    try {
      val idx = tmp.resolve("idx").toString
      Similarity.writeIvfIndex(initial, cents, idx)
      // the held-out quarter arrives via a streamed append
      VectorIngest.ingestBatch(embs.filter(col("vec_id") % 4 === 0),
        0L, idx)
      // delete one base vector and one streamed vector via the stream
      val dead = Seq(3L, 4L)
      val in = MemoryStream[VecIdRow]
      val q = VectorIngest.startDeletes(in.toDF(), idx,
        tmp.resolve("dckpt").toString)
      try {
        in.addData(VecIdRow(3L)); q.processAllAvailable()
        in.addData(VecIdRow(4L)); q.processAllAvailable()
      } finally q.stop()
      val alive = embs.filter(!col("vec_id").isin(dead.map(x => x: Any): _*))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      val served = rows(VectorIngest.queryServed(spark, idx, alive,
        cents, k = 5, probes = 3))
      val full = tmp.resolve("full").toString
      Similarity.writeIvfIndex(alive, cents, full)
      assert(served === rows(Similarity.queryIvfIndex(spark, full,
        alive, cents, k = 5, probes = 3)))
      assert(served.nonEmpty)
      assert(!served.exists(r => dead.contains(r._3)))
      val ex = intercept[IllegalArgumentException] {
        Similarity.compactIvfIndex(spark, idx)
      }
      assert(ex.getMessage.contains("_stream"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }
}
