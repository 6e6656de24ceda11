package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embedding: array<float>`).
  *
  * Baseline: brute-force cosine top-k (quadratic, exact). Scale path:
  * IVF — assign every vector to its nearest centroid, search only
  * within the probed cells; the pair space shrinks from N² to
  * N²/cells·probes. Both are pure DataFrame plans; the dot products are
  * `aggregate`/`zip_with` Column math inside whole-stage codegen, no
  * UDFs.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — computed exactly
    * like DuckDB's list_cosine_similarity (dot / (|a|·|b|)) so oracle
    * results agree bit-for-bit before rounding.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All pairs (i < j) with cosine ≥ threshold — the embedding
    * near-duplicate detector. Brute-force upper-triangle join; at scale
    * the same predicate runs after an LSH/IVF candidate cut.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("i"),
      asDouble(col("embedding")).as("ea"))
    val b = embeddings.select(col("vec_id").as("j"),
      asDouble(col("embedding")).as("eb"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }

  /** Exact brute-force cosine top-k neighbors per vector. Ordering is on
    * the rounded similarity with vec_id tiebreak, so ranking is
    * deterministic and oracle-stable.
    */
  def bruteTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val a = embeddings.select(col("vec_id").as("i"),
      asDouble(col("embedding")).as("ea"))
    val b = embeddings.select(col("vec_id").as("j"),
      asDouble(col("embedding")).as("eb"))
    val w = Window.partitionBy(col("i"))
      .orderBy(col("cos").desc, col("j"))
    a.crossJoin(b).filter(col("i") =!= col("j"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("i"), col("rk"), col("j"), col("cos"))
  }

  /** IVF-style ANN: the vectors whose vec_id < nCells serve as
    * deterministic "centroids" (a stand-in for k-means, which would be
    * fit offline); every vector is assigned to its nearest centroid by
    * cosine; queries probe only their own cell. Returns top-k per vector
    * *within its cell* — approximate by construction.
    *
    * Scale shape: centroids broadcast to every executor; the expensive
    * join is vector×centroid (N·C, linear), then a per-cell self-join
    * whose size is Σ|cell|² ≪ N².
    */
  def ivfTopK(embeddings: DataFrame, nCells: Int, k: Int): DataFrame = {
    val cents = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), asDouble(col("embedding")).as("ce"))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell"))
    val assigned = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", round(cosine(col("e"), col("ce")), 6))
      .withColumn("crk", row_number().over(assignW))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val a = assigned.select(col("vec_id").as("i"), col("e").as("ea"),
      col("cell"))
    val b = assigned.select(col("vec_id").as("j"), col("e").as("eb"),
      col("cell"))
    val w = Window.partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
    a.join(b, Seq("cell")).filter(col("i") =!= col("j"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("i"), col("cell"), col("rk"), col("j"), col("cos"))
  }
}
