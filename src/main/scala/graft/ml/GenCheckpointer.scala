package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-scoped checkpoint manager for iterative driver loops
  * (BPE training, label propagation): each `cut` truncates the
  * iterate's lineage and RECLAIMS the superseded generation —
  * without reclamation a 30k-iteration loop accumulates one full
  * corpus copy per iteration (executor storage blocks on the local
  * path; `rdd-<id>` snapshot dirs on disk on the reliable path).
  *
  * `reliable = false`: `localCheckpoint` — executor-storage blocks,
  * fast, lost with an executor; right for local mode and short loops.
  * `reliable = true`: `checkpoint()` through the fault-tolerant
  * checkpoint dir (`sc.setCheckpointDir` required up front, not
  * discovered by a mid-loop crash), surviving executor loss.
  *
  * Both paths scope reclamation with the same snapshot-diff idiom —
  * `getPersistentRDDs` before/after for storage blocks, a checkpoint-
  * dir listing before/after for snapshot dirs — so only generations
  * THIS loop created are ever freed, never other cached work. The
  * previous generation is freed only after the new one is fully
  * materialized (both checkpoint flavors are eager here), so a crash
  * between generations always leaves one complete snapshot.
  *
  * Call `close()` when the loop's result has been consumed onto the
  * driver (BPE's merge table); SKIP it when the returned DataFrame
  * IS the last generation (label propagation) — the caller still
  * reads those blocks/files.
  *
  * SINGLE-CALLER contract: the snapshot-diff claims everything that
  * appeared between `before` and `after` as this loop's generation,
  * so two concurrent driver threads checkpointing against the same
  * SparkContext could claim (and later delete) each other's
  * artifacts. The iterative operators built on this (BPE training,
  * label propagation) are whole-cluster driver loops — run one at a
  * time per context, or give each its own checkpoint dir.
  */
private[graft] final class GenCheckpointer(spark: SparkSession,
    reliable: Boolean) {
  private val sc = spark.sparkContext
  require(!reliable || sc.getCheckpointDir.isDefined,
    "reliable=true needs sc.setCheckpointDir(...) before the loop")

  private lazy val ckptDir =
    new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
  private lazy val ckptFs =
    ckptDir.getFileSystem(sc.hadoopConfiguration)

  private var gen = Set.empty[String]

  private def snapshot(): Set[String] =
    if (reliable) {
      if (!ckptFs.exists(ckptDir)) Set.empty
      else ckptFs.listStatus(ckptDir).map(_.getPath.toString).toSet
    } else sc.getPersistentRDDs.keySet.toSet.map((_: Int).toString)

  private def free(g: Set[String]): Unit =
    if (reliable) g.foreach(p =>
      ckptFs.delete(new org.apache.hadoop.fs.Path(p), true))
    else g.foreach(id => sc.getPersistentRDDs.get(id.toInt)
      .foreach(_.unpersist(false)))

  /** Checkpoint `df` eagerly as the new generation; free the previous
    * one. */
  def cut(df: DataFrame): DataFrame = {
    val before = snapshot()
    val out = if (reliable) df.checkpoint(true)
      else df.localCheckpoint(true)
    val mine = snapshot() -- before
    free(gen)
    gen = mine
    out
  }

  /** Free the LAST generation too — only once its content has been
    * consumed (e.g. collected to the driver). */
  def close(): Unit = { free(gen); gen = Set.empty }
}
