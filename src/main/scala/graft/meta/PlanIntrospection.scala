package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan traversal helpers shared by the plan dump
  * (graft.Plans) and the layout/bandwidth specs.
  *
  * AQE wraps materialized stages as LEAF nodes (ResultQueryStage →
  * ShuffleQueryStage → Exchange), so `plan.collect` from the root
  * never reaches the operators inside a stage — every metric reader
  * here descends through each stage's wrapped plan explicitly.
  */
object PlanIntrospection {

  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Execute `df`'s own QueryExecution (count() would re-plan and
    * foreach/rdd would run a separate rddQueryExecution — neither
    * populates THIS plan's metrics) and return the summed parquet-scan
    * (numFiles, numOutputRows). numOutputRows counts rows surviving
    * parquet row-group skipping: PushedFilters prune row groups by
    * min-max before any decode, so this pair measures layout-driven
    * IO savings directly.
    */
  def fileScanMetrics(df: DataFrame): (Long, Long) = {
    df.queryExecution.executedPlan.execute().count()
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec =>
        (f.metrics("numFiles").value, f.metrics("numOutputRows").value)
    }
    require(scans.nonEmpty, "no parquet scan in the executed plan")
    (scans.map(_._1).sum, scans.map(_._2).sum)
  }

  /** [[fileScanMetrics]] restricted to scans rooted under
    * `pathSubstring`, excluding the `_graft_*` model sidecars — for
    * plans that legitimately read several tables (a PQ probe reads
    * index cells + stored centroids + codebook + the re-score store)
    * where only ONE scan's pruning is under test.
    */
  def fileScanMetricsFor(df: DataFrame, pathSubstring: String)
      : (Long, Long) = {
    df.queryExecution.executedPlan.execute().count()
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(p => p.toString.contains(pathSubstring) &&
            !p.toString.contains("_graft_")) =>
        (f.metrics("numFiles").value, f.metrics("numOutputRows").value)
    }
    require(scans.nonEmpty, s"no parquet scan under $pathSubstring")
    (scans.map(_._1).sum, scans.map(_._2).sum)
  }
}
