package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-loop noise-robust measurement: `runMain graft.JobStats q93,ns46`
  * runs each named registry entry once (after the Bench warmup) and
  * reports per entry the number of Spark jobs, stages, tasks, and the
  * summed executor run/CPU time — counters a loaded machine cannot
  * skew the way it skews wall-clock (the guide §1 "measure first"
  * discipline when min-of-2 wall times wobble ±50%). Driver runs never
  * invoke it.
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    require(args.length == 1,
      "usage: graft.JobStats <name[,name...]> (SPARK_GRAFT_SF_DIR to set data)")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-jobstats",
      uiEnabled = false)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentHashMap[String,
      AtomicInteger]()
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val runMs = new AtomicLong(0L)
    val cpuMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        j.stageInfos.lastOption.foreach { si =>
          sites.computeIfAbsent(si.name, _ => new AtomicInteger(0))
            .incrementAndGet()
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        runMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        cpuMs.addAndGet(s.stageInfo.taskMetrics.executorCpuTime / 1000000L)
        ()
      }
    })
    def runOnce(n: String): Unit = {
      SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.execute().count()
      ()
    }
    try runOnce("q1_agg") catch { case _: Throwable => () } // JIT warmup
    names.foreach { n =>
      // two runs: run 1 pays any build-once fixture, run 2 is the
      // steady state the bench's min-of-2 actually reports
      (1 to 2).foreach { r =>
        // settle listener events from the previous run before zeroing
        Thread.sleep(800)
        jobs.set(0); stages.set(0); tasks.set(0L); runMs.set(0L); cpuMs.set(0L)
        sites.clear()
        val t0 = System.nanoTime()
        runOnce(n)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        println(f"STATS $n run=$r wall=$wall%.2f jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} runMs=${runMs.get} " +
          f"cpuMs=${cpuMs.get}")
        if (r == 2) {
          import scala.jdk.CollectionConverters._
          sites.asScala.toSeq.sortBy(-_._2.get).take(12).foreach {
            case (cs, c) => println(s"  SITE $n ${c.get} x $cs")
          }
        }
      }
    }
    spark.stop()
  }
}
