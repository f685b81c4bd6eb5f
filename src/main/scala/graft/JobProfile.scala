package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Perf-iteration tool (guide §1): run named queries once each and print a
  * per-Spark-job wall-clock breakdown — job id, seconds, stage/task counts
  * and the first line of the job's call site — so "where does this query's
  * time go" is answerable without a UI. Mirrors Bench's session config
  * (same master/shuffle-partitions envs) so the breakdown reflects what the
  * bench measures. Not part of the driver contract; never run by the driver.
  *
  * Usage: runMain graft.JobProfile <sfDir> <query> [query ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, start: Long, var end: Long = -1L,
                         var stages: Int = 0, var tasks: Int = 0,
                         var site: String = "", var names: String = "")
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    val runMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = Job(js.jobId, System.nanoTime())
        j.stages = js.stageInfos.size
        j.tasks = js.stageInfos.map(_.numTasks).sum
        j.site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("")
        j.names = js.stageInfos.map(si => si.name.take(60)).mkString(" | ")
        jobs(js.jobId) = j
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = System.nanoTime())
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime)
        }
    })

    // one warmup so classloading/codegen JIT doesn't pollute the first query
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()

    args.drop(1).foreach { q =>
      jobs.synchronized(jobs.clear())
      cpuNs.set(0L); runMs.set(0L)
      System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"===== $q rows=$n total=$total%.2fs =====")
      val snap = jobs.synchronized(jobs.values.toSeq)
      val accounted = snap.filter(_.end > 0).map(j => (j.end - j.start) / 1e9).sum
      snap.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e9 else Double.NaN
        println(f"  job ${j.id}%4d ${dur}%7.3fs stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site} [${j.names}]")
      }
      println(f"  jobs=${snap.size} accounted=$accounted%.2fs cpu=${cpuNs.get / 1e9}%.2fs taskRun=${runMs.get / 1e3}%.2fs")
    }
    spark.stop()
  }
}
