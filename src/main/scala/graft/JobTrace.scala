package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock trace for one SparkEntry query — the drill-down
  * behind JobAudit's totals: where a ~90-job composed store drive
  * actually spends its wall. Prints every job's duration, call site
  * and task count (slowest first), plus per-stage shuffle/input bytes
  * for the slowest jobs, so the expensive ACTION inside a multi-batch
  * lifecycle is attributable from one run.
  *
  * Usage: runMain graft.JobTrace <sfDir> <query> [topN]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val topN = if (args.length > 2) args(2).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class Job(id: Int, start: Long, callSite: String,
        var end: Long = -1L, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    final case class Stg(jobId: Int, name: String, tasks: Int,
        shuffleRead: Long, shuffleWrite: Long, input: Long, execRunMs: Long)
    val stages = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Stg]())
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(j.jobId, Job(j.jobId, j.time, cs))
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach(_.end = j.time)
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val jid = Option(stageToJob.get(si.stageId)).getOrElse(-1)
        stages.add(Stg(jid, si.name, si.numTasks,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.inputMetrics.bytesRead,
          si.taskMetrics.executorRunTime))
        Option(jobs.get(jid)).foreach(_.tasks += si.numTasks)
        ()
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    ScratchCache.releaseAll(spark)
    org.apache.spark.graft.ListenerFlush.waitUntilEmpty(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    val all = jobs.values().asScala.toSeq.sortBy(j => -(j.end - j.start))
    println(f"== $name: ${all.size} jobs, $sec%.2f s wall, $n rows ==")
    val byJob = stages.asScala.toSeq.groupBy(_.jobId)
    all.take(topN).foreach { j =>
      val ms = if (j.end > 0) j.end - j.start else -1L
      println(f"  job ${j.id}%4d ${ms}%6d ms  tasks ${j.tasks}%5d  ${j.callSite}")
      byJob.getOrElse(j.id, Nil).sortBy(-_.execRunMs).take(3).foreach { s =>
        println(f"      stage exec=${s.execRunMs}%6d ms tasks=${s.tasks}%4d " +
          f"in=${s.input / 1024}%8d KB sr=${s.shuffleRead / 1024}%7d KB " +
          f"sw=${s.shuffleWrite / 1024}%7d KB  ${s.name.take(90)}")
      }
    }
    val tot = all.filter(_.end > 0).map(j => j.end - j.start).sum
    println(f"  sum(job walls) = ${tot}%d ms; gaps (driver-side) = " +
      f"${(sec * 1000).toLong - tot}%d ms")
    spark.stop()
  }
}
