package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Driver-job audit for one SparkEntry query: counts the Spark JOBS,
  * stages and tasks one drive schedules, plus wall-clock — the
  * measurement behind the composed store drives' scheduling-floor
  * work (a multi-batch lifecycle like q_store_collapse spends its
  * wall on ~hundreds of sub-second driver jobs, so "fewer jobs at
  * identical parity" is the optimization target and this is its
  * meter; see PLANS.md). ScaleRehearsal measures operator volumes at
  * scale; this measures DRIVER-SIDE scheduling cost at gate scale.
  *
  * Usage: runMain graft.JobAudit <sfDir> <query> [query...]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench's session (Spark-default bypass writer — see Bench)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "200"))
      // raw local fs: the default checksummed LocalFileSystem shadows
      // EVERY created file with a .crc twin (doubling create/rename/
      // delete metadata ops on the store dirs); file: is a local-bench
      // substrate only — production store paths are HDFS/object-store
      // schemes where this key is inert. Env-overridable for A/B.
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS_IMPL",
          "org.apache.hadoop.fs.RawLocalFileSystem"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        stages.addAndGet(j.stageInfos.size)
        ()
      }
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        tasks.incrementAndGet()
        ()
      }
    })
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      ScratchCache.releaseAll(spark)
      // listener bus is async; flush so the counts are complete
      org.apache.spark.graft.ListenerFlush.waitUntilEmpty(spark.sparkContext)
      println(f"""{"query":"$name","jobs":${jobs.get}""" +
        f""","stages":${stages.get},"tasks":${tasks.get}""" +
        f""","rows":$n,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
