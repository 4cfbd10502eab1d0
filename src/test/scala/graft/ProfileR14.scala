package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-14 optimization probe: for each named query, N timed runs with
  * per-run JOB / STAGE / TASK counts and summed task time from a
  * listener — separates scheduler overhead (many tiny jobs/stages) from
  * genuine compute (task time >> wall means parallel compute; wall >>
  * task time means the driver or scheduling dominates).
  *
  * Usage: `sbt "Test/runMain graft.ProfileR14 <sfDir> <runs> q1 q2 ..."`
  * (defaults: sf0.1, 3 runs, the round-14 watch list).
  */
object ProfileR14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("pipeline_ingest_stream", "pipeline_ingest_drift",
        "pipeline_pack_incr", "pipeline_ingest_quarantine",
        "graph_ppr", "graph_pagerank", "dedup_setsim_exact",
        "multimodal_png", "pipeline_quality_classifier",
        "pipeline_curate_neardup", "dedup_suffix_lrs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROFILE_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROFILE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def drain(): Unit =
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)

    println(f"${"query"}%-30s run   wall    jobs stages  tasks  taskSum  sh_mb")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 to runs).foreach { i =>
        drain()
        val (j0, s0, t0, m0, sh0) = (jobs.get, stages.get, tasks.get,
          taskMs.get, shuffleRead.get)
        val w0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - w0) / 1e9
        drain()
        val tag = if (i == 0) "prime" else s"r$i"
        println(f"$name%-30s $tag%-5s $wall%6.2f  ${jobs.get - j0}%5d " +
          f"${stages.get - s0}%6d ${tasks.get - t0}%6d " +
          f"${(taskMs.get - m0) / 1e3}%7.1fs ${(shuffleRead.get - sh0) / 1e6}%6.1f")
      }
    }
    spark.stop()
  }
}
