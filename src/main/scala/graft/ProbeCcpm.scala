package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc warm-rep decomposition for corpus_curation_pipeline_minhash
  * (not part of the driver contract): runs the query once cold, then
  * (query name = arg 2) times each warm repetition with process-CPU deltas, and finally
  * re-times the query through the Bench action to attribute the warm
  * median. Run: `sbt "runMain graft.ProbeCcpm [sfDir]"`.
  */
object ProbeCcpm {
  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[probe] $label%-44s wall $wall%7.3f s  cpu $cpu%7.2f s")
      r
    }

    // per-job decomposition: each driver action inside the query is a
    // job; print its wall and summed executor CPU
    val jobCpu = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    var report = false
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
        jobCpu.put(js.jobId, 0L)
        jobStart.put(js.jobId, System.nanoTime())
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(sc.stageInfo.stageId, -1)
        if (jid >= 0)
          jobCpu.merge(jid, sc.stageInfo.taskMetrics.executorCpuTime, (a: Long, b: Long) => a + b)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (report) {
          val w = (System.nanoTime() - jobStart.getOrDefault(je.jobId, System.nanoTime())) / 1e9
          println(f"[job] ${je.jobId}%4d wall $w%7.3f s cpu ${jobCpu.getOrDefault(je.jobId, 0L) / 1e9}%7.2f s")
        }
    })

    val q = SparkEntry.queries(args.lift(1).getOrElse("corpus_curation_pipeline_minhash"))
    time("cold (stage builds)")(q(spark, sfDir).count())
    time("warm rep 1 full query")(q(spark, sfDir).count())
    report = true
    val df = time("warm rep 2: q(spark,dir) construction")(q(spark, sfDir))
    time("warm rep 2: final count on returned df")(df.count())
    report = false
    // thread-level attribution of warm-rep CPU: per-thread CPU deltas
    // plus one mid-rep stack snapshot of the busiest threads
    val tb = java.lang.management.ManagementFactory.getThreadMXBean
    val before = tb.getAllThreadIds.map(id => id -> tb.getThreadCpuTime(id)).toMap
    val snap = new java.util.concurrent.atomic.AtomicReference[Map[Long, (String, String)]](Map.empty)
    val watcher = new Thread(() => {
      Thread.sleep(800)
      val infos = tb.dumpAllThreads(false, false)
      snap.set(infos.map(ti => ti.getThreadId ->
        (ti.getThreadName, ti.getStackTrace.take(22).mkString(" <- "))).toMap)
    })
    watcher.setDaemon(true); watcher.start()
    time("warm rep 3 full query")(q(spark, sfDir).count())
    val after = tb.getAllThreadIds.map(id => id -> tb.getThreadCpuTime(id)).toMap
    val deltas = after.toSeq.map { case (id, c) =>
      (id, (c - before.getOrElse(id, 0L)) / 1e9)
    }.sortBy(-_._2).take(3)
    deltas.foreach { case (id, d) =>
      val (name, stack) = snap.get.getOrElse(id, (s"tid$id", ""))
      println(f"[thread] $d%7.2f s  $name%n    $stack")
    }
    spark.stop()
  }
}
