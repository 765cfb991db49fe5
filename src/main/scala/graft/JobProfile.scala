package graft

/** Dev tool: run one declared query to the noop sink and print every
  * Spark job it schedules (duration + call site / job description) —
  * the per-job attribution the optimization rounds need to tell "many
  * fixed-cost driver actions" from "one slow stage" without the UI.
  * The query runs twice; the SECOND run is profiled (codegen and
  * fixture-ensure costs land in the first).
  *
  * Usage: runMain graft.JobProfile <query> <sfDir>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <query> <sfDir>")
    val name = args(0)
    val sfDir = args(1)
    val spark = GraftSession.localFromEnv()
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Double)]
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Double, Double)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val st = j.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n')}[${si.numTasks}]")
          .mkString(" <- ")
        val desc = Option(j.properties.getProperty("spark.job.description"))
          .map(d => s"$d :: $st").getOrElse(st)
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobs.synchronized {
          jobs += ((j.jobId, s._2, s._1, (System.nanoTime() - s._1) / 1e9))
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        // first graft./probes. frame in the stage's call stack — the
        // attribution the generic AQE thread-pool name hides
        val ours = si.details.split('\n')
          .find(l => l.contains("graft.") && !l.contains("JobProfile"))
          .getOrElse("").trim
        val tm = si.taskMetrics
        val detail = f"deser=${tm.executorDeserializeTime / 1e3}%.2f " +
          f"gc=${tm.jvmGCTime / 1e3}%.2f cpu=${tm.executorCpuTime / 1e9}%.2f " +
          f"sr=${tm.shuffleReadMetrics.fetchWaitTime / 1e3}%.2f " +
          f"sw=${tm.shuffleWriteMetrics.writeTime / 1e9}%.2f " +
          f"in=${tm.inputMetrics.bytesRead}%d out=${tm.outputMetrics.bytesWritten}%d $ours"
        stages.synchronized {
          stages += ((si.stageId, detail, si.numTasks,
            si.taskMetrics.executorRunTime / 1e3, wall))
        }
      }
    })
    spark.range(1000).selectExpr("sum(id) s")
      .write.format("noop").mode("overwrite").save() // warm codegen
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm run
    spark.catalog.clearCache()
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // listener events are async; let the bus drain
    println(f"[jobprofile] $name total=$total%.3f s, ${jobs.size} jobs, " +
      f"job-sum=${jobs.map(_._4).sum}%.3f s")
    jobs.sortBy(_._3).foreach { case (id, d, st, sec) =>
      val off = (st - t0) / 1e9
      println(f"[jobprofile]   job=$id%3d @+$off%6.3f $sec%7.3f  ${d.take(150)}")
    }
    stages.sortBy(_._1).foreach { case (id, nm, nt, run, wall) =>
      println(f"[jobprofile]   stage=$id%3d tasks=$nt%3d run=$run%7.3f wall=$wall%7.3f  ${nm.take(100)}")
    }
    spark.stop()
  }
}
