package graft

/** Dev harness: run one named query from [[SparkEntry.queries]], print
  * its formatted physical plan and wall time.
  *
  * Usage: runMain graft.Debug <query_name> <sfDir> [explain]
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Session.build("graft-debug")
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    if (args.contains("explainFinal")) {
      // AQE rewrites (incl. ReusedExchange) appear only in the FINAL plan
      val df = fn(spark, sfDir)
      df.collect()
      df.explain("formatted")
    }
    // warm repeats ("timesN" arg): per-pass wall times after warmup —
    // the steady-state number Bench's min-of-K reports
    args.find(_.startsWith("times")).map(_.drop(5).toInt).foreach { k =>
      for (i <- 1 to k) {
        val w0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[debug] $name pass $i: ${(System.nanoTime() - w0) / 1e9}%.2fs")
      }
    }
    // "jobs" arg: per-job wall timeline of one noop run — the fastest
    // way to see whether a query's floor is plan execution or driver-
    // action count (each line = one job: submit→complete wall, #stages,
    // #tasks, summed task time)
    if (args.contains("jobs")) {
      import org.apache.spark.scheduler._
      import scala.collection.mutable
      case class J(var t0: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
                   var taskMs: Long = 0L, var site: String = "")
      val jobs = mutable.LinkedHashMap[Int, J]()
      val stageToJob = mutable.HashMap[Int, Int]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
          val j = J(e.time, e.stageIds.size,
            site = Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse(""))
          jobs(e.jobId) = j
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null) j.taskMs += e.taskMetrics.executorRunTime
          }
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3).getOrElse(-1.0)
          if (wall > 0.2) // only the stages worth reading
            System.err.println(f"[stage] id=${si.stageId}%3d wall=$wall%5.2fs tasks=${si.numTasks}%4d ${si.name.take(60)} | ${si.details.linesIterator.filter(_.contains("graft")).take(2).mkString(" <- ")}")
          if (wall > 1.0) // deep stack for the truly slow ones
            System.err.println("[stack] " + si.details.linesIterator.take(14).mkString("\n[stack] "))
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
          jobs.get(e.jobId).foreach { j =>
            System.err.println(f"[jobs] job=${e.jobId}%3d wall=${(e.time - j.t0) / 1e3}%6.2fs stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskMs / 1e3}%6.2fs  ${j.site}")
          }
        }
      }
      // "warm" arg: run the query once BEFORE attaching the listener so
      // the profiled pass sees steady state (codegen compiled, footers
      // read, JIT warm) — cold-run job walls misattribute one-time costs
      if (args.contains("warm")) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(1500) // let the async listener bus drain
      val nJobs = jobs.synchronized(jobs.size)
      println(f"[debug] $name jobs=$nJobs wall=${(System.nanoTime() - w0) / 1e9}%.2fs")
      spark.stop(); return
    }
    val t0 = System.nanoTime()
    // same execution shape as Bench: noop write runs the full plan
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val t1 = (System.nanoTime() - t0) / 1e9
    val t2 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"[debug] $name rows=$n noop=$t1%.2fs count=${(System.nanoTime() - t2) / 1e9}%.2fs")
    spark.stop()
  }
}
