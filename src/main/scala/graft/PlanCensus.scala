package graft

/** Round-15 measurement harness (guide §1: measure first).
  *
  * One warm shared session; for every registered query (or the
  * SPARK_GRAFT_BENCH_ONLY subset): write the FINAL adaptive plan to
  * plans/<tag>/<name>_<suffix>.txt and append a census line
  * (wall seconds, job/stage/task counts, summed task time, Exchange /
  * join-strategy counts parsed from the final plan) to
  * plans/<tag>/census.tsv. The census separates "plan cost" (task time)
  * from "orchestration cost" (jobs × scheduling + driver work between
  * jobs) — the two levers this optimization round pulls.
  *
  * Usage: runMain graft.PlanCensus <sfDir> <tag> <suffix>
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else "r15"
    val suffix = if (args.length > 2) args(2) else "before"
    val outDir = new java.io.File(s"plans/$tag"); outDir.mkdirs()
    val spark = Session.build("graft-census")
    val sc = spark.sparkContext

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(e.stageIds.size); ()
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
        ()
      }
    })

    val census = new java.io.PrintWriter(new java.io.FileWriter(s"plans/$tag/census_$suffix.tsv"))
    census.println("query\twall_s\tjobs\tstages\ttasks\ttask_s\texchanges\tsmj\tbhj\tshj\tscans\tsorts")
    def dropCheckpoints(): Unit =
      sc.getPersistentRDDs.values.foreach(_.unpersist(false))
    qs.foreach { case (name, fn) =>
      // warm once so the census pass measures steady-state (codegen
      // compiled, footers read) — same discipline as the bench
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        dropCheckpoints()
        Thread.sleep(300) // let the async listener bus drain
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        // final adaptive plan (post-execution: AQE rewrites visible)
        val plan = df.queryExecution.executedPlan.toString
        val formatted = org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")
        val ftxt = df.queryExecution.explainString(formatted)
        val pw = new java.io.PrintWriter(s"plans/$tag/${name}_$suffix.txt")
        pw.println(ftxt); pw.close()
        def cnt(s: String, pat: String) = pat.r.findAllIn(s).size
        census.println(f"$name\t$wall%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskMs.get / 1e3}%.2f\t" +
          s"${cnt(plan, "Exchange ")}\t${cnt(plan, "SortMergeJoin")}\t${cnt(plan, "BroadcastHashJoin")}\t" +
          s"${cnt(plan, "ShuffledHashJoin")}\t${cnt(plan, "Scan parquet")}\t${cnt(plan, "Sort ")}")
        census.flush()
        dropCheckpoints()
      } catch { case e: Throwable =>
        census.println(s"$name\tFAIL ${e.getClass.getSimpleName}")
        census.flush()
      }
    }
    census.close()
    spark.stop()
  }
}
