package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
    // Warm-up outside the timed loop: scheduler, codegen compiler, parquet
    // footer caches — otherwise whichever query HashMap order puts first
    // absorbs several seconds of one-time JVM cost.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      // prime the text path too (explode + window codegen, documents footer)
      graft.operators.TextOps.explodedShingles(
        spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
        Seq("doc_id"), "text", 3).count()
    } catch { case _: Throwable => () }
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // Dev-only watchdog: if a query stalls >25 s, dump all thread stacks
    // once so the blocked frame is visible (stalls here have historically
    // been blocked threads, not compute).
    @volatile var watching: String = null
    if (debug) {
      val w = new Thread(() => {
        var last: String = null; var since = 0L
        while (true) {
          val cur = watching
          if (cur == null || cur != last) { last = cur; since = System.nanoTime() }
          else if ((System.nanoTime() - since) / 1e9 > 25) {
            System.err.println(s"[benchdbg] STALL in $cur — hunting CPU burner:")
            // sample per-TID cpu over 3 s, print the top burners' comm +
            // kernel stack (requires root; /proc/self/task is always ours)
            def cpuByTid(): Map[String, (Long, Long)] = {
              val dir = new java.io.File("/proc/self/task")
              dir.listFiles().map { t =>
                val parts = scala.io.Source.fromFile(s"${t.getPath}/stat").mkString.split(" ")
                t.getName -> (parts(13).toLong, parts(14).toLong) // utime, stime
              }.toMap
            }
            try {
              val s0 = cpuByTid(); Thread.sleep(3000); val s1 = cpuByTid()
              val deltas = s1.flatMap { case (tid, (u1, st1)) =>
                s0.get(tid).map { case (u0, st0) => (tid, u1 - u0, st1 - st0) }
              }.toSeq.sortBy(t => -(t._2 + t._3)).take(3)
              deltas.foreach { case (tid, du, ds) =>
                val comm = scala.util.Try(scala.io.Source.fromFile(s"/proc/self/task/$tid/comm").mkString.trim).getOrElse("?")
                val kstack = scala.util.Try(scala.io.Source.fromFile(s"/proc/self/task/$tid/stack").mkString).getOrElse("?")
                System.err.println(s"  == tid=$tid comm=$comm user=${du}j sys=${ds}j kernel-stack:\n$kstack")
              }
              // also the Java-side stack of matching threads by name prefix
              import scala.jdk.CollectionConverters._
              val names = deltas.map(_._1).flatMap(tid => scala.util.Try(
                scala.io.Source.fromFile(s"/proc/self/task/$tid/comm").mkString.trim).toOption)
              Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
                if (names.exists(n => t.getName.startsWith(n.take(12)))) {
                  System.err.println(s"  == JAVA ${t.getName} ${t.getState}")
                  st.take(15).foreach(f => System.err.println(s"     $f"))
                }
              }
            } catch { case e: Throwable => System.err.println(s"  (hunt failed: $e)") }
            since = System.nanoTime() + 120L * 1000 * 1000 * 1000 // re-dump in 2 min
          }
          Thread.sleep(1000)
        }
      })
      w.setDaemon(true); w.start()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val g0 = gcMs
      watching = name
      val t0 = System.nanoTime()
      // noop-format write executes the FULL plan including final sorts;
      // `.count()` would let Catalyst eliminate each query's ORDER BY
      // (EliminateSorts under the count agg), under-measuring sort cost.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      if (debug) {
        val rt = Runtime.getRuntime
        val usedMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
        val storMb = spark.sparkContext.getExecutorMemoryStatus.values
          .map { case (max, free) => (max - free) / (1024 * 1024) }.sum
        System.err.println(f"[benchdbg] $name%-24s t=$dt%7.2fs gc=${gcMs - g0}%5dms heap=${usedMb}MB storage=${storMb}MB")
      }
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
