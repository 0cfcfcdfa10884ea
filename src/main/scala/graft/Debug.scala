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
