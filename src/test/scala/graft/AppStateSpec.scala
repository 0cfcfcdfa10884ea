package graft

/** Per-application state hygiene (round-8 verdict item 6): state dirs
  * registered with [[graft.lake.AppState]] must be gone after the
  * application-end sweep, and the sweep must touch NOTHING it wasn't
  * given. The listener wiring itself is fired by `spark.stop()` in
  * every Verify/Bench run (one JVM per run), so two sequential driver
  * invocations leave no orphaned state — here the register→sweep
  * contract runs against a synthetic app key so the shared test
  * session's own state set stays intact.
  */
class AppStateSpec extends SparkSpec {
  /** warehouse dir as a local filesystem path (the conf value is a
    * `file:` URI; java.io.File would treat that literally)
    */
  private def wh: String = {
    val w = spark.conf.get("spark.sql.warehouse.dir")
    if (w.startsWith("file:")) new java.net.URI(w).getPath else w
  }

  private def mkState(name: String): java.io.File = {
    val dir = new java.io.File(s"$wh/$name")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.toString, "part-0.parquet"), "x")
    dir
  }

  test("registered state dirs are deleted by the application-end sweep") {
    val a = mkState("graft_hygiene_test_a")
    val b = mkState("graft_hygiene_test_b")
    graft.lake.AppState.registerFor("hygiene-test-app", spark, a.toString)
    graft.lake.AppState.registerFor("hygiene-test-app", spark, b.toString)
    graft.lake.AppState.sweep("hygiene-test-app",
      spark.sparkContext.hadoopConfiguration)
    assert(!a.exists, s"registered state dir survived the sweep: $a")
    assert(!b.exists, s"registered state dir survived the sweep: $b")
  }

  test("sweep is scoped: unregistered dirs and other apps' state survive") {
    val mine = mkState("graft_hygiene_test_mine")
    val other = mkState("graft_hygiene_test_other")
    graft.lake.AppState.registerFor("hygiene-app-1", spark, mine.toString)
    graft.lake.AppState.registerFor("hygiene-app-2", spark, other.toString)
    graft.lake.AppState.sweep("hygiene-app-1",
      spark.sparkContext.hadoopConfiguration)
    assert(!mine.exists, "app-1's state must be deleted")
    assert(other.exists, "app-2's state must survive app-1's sweep")
    // second sweep of an already-swept app is a no-op
    graft.lake.AppState.sweep("hygiene-app-1",
      spark.sparkContext.hadoopConfiguration)
    assert(other.exists)
    graft.lake.AppState.sweep("hygiene-app-2",
      spark.sparkContext.hadoopConfiguration)
    assert(!other.exists)
  }

  test("q141's cluster-label state is create-if-absent and read back intact") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val path = s"$wh/graft_winnow_lbl_${graft.lake.AppState.tag(spark, sf)}"
    val first = graft.operators.Curation.winnowClusterState(spark, sf)
      .as[(Long, Long)].collect().sorted
    assert(new java.io.File(path).exists, "state dir must materialize on first touch")
    // second call reads the parquet (no rebuild) and sees identical labels
    val second = graft.operators.Curation.winnowClusterState(spark, sf)
      .as[(Long, Long)].collect().sorted
    assert(first.sameElements(second))
    assert(first.nonEmpty)
  }

  test("materializeOnce: concurrent first touches build once; both readers see the publish") {
    import spark.implicits._
    val path = s"$wh/graft_race_state"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def touch(): Array[Long] = {
      graft.lake.AppState.materializeOnce(spark, path) { tmp =>
        built.incrementAndGet()
        spark.range(100).write.mode("overwrite").parquet(tmp)
      }
      spark.read.parquet(path).as[Long].collect().sorted
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val task: java.util.concurrent.Callable[Array[Long]] = () => touch()
    try {
      val f1 = pool.submit(task)
      val f2 = pool.submit(task)
      val (r1, r2) = (f1.get(), f2.get())
      assert(built.get() == 1, s"racing first touches built ${built.get()} times")
      assert(r1.sameElements(r2) && r1.length == 100)
    } finally {
      pool.shutdown()
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  test("materializeOnce: a torn directory (no _SUCCESS) is rebuilt, never served") {
    import spark.implicits._
    val path = s"$wh/graft_torn_state"
    // simulate a killed first build: data file present, no _SUCCESS
    val torn = new java.io.File(path)
    torn.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-0.parquet"), "garbage")
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.lake.AppState.materializeOnce(spark, path) { tmp =>
      built.incrementAndGet()
      spark.range(7).write.mode("overwrite").parquet(tmp)
    }
    assert(built.get() == 1, "torn dir must trigger a rebuild")
    assert(spark.read.parquet(path).as[Long].collect().sorted.sameElements(0L until 7L))
    // and once published, a later touch trusts the _SUCCESS and skips
    graft.lake.AppState.materializeOnce(spark, path) { tmp =>
      built.incrementAndGet()
      spark.range(7).write.mode("overwrite").parquet(tmp)
    }
    assert(built.get() == 1, "published state must not rebuild")
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
  }
}
