package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-application materialized-state hygiene (round-8 verdict item 6).
  *
  * Create-if-absent state — q122's bucketed tables, q142's incremental-CC
  * pair-count/label relations, q141's cluster-label cache — is keyed on
  * (dataset, applicationId) so concurrent JVMs can never read each
  * other's state. That same uniqueness means a finished application's
  * directories are garbage no later run will ever read: without cleanup
  * a long-lived host accumulates one copy per application in the shared
  * warehouse/tmp dir (a disk leak, not a correctness bug).
  *
  * Every state path registers here; the first registration per
  * SparkContext attaches ONE listener that deletes all registered paths
  * when the application ends (managed bucketed tables only need their
  * warehouse directory removed — the in-memory catalog dies with the
  * app). Deletion failures are swallowed: hygiene must never fail a
  * shutdown.
  */
object AppState {
  private val registered =
    scala.collection.mutable.Map[String, scala.collection.mutable.Set[String]]()

  /** Tag unique per (dataset, application) — the state-dir naming key
    * shared by every create-if-absent site.
    */
  def tag(s: SparkSession, dataset: String): String =
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        dataset + "|" + s.sparkContext.applicationId))

  /** Register `path` for deletion at application end; returns it. */
  def register(s: SparkSession, path: String): String =
    registerFor(s.sparkContext.applicationId, s, path)

  // Serializes create-if-absent builds WITHIN this JVM (cross-JVM safety
  // comes from the appId-unique path). Separate from the registration
  // monitor so a minutes-long state build never blocks registerFor.
  private val buildMtx = new Object

  /** Create-if-absent materialization with an ATOMIC publish (round-9
    * advice: the bare exists-check-then-write is neither atomic nor
    * completeness-checked — an interrupted first build leaves a partial
    * parquet directory every later consumer trusts, and two concurrent
    * first-touch threads race the overwrite).
    *
    * Contract: `build(tmpDir)` writes a COMPLETE parquet relation (with
    * Spark's `_SUCCESS` marker) to `tmpDir`; the helper renames it into
    * `path` in one filesystem op. An existing `path` is trusted only if
    * its `_SUCCESS` marker survives — a torn directory from a killed
    * earlier process is deleted and rebuilt, never served. Concurrent
    * same-JVM first touches serialize on [[buildMtx]]; the loser sees
    * the winner's publish and skips its build.
    */
  def materializeOnce(s: SparkSession, path: String)(build: String => Unit): String =
    buildMtx.synchronized {
      val hp = new Path(path)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val published = fs.exists(new Path(hp, "_SUCCESS"))
      if (!published) {
        if (fs.exists(hp)) fs.delete(hp, true) // torn earlier build
        val tmp = new Path(path + ".__building")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        build(tmp.toString)
        if (!fs.exists(new Path(tmp, "_SUCCESS"))) {
          fs.delete(tmp, true)
          throw new IllegalStateException(
            s"materializeOnce: build produced no _SUCCESS marker at $tmp — " +
              "refusing to publish a possibly-partial state directory")
        }
        if (!fs.rename(tmp, hp)) {
          fs.delete(tmp, true)
          throw new IllegalStateException(
            s"materializeOnce: atomic rename $tmp -> $hp failed")
        }
      }
      path
    }

  /** Registration under an explicit app key — lets AppStateSpec
    * exercise the register→sweep contract against a synthetic key
    * without touching the shared test session's real state set.
    */
  private[graft] def registerFor(appId: String, s: SparkSession,
                                 path: String): String = synchronized {
    val sc = s.sparkContext
    val hadoopConf = sc.hadoopConfiguration
    val set = registered.getOrElseUpdate(appId, {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          sweep(appId, hadoopConf)
      })
      scala.collection.mutable.Set[String]()
    })
    set += path
    path
  }

  /** Delete everything registered under `appId`. Package-visible so the
    * hygiene contract is testable without stopping the shared test
    * session (the listener wiring itself is exercised end-to-end by any
    * Verify/Bench run, whose `spark.stop()` fires it).
    */
  private[graft] def sweep(appId: String,
                           conf: org.apache.hadoop.conf.Configuration): Unit = {
    val paths = synchronized(registered.remove(appId).map(_.toSeq).getOrElse(Seq.empty))
    paths.foreach { p =>
      try {
        val hp = new Path(p)
        val fs = hp.getFileSystem(conf)
        if (fs.exists(hp)) fs.delete(hp, true)
      } catch { case _: Throwable => () }
    }
  }
}
