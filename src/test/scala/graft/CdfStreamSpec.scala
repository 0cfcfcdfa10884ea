package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType
import graft.lake.ManifestLake
import graft.streaming.CdfStream

/** Streaming change-data-feed source ([[graft.streaming.CdfStream]]):
  * Spark's file source over the manifest pointers drives continuous
  * incremental view maintenance — a live query must follow commits with
  * no driver polling loop, converge bit-exactly to recomputation, and
  * resume from its checkpoint across a restart.
  */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val D = DecimalType(38, 10)

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_cdfs_$name").toString

  private def bucketed(seq: Long, rows: Seq[(Long, String, Double)]): DataFrame =
    rows.map { case (id, status, price) => (id, status, price, seq) }
      .toDF("id", "status", "price", "seq")
      .withColumn("bucket", pmod(hash($"id"), lit(4)).cast("string"))

  private def merge(lake: String, df: DataFrame): Unit = {
    ManifestLake.mergeKeyed(spark, df, lake, keys = Seq("bucket"),
      dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
    ()
  }

  private def recompute(lake: String): Map[String, (Long, BigDecimal)] =
    ManifestLake.read(spark, lake)
      .groupBy($"status")
      .agg(count(lit(1)).as("n"), sum($"price".cast(D)).as("rev"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  private def viewState(view: String): Map[String, (Long, BigDecimal)] =
    if (ManifestLake.latestVersion(spark, view) == 0L) Map.empty
    else CdfStream.readView(spark, view, Seq("status"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  private def await(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < end) {
      if (cond) return true
      Thread.sleep(250L)
    }
    cond
  }

  test("a continuous query maintains the aggregate view across live merges, erasures included") {
    val lake = tmpDir("src") + "/lake"
    val view = tmpDir("view") + "/view"
    val ckpt = tmpDir("ckpt")
    merge(lake, bucketed(1, Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))))
    val q = CdfStream.maintainAgg(spark, lake, view,
      keyCols = Seq("id"), dims = Seq("status"), valueCol = "price",
      checkpoint = ckpt, trigger = Trigger.ProcessingTime("300 milliseconds"))
    try {
      assert(await(60000L) { viewState(view) == recompute(lake) },
        s"view never converged to v1: ${viewState(view)} vs ${recompute(lake)}")
      // live merge 2: a correction + an insert, while the query runs
      merge(lake, bucketed(2, Seq((1L, "A", 15.0), (4L, "B", 40.0))))
      assert(await(60000L) { viewState(view) == recompute(lake) },
        s"view never followed v2: ${viewState(view)} vs ${recompute(lake)}")
      // live merge 3 + a GDPR erasure (deletes must maintain DOWN)
      merge(lake, bucketed(3, Seq((5L, "C", 50.0))))
      graft.lake.Eraser.eraseKeys(spark, lake, "id", Seq(3L).toDF("id"), buckets = 4)
      assert(await(60000L) {
        val v = viewState(view)
        v == recompute(lake) && !v.get("B").exists(_._1 > 1)
      }, s"view never followed the erasure: ${viewState(view)} vs ${recompute(lake)}")
    } finally q.stop()
    // the maintained sums are bit-exact vs recomputation (decimal equality
    // was asserted by the == above; pin the shape too)
    assert(viewState(view).keySet == Set("A", "B", "C"))
  }

  test("restart resumes from the engine checkpoint: commits made while the query was down apply once") {
    val lake = tmpDir("rsrc") + "/lake"
    val view = tmpDir("rview") + "/view"
    val ckpt = tmpDir("rckpt")
    merge(lake, bucketed(1, Seq((1L, "A", 10.0), (2L, "B", 20.0))))
    // pass 1: AvailableNow drains m1, then stops
    CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
      dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
      .awaitTermination()
    assert(viewState(view) == recompute(lake))
    val offsetAfter1 = graft.lake.ChangeFeed.lastSyncedVersion(spark, view)
    assert(offsetAfter1 == 1L)
    // two commits land while the query is DOWN
    merge(lake, bucketed(2, Seq((1L, "A", 11.0))))
    merge(lake, bucketed(3, Seq((3L, "B", 30.0))))
    // pass 2: same checkpoint — one coalesced span (1 → 3], applied once
    CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
      dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
      .awaitTermination()
    assert(viewState(view) == recompute(lake),
      s"restart must converge: ${viewState(view)} vs ${recompute(lake)}")
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, view) == 3L)
    // idempotence: a third pass with nothing new applies nothing
    val versions = ManifestLake.latestVersion(spark, view)
    CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
      dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
      .awaitTermination()
    assert(ManifestLake.latestVersion(spark, view) == versions,
      "an up-to-date view must not churn versions")
  }

  test("a maintenance span commits merge, tag, and offset ATOMICALLY - the double-apply crash window does not exist") {
    // Round-14 advice (high): advance used to commit the tagged view
    // merge and the offset SEPARATELY. A crash between them, with the
    // source advancing before restart, redelivered a WIDER span under a
    // DIFFERENT tag - the tag no-op could not fire and the already-
    // merged prefix's signed deltas applied twice (increments, unlike
    // syncTo's keep-last-idempotent absolute rows). Now one commit
    // carries all three, so either the whole span landed (offset moved
    // with it) or none of it did.
    val lake = tmpDir("asrc") + "/lake"
    val view = tmpDir("aview") + "/view"
    val ckpt = tmpDir("ackpt")
    merge(lake, bucketed(1, Seq((1L, "A", 10.0), (2L, "B", 20.0))))
    merge(lake, bucketed(2, Seq((1L, "A", 11.0), (3L, "B", 30.0)))) // source at v2
    def pass(): Unit =
      CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
        dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
        .awaitTermination()
    // crash DURING the span's commit: NOTHING half-applies - no view
    // rows, no offset, no tag (the old shape could strand the merge
    // committed with the offset behind)
    ManifestLake.beforeCommitHook = () => {
      ManifestLake.beforeCommitHook = () => ()
      throw new IllegalStateException("injected view-commit crash")
    }
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { pass() }
    assert(String.valueOf(e.getCause).contains("injected") ||
      e.getMessage.contains("injected"), e.getMessage)
    assert(viewState(view).isEmpty, "a failed span must not half-apply")
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, view) == 0L,
      "a failed span must not advance the offset")
    // the source advances while the query is down - the redelivered
    // span is WIDER (0 -> 3], the old bug's exact trigger
    merge(lake, bucketed(3, Seq((4L, "C", 40.0))))
    // count view-lake commits during catch-up: the whole span must be
    // ONE commit carrying merge + tag + offset together
    val commits = new java.util.concurrent.atomic.AtomicLong(0L)
    ManifestLake.beforeCommitHook = () => { commits.incrementAndGet(); () }
    try pass() finally ManifestLake.beforeCommitHook = () => ()
    assert(commits.get() == 1L,
      s"a span must be exactly ONE view merge commit, saw ${commits.get()}")
    assert(ManifestLake.latestVersion(spark, view) == 1L,
      "the view chain must hold exactly one committed version for the " +
        "whole span — no separate offset commit")
    assert(viewState(view) == recompute(lake),
      s"the wider redelivered span must apply exactly once: " +
        s"${viewState(view)} vs ${recompute(lake)}")
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, view) == 3L)
    // and that one commit's own headers carry BOTH the tag and offset
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hs = ManifestLake.resolveHeaders(fs, view,
      ManifestLake.latestVersion(spark, view))
    assert(hs.tags.exists(_ == "cdfview-0-3"), s"span tag missing: ${hs.tags}")
    assert(hs.from.get("from").contains(3L), s"offset header missing: ${hs.from}")
  }

  test("continuous replication: a live mirror follows merges and erasures; restart applies backlog once") {
    // CdfStream.replicate = the version feed driving ChangeFeed.syncTo
    // per micro-batch - q204's row-level mirror (erasures replicate) as
    // a standing streaming query. The consistency story is syncTo's
    // own durable offsets + span tags; the stream only supplies the
    // trigger cadence.
    val lake = tmpDir("rpsrc") + "/lake"
    val replica = tmpDir("rpdst") + "/replica"
    val ckpt = tmpDir("rpckpt")
    def rows(l: String): Set[(Long, String, Double)] =
      ManifestLake.read(spark, l).select($"id", $"status", $"price")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    merge(lake, bucketed(1, Seq((1L, "A", 10.0), (2L, "B", 20.0))))
    val q = CdfStream.replicate(spark, lake, replica, keyCol = "id",
      partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
      checkpoint = ckpt, trigger = Trigger.ProcessingTime("300 milliseconds"),
      eraseBuckets = 4)
    try {
      assert(await(60000L) { ManifestLake.latestVersion(spark, replica) > 0 &&
        rows(replica) == rows(lake) }, "mirror never reached v1")
      // a live correction + insert, then an erasure, while running
      merge(lake, bucketed(2, Seq((1L, "A", 15.0), (3L, "C", 30.0))))
      graft.lake.Eraser.eraseKeys(spark, lake, "id", Seq(2L).toDF("id"), buckets = 4)
      assert(await(60000L) { rows(replica) == rows(lake) },
        s"mirror never converged: ${rows(replica)} vs ${rows(lake)}")
      assert(!rows(replica).exists(_._1 == 2L), "the erasure must replicate")
    } finally q.stop()
    // restart path: commits land while the mirror is down; one
    // AvailableNow pass coalesces the backlog and the offset advances
    merge(lake, bucketed(3, Seq((4L, "D", 40.0))))
    CdfStream.replicate(spark, lake, replica, keyCol = "id",
      partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
      checkpoint = ckpt, eraseBuckets = 4).awaitTermination()
    assert(rows(replica) == rows(lake))
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, replica) ==
      ManifestLake.latestVersion(spark, lake))
  }

  test("a maintenance span crossing the source's vacuum horizon fails loud, never silently skips") {
    // The streaming consumer's retention contract: its offset must stay
    // within the source vacuum's retainVersions. If commits are vacuumed
    // past the view's offset while the query is down, the next span
    // CANNOT be reconstructed - the query must fail naming the knob,
    // and the view must stay untouched at its old offset (an operator
    // rebuilds or re-bases explicitly; silent skipping would corrupt
    // the maintained aggregate forever).
    val lake = tmpDir("vsrc") + "/lake"
    val view = tmpDir("vview") + "/view"
    val ckpt = tmpDir("vckpt")
    merge(lake, bucketed(1, Seq((1L, "A", 10.0))))
    CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
      dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
      .awaitTermination()
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, view) == 1L)
    // two commits land and are vacuumed past while the query is down
    merge(lake, bucketed(2, Seq((2L, "B", 20.0))))
    merge(lake, bucketed(3, Seq((3L, "C", 30.0))))
    graft.lake.ManifestLake.vacuum(spark, lake) // retain=1: horizon -> 3
    val stateBefore = viewState(view)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CdfStream.maintainAgg(spark, lake, view, keyCols = Seq("id"),
        dims = Seq("status"), valueCol = "price", checkpoint = ckpt)
        .awaitTermination()
    }
    assert(e.getMessage.contains("vacuumed") ||
      String.valueOf(e.getCause).contains("vacuumed"), e.getMessage)
    assert(viewState(view) == stateBefore, "the failed span must not half-apply")
    assert(graft.lake.ChangeFeed.lastSyncedVersion(spark, view) == 1L,
      "the offset must hold at the last applied span")
  }
}
