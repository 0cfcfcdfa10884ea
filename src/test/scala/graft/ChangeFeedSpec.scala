package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.{ChangeFeed, Eraser, ManifestLake}

/** Change data feed over the manifest lake ([[graft.lake.ChangeFeed]]):
  * endpoint-diff semantics (insert/delete/update pre+post, carried rows
  * silent), schema-evolution alignment, version hygiene, and the vacuum
  * retention contract.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpLake(): String =
    Files.createTempDirectory("graft_cdf").toString + "/lake"

  private def merge(lake: String, df: DataFrame): Unit = {
    ManifestLake.mergeKeyed(spark, df, lake, keys = Seq("part"),
      dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
    ()
  }

  private def rows(seq: Long, t: (Long, Double, String)*): DataFrame =
    t.map { case (id, v, part) => (id, v, part, seq) }.toDF("id", "v", "part", "seq")

  /** Erasure ([[Eraser]]) requires the hash-bucket layout, so the
    * delete-path tests merge with `bucket = pmod(hash(id), 16)` keys.
    */
  private def mergeBucketed(lake: String, df: DataFrame): Unit = {
    val b = df.withColumn("bucket", pmod(hash($"id"), lit(16)).cast("string"))
    ManifestLake.mergeKeyed(spark, b, lake, keys = Seq("bucket"),
      dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
    ()
  }

  test("classifies insert / delete / update; carried-through rows are silent") {
    val lake = tmpLake()
    mergeBucketed(lake, rows(1, (1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"))) // v1
    mergeBucketed(lake, rows(2, (2L, 25.0, "a"), (4L, 40.0, "b"))) // v2: update 2, insert 4
    Eraser.eraseKeys(spark, lake, "id", Seq(3L).toDF("id"))        // v3: delete 3
    val feed = ChangeFeed.readChanges(spark, lake, 1L, 3L, Seq("id"))
      .select($"id", $"v", $"_change_type").as[(Long, Double, String)]
      .collect().toSet
    assert(feed == Set(
      (4L, 40.0, "insert"),
      (3L, 30.0, "delete"),
      (2L, 20.0, "update_preimage"),
      (2L, 25.0, "update_postimage")),
      s"row 1 was carried through v1→v3 unchanged and must be silent: $feed")
  }

  test("endpoint diff, not event log: insert-then-delete inside the window emits nothing") {
    val lake = tmpLake()
    mergeBucketed(lake, rows(1, (1L, 1.0, "a")))          // v1
    mergeBucketed(lake, rows(2, (9L, 9.0, "a")))          // v2: insert 9
    Eraser.eraseKeys(spark, lake, "id", Seq(9L).toDF("id")) // v3: delete 9
    val feed = ChangeFeed.readChanges(spark, lake, 1L, 3L, Seq("id"))
    assert(feed.count() == 0, "9 never existed at either endpoint")
    // but each hop sees its half
    assert(ChangeFeed.readChanges(spark, lake, 1L, 2L, Seq("id"))
      .select($"_change_type").as[String].collect().toSeq == Seq("insert"))
    assert(ChangeFeed.readChanges(spark, lake, 2L, 3L, Seq("id"))
      .select($"_change_type").as[String].collect().toSeq == Seq("delete"))
  }

  test("fromVersion 0 diffs against the empty lake: everything is an insert") {
    val lake = tmpLake()
    merge(lake, rows(1, (1L, 1.0, "a"), (2L, 2.0, "b")))
    val feed = ChangeFeed.readChanges(spark, lake, 0L, 1L, Seq("id"))
    assert(feed.filter($"_change_type" === "insert").count() == 2)
    assert(feed.count() == 2)
  }

  test("schema evolution: a column born mid-window does not fabricate updates") {
    val lake = tmpLake()
    merge(lake, rows(1, (1L, 1.0, "a"), (2L, 2.0, "a")))                 // v1
    // v2 adds column `w` but only TOUCHES key 2 (same v, new w value);
    // key 1's row is rewritten into the new txn by the partition rewrite
    // with NO value change — it must stay silent even though the old
    // side lacks the column entirely
    merge(lake, rows(2, (2L, 2.0, "a")).withColumn("w", lit(7.0)))       // v2
    val feed = ChangeFeed.readChanges(spark, lake, 1L, 2L, Seq("id"))
    val types = feed.select($"id", $"_change_type").as[(Long, String)]
      .collect().toSet
    assert(types == Set((2L, "update_preimage"), (2L, "update_postimage")),
      s"key 1 (null w both sides after alignment — its seq/v unchanged) " +
        s"must be silent: $types")
    val post = feed.filter($"_change_type" === "update_postimage")
      .select($"w").as[Double].collect().toSeq
    assert(post == Seq(7.0))
  }

  test("only changed partitions are read: untouched partition directories stay cold") {
    val lake = tmpLake()
    merge(lake, rows(1, (1L, 1.0, "a"), (2L, 2.0, "b")))   // v1
    merge(lake, rows(2, (3L, 3.0, "a")))                    // v2 touches only a
    // drop partition b's committed files from disk: if the feed tried to
    // read them the scan would fail — metadata pruning must keep it cold
    val entries = ManifestLake.currentEntries(spark, lake)
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$lake/data/${entries("part=b")}/part=b"), true)
    val feed = ChangeFeed.readChanges(spark, lake, 1L, 2L, Seq("id"))
    assert(feed.select($"id", $"_change_type").as[(Long, String)]
      .collect().toSet == Set((3L, "insert")))
  }

  test("a pure layout evolution emits NO changes; post-evolution updates feed normally") {
    val lake = tmpLake()
    merge(lake, rows(1, (1L, 1.0, "a"), (2L, 2.0, "b")))
    // repartitionLake rewrites EVERY partition into a new txn — the
    // manifest diff sees all entries changed, but every row carries
    // through value-identical, so the row-level diff must stay silent
    // (re-layout is a physical move, not a logical change)
    ManifestLake.repartitionLake(spark, lake, Seq("part"))
    assert(ChangeFeed.readChanges(spark, lake, 1L, 2L, Seq("id")).count() == 0,
      "a re-layout is not a change")
    merge(lake, rows(2, (1L, 9.0, "a")))
    val post = ChangeFeed.readChanges(spark, lake, 2L, 3L, Seq("id"))
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    assert(post == Set((1L, "update_preimage"), (1L, "update_postimage")))
    // and the whole window (v1 → v3) sees exactly the logical update
    assert(ChangeFeed.readChanges(spark, lake, 1L, 3L, Seq("id")).count() == 2)
  }

  test("version hygiene: bad ranges and vacuumed manifests fail loud") {
    val lake = tmpLake()
    merge(lake, rows(1, (1L, 1.0, "a")))
    merge(lake, rows(2, (2L, 2.0, "a")))
    merge(lake, rows(3, (3L, 3.0, "a")))
    intercept[IllegalArgumentException] {
      ChangeFeed.readChanges(spark, lake, 2L, 9L, Seq("id"))
    }
    ManifestLake.vacuum(spark, lake, retainVersions = 1)
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.readChanges(spark, lake, 1L, 3L, Seq("id"))
    }
    assert(e.getMessage.contains("retainVersions"))
    // within the retained horizon the feed still works
    assert(ChangeFeed.readChanges(spark, lake, 3L, 3L, Seq("id")).count() == 0)
  }

  test("syncTo: durable offsets in the replica's manifest; crash-redelivery converges; erasures replicate") {
    val src = tmpLake(); val dst = tmpLake()
    // the Eraser contract: bucket = pmod(hash(id), B)
    def bucketed(seq: Long, ids: Seq[Long], v: Double): DataFrame =
      ids.map(i => (i, v, seq)).toDF("id", "v", "seq")
        .withColumn("bucket", pmod(hash($"id"), lit(4)).cast("string"))
    def mergeB(lake: String, df: DataFrame): Unit = {
      ManifestLake.mergeKeyed(spark, df, lake, keys = Seq("bucket"),
        dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
      ()
    }
    mergeB(src, bucketed(1, 1L to 20L, 1.0))                                // v1
    mergeB(src, bucketed(2, 1L to 5L, 2.0).unionByName(
      bucketed(2, 21L to 25L, 1.0)))                                        // v2
    Eraser.eraseKeys(spark, src, "id",
      (1L to 25L).filter(_ % 7 == 0).toDF("id"), buckets = 4)               // v3

    // CRASH CASE A — between a hop's apply and its offset commit: hop 1
    // was applied (same commit tag) but no `#from=` landed. The
    // redelivered hop must no-op via the tag, not duplicate.
    val hop1 = ChangeFeed.readChanges(spark, src, 0L, 1L, Seq("id"))
      .filter($"_change_type".isin("insert", "update_postimage"))
      .drop("_change_type")
    ManifestLake.mergeKeyed(spark, hop1, dst, keys = Seq("bucket"),
      dedupKeys = Seq($"id"), order = Seq($"seq", $"id"),
      commitTag = Some("cdf-sync-hop-1"))
    assert(ChangeFeed.lastSyncedVersion(spark, dst) == 0L,
      "no offset was recorded before the crash")

    // CRASH CASE B — mid-hop: hop 3's erase dies after its survivors
    // were computed. Offsets must hold at 2; a re-run replays hop 3.
    Eraser.beforeRewriteHook = () => {
      Eraser.beforeRewriteHook = () => ()
      throw new IllegalStateException("injected crash in hop-3 erase")
    }
    val eCrash = intercept[IllegalStateException] {
      ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
        partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
        eraseBuckets = 4, coalesce = false)
    }
    assert(eCrash.getMessage.contains("injected"), eCrash.getMessage)
    assert(ChangeFeed.lastSyncedVersion(spark, dst) == 2L,
      "hops 1-2 recorded; the crashed hop 3 must not be")

    // recovery: the re-run applies exactly hop 3 and converges
    assert(ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
      partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
      eraseBuckets = 4, coalesce = false) == 3L)
    assert(ChangeFeed.lastSyncedVersion(spark, dst) == 3L)
    def state(lake: String): Set[(Long, Double)] =
      ManifestLake.read(spark, lake).select($"id", $"v")
        .as[(Long, Double)].collect().toSet
    assert(state(dst) == state(src), "replica must equal source cell-for-cell")
    assert(!state(dst).exists { case (id, _) => id % 7 == 0 },
      "the erasure must have replicated")
    assert(state(dst).count { case (_, v) => v == 2.0 } == 5,
      "the corrections must have replicated")

    // a current replica: another call applies nothing and commits nothing
    val mCount = new java.io.File(s"$dst/_manifest").listFiles()
      .count(_.getName.matches("m\\d+\\.txt"))
    ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
      partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
      eraseBuckets = 4)
    assert(new java.io.File(s"$dst/_manifest").listFiles()
      .count(_.getName.matches("m\\d+\\.txt")) == mCount,
      "an up-to-date replica must not churn versions")
  }

  test("coalesced catch-up: a far-behind replica converges in <=3 replica commits, state == hop-by-hop") {
    // Round-13 verdict item 2: keep-last algebra makes the ENDPOINT diff's
    // final state identical to per-version hops, so a replica 10 versions
    // behind should pay one merge + one erase + one offset commit, not 10x.
    val src = tmpLake(); val a = tmpLake(); val b = tmpLake()
    def bucketed(seq: Long, ids: Seq[Long], v: Double): DataFrame =
      ids.map(i => (i, v, seq)).toDF("id", "v", "seq")
        .withColumn("bucket", pmod(hash($"id"), lit(4)).cast("string"))
    def mergeB(lake: String, df: DataFrame): Unit = {
      ManifestLake.mergeKeyed(spark, df, lake, keys = Seq("bucket"),
        dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
      ()
    }
    // 10 source versions: 9 merges (inserts + corrections) + 1 erasure
    (1 to 9).foreach { i =>
      mergeB(src, bucketed(i.toLong, (i.toLong * 10 + 1) to (i.toLong * 10 + 5), i * 1.0))
    }
    Eraser.eraseKeys(spark, src, "id",
      Seq(11L, 31L, 51L).toDF("id"), buckets = 4) // v10
    def sync(dst: String, coalesce: Boolean): Long =
      ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
        partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
        eraseBuckets = 4, coalesce = coalesce)
    assert(sync(a, coalesce = true) == 10L)
    assert(sync(b, coalesce = false) == 10L)
    def state(lake: String): Set[(Long, Double)] =
      ManifestLake.read(spark, lake).select($"id", $"v")
        .as[(Long, Double)].collect().toSet
    assert(state(a) == state(src), "coalesced replica must equal the source")
    assert(state(a) == state(b), "coalesced and hop-by-hop must converge identically")
    // the whole catch-up cost: one merge + one erase, the durable offset
    // riding the erase commit (round-15) = 2 replica commits
    assert(ManifestLake.latestVersion(spark, a) <= 2L,
      s"coalesced catch-up committed ${ManifestLake.latestVersion(spark, a)} " +
        "replica versions - the span was not coalesced")
    assert(ManifestLake.latestVersion(spark, b) >= 10L,
      "hop-by-hop mode must keep per-version history effects (>= one " +
        "replica commit per source version; offsets ride the data commits)")
  }

  test("syncTo under replica contention: commits retry and fold the competitor in, never abort") {
    // Round-13 verdict item 3: a competing writer on the REPLICA between a
    // sync merge's data write and its commit makes the sync lose the CAS;
    // the bounded retry must re-resolve and land, keeping both writers' rows.
    val src = tmpLake(); val dst = tmpLake()
    def bucketed(seq: Long, ids: Seq[Long], v: Double): DataFrame =
      ids.map(i => (i, v, seq)).toDF("id", "v", "seq")
        .withColumn("bucket", pmod(hash($"id"), lit(4)).cast("string"))
    ManifestLake.mergeKeyed(spark, bucketed(1, 1L to 10L, 1.0), src,
      keys = Seq("bucket"), dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
    // competitor fires inside the sync merge's torn window, exactly once
    ManifestLake.beforeCommitHook = () => {
      ManifestLake.beforeCommitHook = () => ()
      ManifestLake.mergeKeyed(spark, bucketed(99, 901L to 905L, 9.0), dst,
        keys = Seq("bucket"), dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
      ()
    }
    try {
      assert(ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
        partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
        eraseBuckets = 4) == 1L)
    } finally ManifestLake.beforeCommitHook = () => ()
    val ids = ManifestLake.read(spark, dst).select($"id").as[Long].collect().toSet
    assert((1L to 10L).forall(ids), s"sync rows lost under contention: $ids")
    assert((901L to 905L).forall(ids), s"competitor rows lost: $ids")
  }

  test("fan-in: per-source offsets let two sources converge into one replica independently") {
    // Round-13 verdict item 7: the offset ledger namespaces by sourceId,
    // so one replica can mirror several sources without offset collisions.
    val srcA = tmpLake(); val srcB = tmpLake(); val dst = tmpLake()
    def bucketed(seq: Long, ids: Seq[Long], v: Double): DataFrame =
      ids.map(i => (i, v, seq)).toDF("id", "v", "seq")
        .withColumn("bucket", pmod(hash($"id"), lit(4)).cast("string"))
    def mergeB(lake: String, df: DataFrame): Unit = {
      ManifestLake.mergeKeyed(spark, df, lake, keys = Seq("bucket"),
        dedupKeys = Seq($"id"), order = Seq($"seq", $"id"))
      ()
    }
    mergeB(srcA, bucketed(1, 1L to 10L, 1.0)); mergeB(srcA, bucketed(2, 1L to 3L, 2.0))
    mergeB(srcB, bucketed(1, 101L to 110L, 1.0))
    def sync(src: String, id: String): Long =
      ChangeFeed.syncTo(spark, src, dst, keyCol = "id",
        partitionKeys = Seq("bucket"), orderCols = Seq("seq", "id"),
        eraseBuckets = 4, sourceId = id)
    assert(sync(srcA, "A") == 2L)
    assert(sync(srcB, "B") == 1L)
    assert(ChangeFeed.lastSyncedVersion(spark, dst, "A") == 2L)
    assert(ChangeFeed.lastSyncedVersion(spark, dst, "B") == 1L)
    val state = ManifestLake.read(spark, dst).select($"id", $"v")
      .as[(Long, Double)].collect().toSet
    val expect = ((4L to 10L).map(_ -> 1.0) ++ (1L to 3L).map(_ -> 2.0) ++
      (101L to 110L).map(_ -> 1.0)).toSet
    assert(state == expect, s"fan-in state wrong: $state")
    // both offsets current: re-syncs apply nothing, commit nothing
    val mCount = new java.io.File(s"$dst/_manifest").listFiles()
      .count(_.getName.matches("m\\d+\\.txt"))
    sync(srcA, "A"); sync(srcB, "B")
    assert(new java.io.File(s"$dst/_manifest").listFiles()
      .count(_.getName.matches("m\\d+\\.txt")) == mCount)
  }

  test("offset resolution fails loud on a truncated header ledger, never silently resets to 0") {
    // Round-13 advice (low): 'never synced' and 'offset lost to retention'
    // must be distinguishable. Modern lakes accumulate offsets into every
    // checkpoint (vacuum retains the chain), so truncation only happens on
    // a legacy/damaged chain - hand-craft one: a legacy full manifest at
    // v2 with NO accumulated ledger and a missing v1.
    val lake = tmpLake()
    val md = new java.io.File(s"$lake/_manifest"); md.mkdirs()
    java.nio.file.Files.write(new java.io.File(md, "m2.txt").toPath,
      "part=a\ttxn-1\n".getBytes("UTF-8"))
    assert(ManifestLake.latestVersion(spark, lake) == 2L)
    val e = intercept[IllegalStateException] {
      ChangeFeed.lastSyncedVersion(spark, lake)
    }
    assert(e.getMessage.contains("refusing"), e.getMessage)
  }
}
