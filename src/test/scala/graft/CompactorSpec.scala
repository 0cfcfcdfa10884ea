package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.lake.{Compactor, MergeWriter}
import graft.model.Candle

/** Lake compaction (K1 maintenance): fragmented partitions collapse to
  * one file each, data survives byte-identical, untouched partitions'
  * files are left alone, and a compacted lake is a no-op.
  */
class CompactorSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L // 2021-01-01
  private val Day = 86400000L

  private def candles(rows: (Long, Double, String)*): DataFrame =
    rows.map { case (tsMs, close, exch) =>
      Candle(new Timestamp(tsMs), 1.0, 2.0, 0.5, close, 10.0, "BTC-USDT", exch)
    }.toDF()

  private def tmpLake(): String =
    Files.createTempDirectory("graft_compact").toString + "/lake"

  private def fileCounts(lake: String): Map[String, Int] =
    Compactor.fragmentation(spark, lake)
      .map { case (part, n, _) => part("date") + "/" + part("exchange") -> n }
      .toMap

  test("fragmented partition compacts to one file; rows byte-identical") {
    val lake = tmpLake()
    // 4-way repartition fans one day's candles across 4 files
    val batch = MergeWriter.withPartitionCols(
      candles((0 until 8).map(i => (T0 + i * 900000L, 100.0 + i, "coinbase")): _*),
      "15m", "spot").repartition(4)
    batch.withColumn("ingest_seq", org.apache.spark.sql.functions.lit(1L))
      .write.partitionBy("symbol", "interval", "data_type", "exchange", "date")
      .parquet(lake)
    assert(fileCounts(lake).values.head == 4)

    val before = spark.read.parquet(lake).orderBy("timestamp").collect().toSeq
    val summary = Compactor.compact(spark, lake).collect()
    assert(summary.length == 1 && summary.head.getAs[Int]("files_before") == 4)
    assert(fileCounts(lake).values.head == 1)
    val after = spark.read.parquet(lake).orderBy("timestamp").collect().toSeq
    assert(after == before, "compaction must not change the data")
  }

  test("only fragmented partitions rewrite; single-file partitions keep their file") {
    val lake = tmpLake()
    // day 1: single file; day 2: 3 files
    MergeWriter.merge(spark, MergeWriter.withPartitionCols(
      candles((T0, 100.0, "coinbase")), "15m", "spot").coalesce(1), lake, 1)
    MergeWriter.withPartitionCols(
      candles((0 until 6).map(i => (T0 + Day + i * 900000L, 200.0 + i, "coinbase")): _*),
      "15m", "spot")
      .withColumn("ingest_seq", org.apache.spark.sql.functions.lit(2L))
      .repartition(3)
      .write.mode("append")
      .partitionBy("symbol", "interval", "data_type", "exchange", "date")
      .parquet(lake)

    val hPath = new org.apache.hadoop.fs.Path(lake)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def day1Files(): Set[String] = {
      val it = fs.listFiles(hPath, true)
      val b = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.toString.contains("date=20210101") &&
          f.getPath.getName.endsWith(".parquet")) b += f.getPath.toString
      }
      b.toSet
    }
    val day1Before = day1Files()

    val summary = Compactor.compact(spark, lake).collect()
    assert(summary.map(_.getAs[String]("date")).toSeq == Seq("20210102"),
      s"only the fragmented day must compact: ${summary.mkString(",")}")
    assert(day1Files() == day1Before,
      "dynamic overwrite must not touch the single-file partition")
    assert(fileCounts(lake) == Map("20210101/coinbase" -> 1, "20210102/coinbase" -> 1))
  }

  test("zOrderRewrite: real files get tight min/max in BOTH dims; a user predicate prunes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    // 64×64 dimension grid, written the way a time-ordered ingest lands:
    // sorted by h → every file spans the FULL user range
    val grid = (0 until 64).flatMap(u => (0 until 64).map(h => (u.toLong, h.toLong)))
    grid.toDF("u", "h").repartitionByRange(16, $"h").sortWithinPartitions($"h")
      .write.parquet(dir)
    def fileSpans() = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"u").as("umin"), max($"u").as("umax"), count(lit(1)).as("n"))
      .collect()
    val before = fileSpans()
    assert(before.forall(r => r.getAs[Long]("umin") == 0L &&
      r.getAs[Long]("umax") == 63L),
      "time-sorted files must span all users — nothing user-prunes")
    graft.lake.Compactor.zOrderRewrite(spark, dir, "u", "h", 16)
    val after = fileSpans()
    // same data, same file count target
    assert(after.map(_.getAs[Long]("n")).sum == 4096L)
    val data = spark.read.parquet(dir).as[(Long, Long)].collect().sorted
    assert(data.toSeq == grid.sorted.toSeq, "rewrite must not change data")
    // footer stats now prune: only files whose u-span reaches [0, 7]
    // survive a u <= 7 predicate — a contiguous z range covers a bounded
    // u-box, so most files' umin exceeds the predicate
    val hit = after.count(_.getAs[Long]("umin") <= 7L)
    assert(hit < after.length / 2,
      s"expected most of ${after.length} z-files to user-prune, $hit hit")
  }

  test("zOrderRewriteN: 3-dim rewrite bounds every file's span in ALL dims; each dim prunes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString + "/t"
    // 16×16×16 grid written time-sorted: every file spans all u and all v
    val grid = (0 until 16).flatMap(u => (0 until 16).flatMap(h =>
      (0 until 16).map(v => (u.toLong, h.toLong, v.toLong))))
    grid.toDF("u", "h", "v").repartitionByRange(16, $"h").sortWithinPartitions($"h")
      .write.parquet(dir)
    def fileSpans() = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"u").as("umin"), min($"v").as("vmin"), count(lit(1)).as("n"))
      .collect()
    val before = fileSpans()
    assert(before.forall(r => r.getAs[Long]("umin") == 0L &&
      r.getAs[Long]("vmin") == 0L),
      "time-sorted files span all u and v — nothing prunes on either")
    // 64 files over the 16^3 grid: each aligned 64-code Morton block
    // spans a 4×4×4 box, so the file index carries ~2 bits of EVERY
    // dimension — coarser per-dim than a 2-dim curve with the same file
    // count (the k-dim trade-off the audit query quantifies), but
    // enough that a tight predicate on any single dim prunes ~3/4
    graft.lake.Compactor.zOrderRewriteN(spark, dir, Seq("u", "h", "v"), 64)
    val after = fileSpans()
    assert(after.map(_.getAs[Long]("n")).sum == 4096L)
    val data = spark.read.parquet(dir).as[(Long, Long, Long)].collect().sorted
    assert(data.toSeq == grid.sorted.toSeq, "rewrite must not change data")
    // a contiguous 3-dim Morton range bounds a box in EVERY dimension:
    // predicates on u AND on v must now both prune most files
    assert(after.count(_.getAs[Long]("umin") <= 1L) < after.length / 2,
      "u-predicate must prune most 3-dim z-files")
    assert(after.count(_.getAs[Long]("vmin") <= 1L) < after.length / 2,
      "v-predicate must prune most 3-dim z-files")
  }

  test("compacting a compacted (or absent) lake is a no-op") {
    val lake = tmpLake()
    assert(Compactor.compact(spark, lake).isEmpty)
    MergeWriter.merge(spark, MergeWriter.withPartitionCols(
      candles((T0, 100.0, "coinbase")), "15m", "spot").coalesce(1), lake, 1)
    Compactor.compact(spark, lake)
    assert(Compactor.compact(spark, lake).isEmpty)
  }

  test("maxRecordsPerFile splits an oversized partition into bounded files") {
    val lake = tmpLake()
    MergeWriter.withPartitionCols(
      candles((0 until 40).map(i => (T0 + i * 900000L, 100.0 + i, "coinbase")): _*),
      "15m", "spot")
      .withColumn("ingest_seq", org.apache.spark.sql.functions.lit(1L))
      .repartition(4)
      .write.partitionBy("symbol", "interval", "data_type", "exchange", "date")
      .parquet(lake)
    Compactor.compact(spark, lake, maxFiles = 1, maxRecordsPerFile = 15L)
    // 40 rows / 15-per-file cap → 3 files, still fewer than the 4 input
    val counts = fileCounts(lake)
    assert(counts.values.head == 3, s"expected 3 capped files: $counts")
    assert(spark.read.parquet(lake).count() == 40)
  }

  test("compaction on a held lake fails loud instead of racing the holder (round-11 item 1)") {
    // Compaction is THE maintenance job that runs next to live ingest:
    // an unlocked rewrite racing a merge reads pre-merge state and
    // overwrites the merge's rows away. It now takes the same writer
    // lock as the merge — second-comer fails loud, nothing interleaves.
    val lake = tmpLake()
    MergeWriter.withPartitionCols(
      candles((0 until 8).map(i => (T0 + i * 900000L, 100.0 + i, "coinbase")): _*),
      "15m", "spot")
      .withColumn("ingest_seq", org.apache.spark.sql.functions.lit(1L))
      .repartition(4)
      .write.partitionBy("symbol", "interval", "data_type", "exchange", "date")
      .parquet(lake)
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(lake + ".__writer_lock")
    fs.create(lock, false).close()
    try {
      val e = intercept[IllegalStateException] { Compactor.compact(spark, lake) }
      assert(e.getMessage.contains("locked"), e.getMessage)
      // the refused compaction rewrote nothing
      assert(fileCounts(lake).values.head == 4)
    } finally fs.delete(lock, false)
    // lock released → compaction proceeds
    Compactor.compact(spark, lake)
    assert(fileCounts(lake).values.head == 1)
  }

  test("compact and zOrderRewrite refuse a manifest lake loudly (round-11 item 2)") {
    import graft.lake.ManifestLake
    val lake = tmpLake()
    spark.conf.set("spark.graft.lake.commit", "manifest")
    try {
      MergeWriter.merge(spark, MergeWriter.withPartitionCols(
        candles((T0, 100.0, "coinbase")), "15m", "spot"), lake, 1)
      assert(ManifestLake.isManifestLake(spark, lake))
      val e1 = intercept[IllegalArgumentException] { Compactor.compact(spark, lake) }
      assert(e1.getMessage.contains("manifest"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Compactor.zOrderRewrite(spark, lake, "close", "volume", 4)
      }
      assert(e2.getMessage.contains("manifest"), e2.getMessage)
      // nothing was disturbed by the refusals
      assert(MergeWriter.readLake(spark, lake).count() == 1)
    } finally spark.conf.unset("spark.graft.lake.commit")
  }

  test("compactManifest: fragmented committed partitions collapse via one manifest commit; snapshots survive") {
    import graft.lake.ManifestLake
    val lake = tmpLake()
    spark.conf.set("spark.graft.lake.commit", "manifest")
    try {
      // fragment the day's txn partition the way a LARGE merge does:
      // the per-task writer rolls a new file every maxRecordsPerFile
      // records (the merge itself clusters one task per partition key)
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "3")
      try MergeWriter.merge(spark, MergeWriter.withPartitionCols(
        candles((0 until 8).map(i => (T0 + i * 900000L, 100.0 + i, "coinbase")): _*),
        "15m", "spot"), lake, 1)
      finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      val before = MergeWriter.readLake(spark, lake)
        .orderBy("timestamp").collect().toSeq
      val summary = Compactor.compactManifest(spark, lake).collect()
      assert(summary.length == 1 && summary.head.getAs[Int]("files_before") >= 2,
        s"expected one fragmented partition: ${summary.toSeq}")
      // data byte-identical through the rewrite
      val after = MergeWriter.readLake(spark, lake)
        .orderBy("timestamp").collect().toSeq
      assert(after == before, "compaction must not change the data")
      // the rewritten partition is ONE file, referenced by a NEW version
      val entries = ManifestLake.currentEntries(spark, lake)
      val fs = new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      entries.foreach { case (rel, txn) =>
        val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$lake/data/$txn/$rel"))
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        assert(n == 1, s"$rel still fragmented ($n files) after compaction")
      }
      // compaction is a COMMIT: the pre-compaction snapshot still serves
      assert(ManifestLake.readAt(spark, lake, 1L).count() == 8)
      // idempotence: a compacted lake is a no-op
      assert(Compactor.compactManifest(spark, lake).isEmpty)
    } finally spark.conf.unset("spark.graft.lake.commit")
  }

  test("clusterManifest with a Morton sort key: FileStats prunes a 2-dim box on the real write path") {
    import graft.lake.{FileStats, ManifestLake}
    import graft.lake.FileStats.ColRange
    val lake = tmpLake()
    // 32×32 grid in one partition, deliberately written in row-major
    // order (x-sorted): a y predicate alone prunes nothing
    val rows = (0 until 1024).map(i => (i.toLong, (i / 32).toLong, (i % 32).toLong, "p"))
      .toDF("id", "x", "y", "part")
    ManifestLake.mergeKeyed(spark, rows, lake, keys = Seq("part"),
      dedupKeys = Seq($"id"), order = Seq($"id"))
    Compactor.clusterManifest(spark, lake,
      Seq("z_interleave_n(cast(x as bigint), cast(y as bigint))"), 64L)
    FileStats.collectStats(spark, lake, Seq("x", "y"))
    // 16 z-ordered files of 64 rows = the 16 8×8 quadrants (order-2
    // Morton blocks), so an 8×8 box on EITHER dimension pair prunes
    val box = FileStats.readSkipping(spark, lake,
      Seq(ColRange("x", "0", "7"), ColRange("y", "8", "15")))
    assert(box.filesTotal == 16, s"expected 16 files, got ${box.filesTotal}")
    assert(box.filesScanned == 1,
      s"an aligned 8×8 box is exactly one Morton block: ${box.filesScanned}")
    val got = box.df.filter($"x" <= 7 && $"y" >= 8 && $"y" <= 15)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == (0 until 8).flatMap(x => (8 to 15).map(y => x * 32L + y)),
      "the pruned scan must still produce every box row")
    // each single dimension prunes too (the z-curve bounds both)
    val xOnly = FileStats.readSkipping(spark, lake, Seq(ColRange("x", "0", "7")))
    val yOnly = FileStats.readSkipping(spark, lake, Seq(ColRange("y", "0", "7")))
    assert(xOnly.filesScanned == 4 && yOnly.filesScanned == 4,
      s"one dim = one quadrant row/column: ${xOnly.filesScanned}, ${yOnly.filesScanned}")
  }

  test("compactManifest fragmentation counts ride the stats sidecars: zero LISTs on a statted lake; @root always relocates") {
    import graft.lake.{FileStats, ManifestLake}
    import org.apache.spark.sql.functions._
    val lake = tmpLake()
    // two partitions, price-clustered into 4 files each — fragmented by
    // the maxFiles=1 rule — then ANALYZEd so the sidecars exist
    val rows = (0 until 400).map(i =>
      (i.toLong, i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "v", "part")
    ManifestLake.mergeKeyed(spark, rows, lake, keys = Seq("part"),
      dedupKeys = Seq($"id"), order = Seq($"id"))
    Compactor.clusterManifest(spark, lake, Seq("v"), 50L)
    FileStats.collectStats(spark, lake, Seq("v"))
    FileStats.listFallbacks.set(0L)
    val summary = Compactor.compactManifest(spark, lake).collect()
    assert(summary.length == 2, s"both fragmented partitions rewrite: ${summary.toSeq}")
    assert(FileStats.listFallbacks.get() == 0L,
      "a statted lake's fragmentation listing must not LIST any entry")
    assert(ManifestLake.read(spark, lake).count() == 400)
    // in-place imported (@root) entries always relocate, statted or not
    val legacy = tmpLake()
    (0 until 40).map(i => (i.toLong, (i % 4).toString))
      .toDF("id", "bucket").withColumn("ingest_seq", lit(1L))
      .write.partitionBy("bucket").parquet(legacy)
    ManifestLake.importLockLake(spark, legacy)
    assert(ManifestLake.currentEntries(spark, legacy).values.toSet == Set("@root"))
    Compactor.compactManifest(spark, legacy, maxFiles = 100)
    val txns = ManifestLake.currentEntries(spark, legacy).values.toSet
    assert(!txns.contains("@root"),
      s"compaction must relocate @root entries under data/: $txns")
    assert(ManifestLake.read(spark, legacy).count() == 40)
    // the legacy root directories reclaim once unreferenced
    ManifestLake.vacuum(spark, legacy, txnGraceMillis = 0L)
    assert(!new java.io.File(legacy).listFiles()
      .exists(f => f.isDirectory && f.getName.contains("=")),
      "vacuum must reclaim the superseded in-place root partitions")
    assert(ManifestLake.read(spark, legacy).count() == 40)
  }
}
