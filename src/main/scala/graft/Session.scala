package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for Verify / Bench / tests.
  *
  * - `shuffle.partitions` = core count: right-sized for local mode; on a
  *   real cluster AQE coalesces post-shuffle partitions anyway.
  * - `nanosAsLong`: the driver's `events.parquet` carries TIMESTAMP(NANOS),
  *   unreadable by Spark 4 without this legacy flag ([[sources.Tables.events]]
  *   converts back to µs timestamps).
  * - Session timezone pinned UTC to match both the reference's tz-aware
  *   UTC handling (crypto_collector.py:84–91) and the DuckDB oracle.
  */
object Session {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet is naive (isAdjustedToUTC=false); read it as
      // TIMESTAMP (LTZ, session UTC) not TIMESTAMP_NTZ so epoch functions
      // (unix_micros etc.) apply and semantics match the DuckDB oracle.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checksummed checkpoint manager opens a thread pool
      // per state-store commit file and blocks the TASK thread up to
      // 500 ms force-closing it ("Thread pool did not shutdown after
      // 500 ms" warnings); a stream-stream join (4 store instances ×
      // 32 partitions × per-batch commits) paid ~15 s/task in pure
      // close-stalls (q169: 32 s → measured again below 5 s with the
      // plain manager). Checkpoint-file corruption detection is
      // defense-in-depth we forgo knowingly; every streaming query here
      // re-verifies end state against a batch oracle anyway.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // Output-commit algorithm stays the v1 default session-wide: an
      // A/B over the replay tier showed v2 HELPS new-immutable-dir
      // writes (fewer job-commit renames) but HURTS dynamic-partition-
      // overwrite writes (q168 6.7 → 7.4 s, q160 2.8 → 3.3 s — the
      // staging-move interplay), so the manifest txn writes opt into v2
      // per-write (ManifestLake) and the lock path keeps v1. _SUCCESS
      // markers stay ON: materializeOnce's torn-build publish gate.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.driver.maxResultSize", "4g")
      // bucketed-table queries (q122) write through the session catalog;
      // keep the warehouse out of the repo working tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
    // Dev-loop A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" applies
    // extra session confs (measurement experiments only — nothing in the
    // driver contract sets it, so default behavior is unchanged).
    val withExtra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(spark) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val built = withExtra.getOrCreate()
    built.sparkContext.setLogLevel("WARN")
    built
  }
}
