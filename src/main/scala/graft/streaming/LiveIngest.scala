package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.lake.MergeWriter

/** Live collection as Structured Streaming (SURVEY.md §2.9, E2): candle
  * stream → watermark → dedup-within-watermark → `foreachBatch` merge
  * into the partitioned lake.
  *
  * The reference's hand-rolled loop (crypto_collector.py:659–717) maps as:
  *  - 15-minute cycle           → `Trigger.ProcessingTime("15 minutes")`
  *  - overlap/duplicate refetch → watermark + sink-side keep-last merge
  *    (T5): the merge is idempotent, so at-least-once delivery upgrades
  *    to effectively-exactly-once in the lake
  *  - `last_collected_ts` state → checkpointed source offsets (T4)
  *  - wall-clock :00/:15 alignment (T1) — a genuine Spark gap:
  *    ProcessingTime fires on its own clock. [[alignedDelayMs]] exposes
  *    the boundary math for a driver-side scheduler that launches
  *    `Trigger.AvailableNow` catch-up runs at computed boundaries, the
  *    faithful equivalent (SURVEY.md §7 phase 4).
  *
  * The source here is any streaming DataFrame of canonical candles —
  * tests drive it with MemoryStream; production would plug a DataSource
  * V2 streaming connector whose offsets are per-(symbol, interval)
  * watermarks (T7 windows as input partitions).
  */
object LiveIngest {

  /** Milliseconds to sleep until the next aligned boundary — the
    * reference's `ceil(now/period)*period − now` (crypto_collector.py:
    * 664–667, 712–717).
    */
  def alignedDelayMs(nowMs: Long, periodMs: Long = 15 * 60 * 1000L): Long =
    graft.normalize.Intervals.nextBoundaryMs(nowMs, periodMs) - nowMs

  /** Wire a canonical-candle stream into the merge sink. Each micro-batch
    * is one idempotent [[MergeWriter.merge]] call keyed by `batchId` (the
    * monotone ingest sequence), exactly the reference's per-cycle
    * `save_to_parquet` (E3).
    *
    * Deliberately NO `dropDuplicatesWithinWatermark`: its state store
    * keeps the FIRST occurrence of a key, which would silently discard a
    * re-fetched correction candle. The reference's semantic is last-writer
    * -wins (crypto_collector.py:550–553), and the sink merge already
    * provides it idempotently — stream-side dedup state would fight it.
    */
  def start(spark: SparkSession, candles: DataFrame, lakePath: String,
            checkpoint: String, interval: String,
            trigger: Trigger = Trigger.ProcessingTime("15 minutes"),
            watermarkDelay: String = "30 minutes"): StreamingQuery = {
    candles
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val withCols = MergeWriter.withPartitionCols(batch, interval, "spot")
          MergeWriter.merge(spark, withCols, lakePath, batchId)
          ()
        }
      }
      .start()
  }
}
