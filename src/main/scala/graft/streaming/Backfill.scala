package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.MergeWriter
import graft.normalize.Intervals

/** Historical backfill job — the reference's `backfill_historical`
  * lifecycle (E1, crypto_collector.py:626–657) re-expressed for Spark.
  *
  * The reference loops (symbol × interval × chunk) sequentially with
  * sleeps; here the chunk plan is computed up front ([[plan]], T7 math
  * from [[Intervals]]) and all fetches execute as one union of
  * per-window DataFrames — Spark task parallelism replaces the thread
  * pool (§2.9 T9), and the merge sink preserves idempotence so a crashed
  * backfill simply re-runs (the reference's restart story, §1.1).
  *
  * `fetch` abstracts the exchange boundary: production wires an HTTP
  * client per (exchange, window); tests and this zero-egress environment
  * wire fixture payloads through [[graft.normalize.Exchanges]]. Each
  * window's result must be canonical candles.
  */
object Backfill {

  /** One fetchable unit of work: at most 300 candles (the universal API
    * cap the reference clamps to).
    */
  final case class Chunk(symbol: String, interval: String, startMs: Long, endMs: Long)

  /** Chunk plan for a backfill horizon — symbols × intervals × windows. */
  def plan(symbols: Seq[String], intervals: Seq[String],
           startMs: Long, endMs: Long): Seq[Chunk] =
    for {
      sym <- symbols
      iv <- intervals
      (s, e) <- Intervals.chunkWindows(startMs, endMs, iv)
    } yield Chunk(sym, iv, s, e)

  /** Execute a backfill: fetch every chunk, union, tag, merge into the
    * lake partitioned by (symbol, interval, data_type, exchange, date).
    * Chunks of the same interval merge in one pass (one shuffle per
    * interval, not per chunk — the reference pays one merge per chunk).
    */
  def run(spark: SparkSession, chunks: Seq[Chunk],
          fetch: Chunk => DataFrame, lakePath: String,
          ingestSeq: Long, dataType: String = "spot"): Unit = {
    chunks.groupBy(_.interval).foreach { case (interval, ivChunks) =>
      val unioned = ivChunks.map(fetch).reduce(_ unionByName _)
      val tagged = MergeWriter.withPartitionCols(unioned, interval, dataType)
      MergeWriter.merge(spark, tagged, lakePath, ingestSeq)
    }
  }
}
