package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Candle
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Gap, Tick}

/** Custom streaming state: the per-symbol gap monitor
  * (flatMapGroupsWithState) detects missing candles ACROSS micro-batches
  * — state survives batch boundaries and the checkpoint — and the
  * watermarked live roll-up emits each window exactly once.
  */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L
  private val M15 = 900000L

  test("gap monitor: state crosses micro-batches; per-symbol isolation") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Tick]
    val out = Files.createTempDirectory("graft_gaps").toString
    def run(): Unit = {
      val q = StatefulOps.gapMonitor(mem.toDS(), M15).toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: BTC contiguous, ETH only t0 — no gaps anywhere yet
    mem.addData(Tick("BTC", T0), Tick("BTC", T0 + M15), Tick("ETH", T0))
    run()
    assert(spark.read.parquet(s"$out/rows").count() == 0)

    // batch 2 (fresh run, state from checkpoint): BTC jumps 3 intervals
    // → 2 missing boundaries; ETH stays contiguous → none
    mem.addData(Tick("BTC", T0 + 4 * M15), Tick("ETH", T0 + M15))
    run()
    val gaps = spark.read.parquet(s"$out/rows").as[Gap].collect()
      .map(g => (g.symbol, g.expectedTs)).sorted
    assert(gaps.toSeq == Seq(("BTC", T0 + 2 * M15), ("BTC", T0 + 3 * M15)),
      s"state must remember batch-1's last timestamp: ${gaps.toSeq}")
  }

  test("gap monitor handles out-of-order arrivals within a batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Tick]
    val out = Files.createTempDirectory("graft_gaps2").toString
    mem.addData(Tick("BTC", T0 + 2 * M15), Tick("BTC", T0)) // reversed order
    val q = StatefulOps.gapMonitor(mem.toDS(), M15).toDF()
      .writeStream.format("parquet")
      .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val gaps = spark.read.parquet(s"$out/rows").as[Gap].collect().map(_.expectedTs)
    assert(gaps.toSeq == Seq(T0 + M15))
  }

  test("live resample: watermark-closed windows emit once with batch-identical OHLC") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Candle]
    val out = Files.createTempDirectory("graft_liveres").toString
    def candle(tsMs: Long, o: Double, h: Double, l: Double, cl: Double): Candle =
      Candle(new Timestamp(tsMs), o, h, l, cl, 10, "BTC-USDT", "coinbase")
    // one full hour of 15m candles, then one candle far enough past the
    // watermark horizon to close the first window
    mem.addData(
      candle(T0, 100, 110, 90, 105), candle(T0 + M15, 105, 120, 100, 115),
      candle(T0 + 2 * M15, 115, 118, 95, 96), candle(T0 + 3 * M15, 96, 99, 94, 98),
      candle(T0 + 8 * M15, 98, 100, 97, 99))
    val q = StatefulOps.liveResample(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(s"$out/rows")
      .select($"timestamp", $"open", $"high", $"low", $"close", $"n_src")
      .as[(Timestamp, Double, Double, Double, Double, Long)].collect().sortBy(_._1.getTime)
    assert(rows.length == 1, s"only the watermark-closed window may emit: ${rows.toSeq}")
    assert(rows(0) == ((new Timestamp(T0), 100.0, 120.0, 90.0, 98.0, 4L)),
      "streamed OHLC must equal the batch resample of the same candles")
  }
}
