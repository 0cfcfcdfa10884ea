package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.streaming.{Backfill, LiveIngest}

/** The reference's full `run()` lifecycle (crypto_collector.py:754–769)
  * through ONE lake and checkpoint: backfill the history, then tail live
  * from exactly where the backfill stopped, then resume the tail after
  * the clock advances — and the resulting lake must equal an
  * all-at-once batch backfill over the same closed horizon, row for row
  * (`ingest_seq` excepted: it is the provenance column that records
  * WHICH writer won, and the two paths legitimately write different
  * sequences; idempotence of values is exactly what the merge contract
  * promises regardless of write order).
  *
  * Both paths draw candles from the same deterministic synthetic fetch
  * (the batch connector and the streaming source share
  * [[graft.sources.CandlePartitionReader]]), so equality is exact.
  */
class LifecycleSpec extends SparkSpec {

  private val T0 = 1609459200000L // 2021-01-01 00:00 UTC
  private val Step = 900000L      // 15m

  private def batchWindow(startMs: Long, endMs: Long): DataFrame =
    spark.read.format("graft.sources.CandleSource")
      .option("symbol", "BTC-USDT").option("interval", "15m")
      .option("exchange", "coinbase")
      .option("startMs", startMs.toString).option("endMs", endMs.toString)
      .load()

  private def tail(startMs: Long, nowMs: Long): DataFrame =
    spark.readStream.format("graft.sources.CandleStreamSource")
      .option("symbol", "BTC-USDT").option("interval", "15m")
      .option("exchange", "coinbase")
      .option("startMs", startMs.toString)
      .option("nowMs", nowMs.toString)
      .load()

  private def lakeRows(path: String): Seq[String] =
    spark.read.parquet(path).drop("ingest_seq")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("backfill → tail from recorded offsets → resumed tail == one all-at-once batch") {
    val dir = Files.createTempDirectory("graft_lifecycle").toString

    // 1. historical backfill over [T0, T0+8 candles) — the reference's
    //    backfill_historical phase
    val tBackfillEnd = T0 + 8 * Step
    val chunks = Backfill.plan(Seq("BTC-USDT"), Seq("15m"), T0, tBackfillEnd)
    Backfill.run(spark, chunks, c => batchWindow(c.startMs, c.endMs),
      s"$dir/lake", ingestSeq = 0L)

    // 2. live tail starting from the recorded horizon end (the durable
    //    last_collected_ts): 3 more candles close, one stays open
    val tNow1 = tBackfillEnd + 3 * Step + 300000L
    LiveIngest.runAvailableNow(spark, tail(tBackfillEnd, tNow1),
      s"$dir/lake", s"$dir/ckpt", interval = "15m")

    // 3. clock advances 2 candles; the SAME checkpoint resumes the tail
    //    from its committed offsets (startMs is ignored on resume)
    val tNow2 = tNow1 + 2 * Step
    LiveIngest.runAvailableNow(spark, tail(tBackfillEnd, tNow2),
      s"$dir/lake", s"$dir/ckpt", interval = "15m")

    // all-at-once batch reference over the same closed horizon
    val tClosed = (tNow2 / Step) * Step
    val allChunks = Backfill.plan(Seq("BTC-USDT"), Seq("15m"), T0, tClosed)
    Backfill.run(spark, allChunks, c => batchWindow(c.startMs, c.endMs),
      s"$dir/batch_lake", ingestSeq = 0L)

    val lived = lakeRows(s"$dir/lake")
    val batch = lakeRows(s"$dir/batch_lake")
    assert(lived.size == 13, s"8 backfilled + 5 tailed candles, got ${lived.size}")
    assert(lived == batch,
      s"lifecycle lake must equal the all-at-once batch lake\n" +
        s"lifecycle-only: ${lived.diff(batch).take(3)}\n" +
        s"batch-only: ${batch.diff(lived).take(3)}")
  }

  test("tail killed mid-batch resumes from the checkpoint; lake == uninterrupted run byte-for-byte") {
    // The reference survives restarts because every cycle's upsert is
    // idempotent (crypto_collector.py:543–554) — rerunning a window
    // cannot change the lake. The Spark equivalent failure mode is a
    // crash in the at-least-once window: the micro-batch's MERGE has
    // hit the lake but the checkpoint offset commit never happened, so
    // the restarted query REPLAYS that batch. foreachBatch hands the
    // replay the same batchId, the merge keys ingest_seq off batchId,
    // and keep-last makes the replay a no-op — so the recovered lake
    // must equal an uninterrupted run INCLUDING ingest_seq (true
    // byte-for-byte, not the values-only equality of the test above).
    val dir = Files.createTempDirectory("graft_crash").toString
    val tNow = T0 + 3 * Step + 300000L

    // uninterrupted reference run
    LiveIngest.runAvailableNow(spark, tail(T0, tNow),
      s"$dir/clean_lake", s"$dir/clean_ckpt", interval = "15m")

    // crashing run: merge completes, THEN the epoch dies before commit
    val crashed = tail(T0, tNow)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val withCols = graft.lake.MergeWriter.withPartitionCols(batch, "15m", "spot")
          graft.lake.MergeWriter.merge(spark, withCols, s"$dir/lake", batchId)
          ()
        }
        throw new RuntimeException("injected crash after merge, before commit")
      }
      .start()
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    assert(died.getMessage.contains("injected crash"), s"unexpected failure: $died")
    // the lake HAS the crashed batch's rows; the checkpoint does not
    assert(spark.read.parquet(s"$dir/lake").count() > 0,
      "crash must land AFTER the merge for this test to exercise replay")

    // restart from the same checkpoint with the normal sink: the batch
    // replays through the idempotent merge, then the tail drains
    LiveIngest.runAvailableNow(spark, tail(T0, tNow),
      s"$dir/lake", s"$dir/ckpt", interval = "15m")

    def withSeq(path: String): Seq[String] =
      spark.read.parquet(path)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val recovered = withSeq(s"$dir/lake")
    val clean = withSeq(s"$dir/clean_lake")
    assert(recovered.nonEmpty && recovered == clean,
      s"recovered lake must equal the uninterrupted run byte-for-byte\n" +
        s"recovered-only: ${recovered.diff(clean).take(3)}\n" +
        s"clean-only: ${clean.diff(recovered).take(3)}")
  }
}
