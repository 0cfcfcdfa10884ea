package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.normalize.Exchanges
import graft.streaming.Backfill

/** End-to-end backfill over fixture payloads (SURVEY.md §5.4): plan
  * chunks → "fetch" coinbase-shaped JSON → normalize → merged lake;
  * re-ingest must be byte-identical (idempotence).
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L // 2021-01-01
  private val HourMs = 3600000L

  /** Fixture "exchange": returns a coinbase-shaped payload with one 1h
    * candle per hour in the window, deterministic values.
    */
  private def fixtureFetch(c: Backfill.Chunk): DataFrame = {
    val candles = (c.startMs until c.endMs by HourMs).map { t =>
      val base = (t / HourMs) % 1000
      s"[${t / 1000}, ${base - 1}.0, ${base + 1}.0, $base.0, $base.5, 42.0]"
    }
    Seq((s"[${candles.mkString(",")}]", c.symbol)).toDF("payload", "symbol")
      .transform(Exchanges.coinbase)
  }

  test("plan × fixture fetch × merge: full horizon lands, idempotently") {
    val lake = Files.createTempDirectory("graft_backfill").toString + "/lake"
    val horizonDays = 3
    val chunks = Backfill.plan(Seq("BTC-USDT"), Seq("1h"),
      T0, T0 + horizonDays * 86400000L)
    // 1h → chunkDays 12 → 3-day horizon = 1 chunk
    assert(chunks.length == 1)

    Backfill.run(spark, chunks, fixtureFetch, lake, ingestSeq = 1)
    val out = spark.read.parquet(lake)
    assert(out.count() == horizonDays * 24)
    // partition pruning works: one date directory per day
    val dates = out.select($"date").distinct().as[String].collect().sorted
    assert(dates.toSeq == Seq("20210101", "20210102", "20210103"))

    // re-run the same backfill: nothing changes (restart story)
    Backfill.run(spark, chunks, fixtureFetch, lake, ingestSeq = 2)
    val again = spark.read.parquet(lake)
    assert(again.count() == horizonDays * 24)
    // values survived: spot-check one candle
    val c0 = again.filter($"timestamp" === lit(new java.sql.Timestamp(T0))).collect()(0)
    assert(c0.getAs[Double]("volume") == 42.0)
    assert(c0.getAs[String]("exchange") == "coinbase")
  }

  test("multi-interval plan merges each interval separately") {
    val lake = Files.createTempDirectory("graft_backfill2").toString + "/lake"
    val chunks = Backfill.plan(Seq("BTC-USDT"), Seq("1h", "1d"), T0, T0 + 86400000L)
    Backfill.run(spark, chunks, fixtureFetch, lake, ingestSeq = 1)
    val out = spark.read.parquet(lake)
    val byInterval = out.groupBy($"interval").count()
      .as[(String, Long)].collect().toMap
    assert(byInterval("1h") == 24)
    assert(byInterval("1d") == 24) // fixture emits hourly rows regardless
  }
}
