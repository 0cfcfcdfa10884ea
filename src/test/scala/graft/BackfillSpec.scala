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

  private val DayMs = 86400000L

  test("per-symbol start times drive each symbol's chunk plan") {
    val chunks = Backfill.planPerSymbol(
      Seq("BTC-USDT", "ETH-USDT"), Seq("1h"),
      symbolStartMs = Map("BTC-USDT" -> (T0 - 2 * DayMs)),
      endMs = T0 + DayMs, defaultStartMs = T0)
    val bySym = chunks.groupBy(_.symbol)
    assert(bySym("BTC-USDT").map(_.startMs).min == T0 - 2 * DayMs)
    assert(bySym("ETH-USDT").map(_.startMs).min == T0)
    // each symbol's windows cover its own horizon exactly
    bySym.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.startMs)
      assert(sorted.last.endMs == T0 + DayMs)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.endMs == b.startMs)
        case _         => ()
      }
    }
  }

  test("availability clamp skips or truncates pre-cutoff windows") {
    val cut = 1577836800000L // 2020-01-01, the BinanceUS BTC-USDT listing
    // whole window before the listing → skip (reference's `continue`)
    assert(Backfill.clampWindow("binanceus", "BTC-USDT", cut - 2000, cut - 1000).isEmpty)
    // straddling window → start raised to the cutoff
    assert(Backfill.clampWindow("binanceus", "BTC-USDT", cut - 1000, cut + 1000)
      .contains((cut, cut + 1000)))
    // other symbols / other exchanges untouched
    assert(Backfill.clampWindow("binanceus", "ETH-USDT", cut - 1000, cut + 1000)
      .contains((cut - 1000, cut + 1000)))
    assert(Backfill.clampWindow("coinbase", "BTC-USDT", cut - 1000, cut + 1000)
      .contains((cut - 1000, cut + 1000)))
  }

  /** Canonical-candle fixture for the fan-out path: one hourly candle per
    * window hour, tagged with the fetching exchange.
    */
  private def canonFetch(c: Backfill.Chunk, ex: String): DataFrame = {
    val rows = (c.startMs until c.endMs by HourMs).map { t =>
      (new java.sql.Timestamp(t), 1.0, 2.0, 0.5, 1.5, 42.0, c.symbol, ex)
    }
    rows.toDF("timestamp", "open", "high", "low", "close", "volume", "symbol", "exchange")
  }

  test("fan-out run: one chunk lands rows tagged with all five exchanges") {
    val lake = Files.createTempDirectory("graft_fanout").toString + "/lake"
    val exchanges = Seq("coinbase", "bitstamp", "bitfinex", "kucoin", "binanceus")
    val chunks = Backfill.plan(Seq("BTC-USDT"), Seq("1h"), T0, T0 + DayMs)
    Backfill.runFanOut(spark, chunks, exchanges, canonFetch, lake, ingestSeq = 1)
    val out = spark.read.parquet(lake)
    assert(out.select($"exchange").distinct().as[String].collect().sorted.toSeq
      == exchanges.sorted)
    assert(out.count() == 24 * 5)
  }

  test("derivatives/options surface: canonical schema, declared-but-empty like the reference") {
    val der = Backfill.collectDerivatives(spark, "BTC-USDT", "1h", T0, T0 + DayMs)
    val opt = Backfill.collectOptions(spark, "BTC-USDT", T0, T0 + DayMs)
    assert(der.schema == graft.sources.CandleSource.Schema)
    assert(opt.schema == graft.sources.CandleSource.Schema)
    assert(der.isEmpty && opt.isEmpty)
    // the data_type partition tagging composes: a perpetual lake write is
    // schema-valid even while every venue returns empty
    val tagged = graft.lake.MergeWriter.withPartitionCols(der, "1h", "perpetual")
    assert(tagged.columns.contains("data_type") && tagged.isEmpty)
  }

  test("fan-out applies the BinanceUS clamp: pre-2020 hours missing there only") {
    val lake = Files.createTempDirectory("graft_fanout2").toString + "/lake"
    val cut = 1577836800000L
    // window straddles the listing by 6 hours on each side
    val chunks = Seq(Backfill.Chunk("BTC-USDT", "1h", cut - 6 * HourMs, cut + 6 * HourMs))
    Backfill.runFanOut(spark, chunks, Seq("coinbase", "binanceus"), canonFetch,
      lake, ingestSeq = 1)
    val out = spark.read.parquet(lake)
    val counts = out.groupBy($"exchange").count().as[(String, Long)].collect().toMap
    assert(counts("coinbase") == 12, "unclamped venue covers the full window")
    assert(counts("binanceus") == 6, "clamped venue starts at the 2020 listing")
    val minBinance = out.filter($"exchange" === "binanceus")
      .select(min(unix_micros($"timestamp") / 1000)).as[Double].collect()(0).toLong
    assert(minBinance == cut)
  }
}
