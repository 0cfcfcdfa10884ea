package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.normalize.{Exchanges, Intervals, Symbols}

/** Normalization unit tests against the five payload shapes
  * (FIXTURES.md §2): field order, timestamp unit, number encoding.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  // One candle: ts=2021-01-01T00:00:00Z, o=100.5, h=110.25, l=90.75,
  // c=105.0, v=12.5 — rendered in each exchange's wire shape.
  private val tsS  = 1609459200L
  private val tsMs = tsS * 1000

  private def raw(payload: String, symbol: String = "BTC-USDT") =
    Seq((payload, symbol)).toDF("payload", "symbol")

  private def checkOne(df: org.apache.spark.sql.DataFrame, exchange: String): Unit = {
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[java.sql.Timestamp]("timestamp").getTime == tsMs)
    assert(r.getAs[Double]("open") == 100.5)
    assert(r.getAs[Double]("high") == 110.25)
    assert(r.getAs[Double]("low") == 90.75)
    assert(r.getAs[Double]("close") == 105.0)
    assert(r.getAs[Double]("volume") == 12.5)
    assert(r.getAs[String]("symbol") == "BTC-USDT")
    assert(r.getAs[String]("exchange") == exchange)
  }

  test("coinbase: [ts_s, low, high, open, close, vol], epoch-s, numbers") {
    checkOne(Exchanges.coinbase(raw(s"[[$tsS, 90.75, 110.25, 100.5, 105.0, 12.5]]")), "coinbase")
  }

  test("bitstamp: {data:{ohlc:[{...}]}}, epoch-s strings, string numbers") {
    val p = s"""{"data":{"ohlc":[{"timestamp":"$tsS","open":"100.5","high":"110.25","low":"90.75","close":"105.0","volume":"12.5"}]}}"""
    checkOne(Exchanges.bitstamp(raw(p)), "bitstamp")
  }

  test("bitfinex: [ts_ms, open, close, high, low, vol], epoch-ms, numbers") {
    checkOne(Exchanges.bitfinex(raw(s"[[$tsMs, 100.5, 105.0, 110.25, 90.75, 12.5]]")), "bitfinex")
  }

  test("kucoin: {code, data:[[ts_s_str, open, close, high, low, vol, turnover]]}") {
    val p = s"""{"code":"200000","data":[["$tsS","100.5","105.0","110.25","90.75","12.5","1300.0"]]}"""
    checkOne(Exchanges.kucoin(raw(p)), "kucoin")
  }

  test("kucoin: non-success app code yields no rows") {
    val p = s"""{"code":"400100","data":[["$tsS","1","2","3","0.5","9","9"]]}"""
    assert(Exchanges.kucoin(raw(p)).count() == 0)
  }

  test("binanceus: 12-field kline, fields 0-5, epoch-ms, string numbers") {
    val p = s"""[[$tsMs, "100.5", "110.25", "90.75", "105.0", "12.5", $tsMs, "0", 1, "0", "0", "0"]]"""
    checkOne(Exchanges.binanceUs(raw(p)), "binanceus")
  }

  test("symbol rewrites match the reference per exchange") {
    val df = Seq("BTC-USDT", "ETH-USD").toDF("s")
    val out = df.select(
      Symbols.toCoinbase($"s").as("cb"), Symbols.toBitstamp($"s").as("bs"),
      Symbols.toBitfinex($"s").as("bf"), Symbols.toKucoin($"s").as("kc"),
      Symbols.toBinanceUs($"s").as("bn")).collect()
    assert(out(0) == Row("BTC-USD", "btcusd", "tBTCUSD", "BTC-USDT", "BTCUSDT"))
    assert(out(1) == Row("ETH-USD", "ethusd", "tETHUSD", "ETH-USD", "ETHUSD"))
  }

  test("interval decode mirrors get_interval_ms incl. default") {
    assert(Intervals.intervalMs("15m") == 900000L)
    assert(Intervals.intervalMs("1h") == 3600000L)
    assert(Intervals.intervalMs("4h") == 14400000L)
    assert(Intervals.intervalMs("1d") == 86400000L)
    assert(Intervals.intervalMs("1w") == 604800000L)
    assert(Intervals.intervalMs("bogus") == 900000L) // reference default
  }

  test("chunk windows cover [start,end) exactly, no gap/overlap") {
    val start = 1609459200000L
    val end = start + 40L * 86400000L
    for (iv <- Intervals.All) {
      val ws = Intervals.chunkWindows(start, end, iv)
      assert(ws.head._1 == start && ws.last._2 == end)
      ws.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
      // each chunk fetches ≤ 300 candles
      ws.foreach { case (s, e) =>
        assert((e - s) / Intervals.intervalMs(iv) <= 300 || (e - s) <= 86400000L)
      }
    }
  }

  test("trigger predicates mirror should_collect_interval") {
    assert(Intervals.shouldCollect("15m", 13, 37).contains(true))
    assert(Intervals.shouldCollect("1h", 13, 0).contains(true))
    assert(Intervals.shouldCollect("1h", 13, 15).contains(false))
    assert(Intervals.shouldCollect("4h", 12, 0).contains(true))
    assert(Intervals.shouldCollect("4h", 13, 0).contains(false))
    assert(Intervals.shouldCollect("6h", 18, 59).contains(true)) // minute unchecked (reference quirk)
    assert(Intervals.shouldCollect("1d", 0, 0).contains(true))
    assert(Intervals.shouldCollect("1d", 1, 0).contains(false))
    assert(Intervals.shouldCollect("2h", 0, 0).isEmpty)
  }

  test("next boundary = ceil(now/period)*period") {
    val p = 900000L
    assert(Intervals.nextBoundaryMs(0L, p) == 0L)
    assert(Intervals.nextBoundaryMs(1L, p) == p)
    assert(Intervals.nextBoundaryMs(p, p) == p)
    assert(Intervals.nextBoundaryMs(p + 1, p) == 2 * p)
  }
}
