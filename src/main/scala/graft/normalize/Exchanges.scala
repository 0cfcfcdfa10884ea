package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Columnar normalizers for the five exchange payload shapes
  * (SURVEY.md §2.1 S1–S5, FIXTURES.md §2): each takes a DataFrame with a
  * raw JSON `payload` string column (one HTTP response body per row) plus
  * `symbol` and emits canonical candle rows. All decoding is built-in
  * Catalyst (`from_json`, `element_at`, casts, `timestamp_seconds`/
  * `timestamp_millis`) — no UDFs, fully codegen'd, so normalization
  * scales with partitions, unlike the reference's per-row Python loops
  * (crypto_collector.py:120–131 etc.).
  *
  * The quirk matrix being normalized (the real schema work):
  *  - field ORDER differs per exchange (low/high swapped, etc.)
  *  - timestamp UNIT differs: epoch-seconds (coinbase, bitstamp, kucoin)
  *    vs epoch-milliseconds (bitfinex, binanceus)
  *  - number ENCODING differs: JSON numbers vs strings
  *  - envelope differs: bare array vs `{data:{ohlc:[...]}}` vs
  *    `{code, data}` with an app-level success code
  *  - row order differs: newest-first (coinbase, kucoin) vs ascending
  */
object Exchanges {

  /** Bare array-of-arrays payloads (coinbase, bitfinex, binanceus): parse
    * as array<array<string>> — every element castable from string later.
    */
  private val ArrShape: DataType = ArrayType(ArrayType(StringType))

  private def explodeRows(df: DataFrame, parsed: Column): DataFrame =
    df.withColumn("__row", explode(parsed))

  private def candle(ts: Column, o: Column, h: Column, l: Column,
                     c: Column, v: Column, exchange: String): Seq[Column] = Seq(
    ts.as("timestamp"),
    o.cast("double").as("open"), h.cast("double").as("high"),
    l.cast("double").as("low"), c.cast("double").as("close"),
    v.cast("double").as("volume"),
    col("symbol"), lit(exchange).as("exchange"))

  private def f(i: Int): Column = element_at(col("__row"), i)

  /** Coinbase: `[ts_s, low, high, open, close, vol]`, epoch-seconds,
    * newest-first (order irrelevant post-normalization; consumers sort).
    * crypto_collector.py:113–131.
    */
  def coinbase(raw: DataFrame): DataFrame =
    explodeRows(raw, from_json(col("payload"), ArrShape))
      .select(candle(timestamp_seconds(f(1).cast("long")),
        f(4), f(3), f(2), f(5), f(6), "coinbase"): _*)

  /** Bitstamp: `{data:{ohlc:[{timestamp,open,high,low,close,volume}]}}`,
    * epoch-seconds strings, string numbers. crypto_collector.py:197–213.
    */
  def bitstamp(raw: DataFrame): DataFrame = {
    val shape = StructType(Seq(StructField("data", StructType(Seq(
      StructField("ohlc", ArrayType(MapType(StringType, StringType))))))))
    raw.withColumn("__row", explode(from_json(col("payload"), shape).getField("data").getField("ohlc")))
      .select(candle(timestamp_seconds(element_at(col("__row"), "timestamp").cast("long")),
        element_at(col("__row"), "open"), element_at(col("__row"), "high"),
        element_at(col("__row"), "low"), element_at(col("__row"), "close"),
        element_at(col("__row"), "volume"), "bitstamp"): _*)
  }

  /** Bitfinex: `[ts_ms, open, close, high, low, vol]`, epoch-millis,
    * ascending (server-side `sort: 1`). crypto_collector.py:274–290.
    */
  def bitfinex(raw: DataFrame): DataFrame =
    explodeRows(raw, from_json(col("payload"), ArrShape))
      .select(candle(timestamp_millis(f(1).cast("long")),
        f(2), f(4), f(5), f(3), f(6), "bitfinex"): _*)

  /** Kucoin: `{code:"200000", data:[[ts_s_str, open, close, high, low,
    * vol, turnover]]}`, string numbers, newest-first; rows with a
    * non-success app code are dropped (the reference returns `[]`,
    * crypto_collector.py:352–369).
    */
  def kucoin(raw: DataFrame): DataFrame = {
    val shape = StructType(Seq(
      StructField("code", StringType),
      StructField("data", ArrayType(ArrayType(StringType)))))
    val parsed = raw.withColumn("__p", from_json(col("payload"), shape))
      .filter(col("__p.code") === "200000")
    parsed.withColumn("__row", explode(col("__p.data")))
      .select(candle(timestamp_seconds(f(1).cast("long")),
        f(2), f(4), f(5), f(3), f(6), "kucoin"): _*)
  }

  /** Binance.US: 12-field klines, fields 0–5 used
    * `[open_time_ms, open, high, low, close, vol, ...]`, epoch-millis,
    * string numbers. crypto_collector.py:439–459.
    */
  def binanceUs(raw: DataFrame): DataFrame =
    explodeRows(raw, from_json(col("payload"), ArrShape))
      .select(candle(timestamp_millis(f(1).cast("long")),
        f(2), f(3), f(4), f(5), f(6), "binanceus"): _*)

  /** All five, keyed by exchange name (the reference's registry,
    * crypto_collector.py:491–497).
    */
  val all: Map[String, DataFrame => DataFrame] = Map(
    "coinbase" -> coinbase, "bitstamp" -> bitstamp, "bitfinex" -> bitfinex,
    "kucoin" -> kucoin, "binanceus" -> binanceUs)
}
