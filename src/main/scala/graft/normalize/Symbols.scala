package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-exchange symbol rewriting (SURVEY.md §2.6 F1–F4) as columnar
  * expressions — the reference does this per-request in Python
  * (crypto_collector.py:103–111, 175–184, 252–261, 426); here it is a
  * codegen'd projection usable on billions of rows.
  *
  * Canonical input form: `BASE-QUOTE`, e.g. `BTC-USDT`.
  * ASCII case folds use `translate` (see [[graft.operators.TextOps]] on
  * why `lower` is avoided).
  */
object Symbols {
  private val Uc = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Lc = "abcdefghijklmnopqrstuvwxyz"

  private def base(sym: Column): Column  = split(sym, "-").getItem(0)
  private def quote(sym: Column): Column = split(sym, "-").getItem(1)
  /** USDT trades as USD on the US-regulated venues (crypto_collector.py:107). */
  private def usdQuote(sym: Column): Column =
    when(quote(sym) === "USDT", "USD").otherwise(quote(sym))

  /** Coinbase: `BTC-USD` (dash kept, USDT→USD; crypto_collector.py:103–111). */
  def toCoinbase(sym: Column): Column = concat(base(sym), lit("-"), usdQuote(sym))

  /** Bitstamp: `btcusd` (lowercase concat, USDT→USD; 175–184). */
  def toBitstamp(sym: Column): Column =
    translate(concat(base(sym), usdQuote(sym)), Uc, Lc)

  /** Bitfinex: `tBTCUSD` (t-prefix concat, USDT→USD; 252–261). */
  def toBitfinex(sym: Column): Column = concat(lit("t"), base(sym), usdQuote(sym))

  /** Kucoin: unchanged `BTC-USDT` (the reference's replace is a no-op we
    * do not replicate; 343, SURVEY.md §7 hard part 6).
    */
  def toKucoin(sym: Column): Column = sym

  /** Binance.US: `BTCUSDT` (dash stripped, quote kept; 426). */
  def toBinanceUs(sym: Column): Column = concat(base(sym), quote(sym))
}
