package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candle resampling: aggregate fine-grained OHLCV candles into a coarser
  * interval — `first(open) / max(high) / min(low) / last(close) /
  * sum(volume)` per tumbling window (SURVEY.md §2.5 note: the reference
  * re-fetches every granularity from the exchange APIs; resampling
  * computes 1h/4h/6h/1d locally from the 15m base, removing 4/5ths of its
  * API traffic).
  *
  * One hash aggregation, no window sort: open/close use `min_by`/`max_by`
  * ordered by the in-window timestamp (unique per (symbol, exchange,
  * interval) series by construction — the lake merge dedups on it).
  * Partial aggregation combines map-side, so at 100 TB this is one
  * shuffle of |windows| rows, not |candles|.
  */
object Resample {

  /** @param candles canonical candles (timestamp/open/high/low/close/
    *                volume/symbol/exchange)
    * @param target  coarser interval string, e.g. "1 hour", "1 day"
    *                (Spark window duration syntax)
    */
  def resample(candles: DataFrame, target: String): DataFrame =
    candles
      .groupBy(col("symbol"), col("exchange"),
        window(col("timestamp"), target).as("w"))
      .agg(
        min_by(col("open"), col("timestamp")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("timestamp")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_src"))
      .select(col("symbol"), col("exchange"),
        col("w.start").as("timestamp"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n_src"))
}
