package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Canonical OHLCV candle — the reference's single logical record shape,
  * produced identically by all five exchange parsers
  * (crypto_collector.py:123–131, 205–213, 282–290, 361–369, 451–459;
  * `exchange` injected at 583–584).
  *
  * Doubles, not decimals: the reference works in Python floats throughout
  * (explicit `float()` casts), a semantic we preserve (SURVEY.md §1.2).
  */
case class Candle(
    timestamp: Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    symbol: String,
    exchange: String)

object Candle {
  /** StructType mirror of the case class (for raw DataFrame stages). */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("exchange", StringType, nullable = false)))

  /** Lake partition columns (crypto_collector.py:514–521 path scheme,
    * expressed as true Hive partition levels — SURVEY.md §1.3).
    */
  val partitionCols: Seq[String] = Seq("symbol", "interval", "data_type", "exchange", "date")
}
