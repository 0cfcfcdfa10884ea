package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.normalize.Exchanges
import graft.operators.{AsOfJoin, Resample}
import graft.streaming.Backfill

/** Ingestion → lake → query integration: the reference-user's workflow
  * end to end. Candles are backfilled from fixture payloads into the
  * partitioned lake, read BACK from the lake (not from driver
  * testdata), resampled, and as-of aligned across exchanges — proving
  * the query operators compose over what the ingestion side actually
  * writes (schema, partition columns, dedup semantics intact).
  */
class LakeQuerySpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L // 2021-01-01
  private val Q = 900000L         // 15m

  /** Coinbase-shaped 15m fixture; values derive from timestamp AND
    * exchange so cross-exchange rows are distinguishable.
    */
  private def fetch(exchangeOffset: Long)(c: Backfill.Chunk): DataFrame = {
    val candles = (c.startMs until c.endMs by Q).map { t =>
      val base = (t / Q) % 1000 + exchangeOffset
      s"[${t / 1000}, ${base - 1}.0, ${base + 1}.0, $base.0, $base.5, 2.0]"
    }
    Seq((s"[${candles.mkString(",")}]", c.symbol)).toDF("payload", "symbol")
      .transform(Exchanges.coinbase)
  }

  test("backfill -> lake -> resample -> cross-exchange as-of, end to end") {
    val lake = Files.createTempDirectory("graft_lakeq").toString + "/lake"
    val chunks = Backfill.plan(Seq("BTC-USD"), Seq("15m"), T0, T0 + 86400000L)
    // two venues land in one lake (exchange column distinguishes)
    Backfill.run(spark, chunks, fetch(0), lake, ingestSeq = 1)
    val shifted = spark.read.parquet(lake) // coinbase rows present
    assert(shifted.select($"exchange").distinct().count() == 1)
    // second venue: same window, different values, exchange re-tagged
    val asBitstamp = (c: Backfill.Chunk) =>
      fetch(5000)(c).withColumn("exchange", lit("bitstamp"))
    Backfill.run(spark, chunks, asBitstamp, lake, ingestSeq = 2)

    val fromLake = spark.read.parquet(lake)
    assert(fromLake.count() == 2 * 96, "24h of 15m candles per venue")

    // resample the lake's 15m base to 1h — n_src proves 4 candles/window
    val hourly = Resample.resample(
      fromLake.filter($"exchange" === "coinbase"), "1 hour")
    assert(hourly.count() == 24)
    assert(hourly.select(min($"n_src"), max($"n_src"))
      .as[(Long, Long)].head() == ((4L, 4L)))
    // open = first 15m open of the hour, close = last 15m close
    // (coinbase field order is [time, low, high, OPEN, CLOSE, volume])
    val h0 = hourly.filter(unix_millis($"timestamp") === T0)
      .select($"open", $"close").as[(Double, Double)].head()
    val b0 = (T0 / Q) % 1000
    assert(h0 == ((b0.toDouble, (b0 + 3) + 0.5)))

    // as-of: each hourly coinbase candle picks up the latest bitstamp
    // 15m candle at-or-before its window start — the reference's
    // domain-natural cross-exchange alignment, over lake data
    val bs = fromLake.filter($"exchange" === "bitstamp")
      .select($"symbol".as("b_symbol"), $"timestamp".as("b_ts"),
        unix_millis($"timestamp").as("b_ms"), $"close".as("b_close"))
    val aligned = AsOfJoin.joinBucketed(
      hourly, bs,
      keyL = "symbol", keyR = "b_symbol", timeL = "timestamp", timeR = "b_ts",
      payload = Seq("b_ms", "b_close"), tieBreak = "b_ms",
      widthSeconds = 3600L)
    assert(aligned.count() == 24)
    // the matched bitstamp candle is exactly the hourly window's start slot
    val mismatched = aligned
      .filter($"asof_b_ms" =!= unix_millis($"timestamp")).count()
    assert(mismatched == 0,
      "every hourly row must align to the bitstamp candle at its window start")
    // and its value carries the +5000 venue offset
    val a0 = aligned.filter(unix_millis($"timestamp") === T0)
      .select($"asof_b_close").as[Double].head()
    assert(a0 == b0 + 5000 + 0.5)
  }
}
