package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.LiveIngest

/** Streaming V2 source → merge lake end-to-end: offsets advance only to
  * completed interval boundaries, restart resumes from the checkpoint,
  * and the lake receives exactly one candle per closed interval.
  */
class CandleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L // 2021-01-01 00:00 UTC

  private def stream(nowMs: Long) =
    spark.readStream.format("graft.sources.CandleStreamSource")
      .option("symbol", "BTC-USDT").option("interval", "15m")
      .option("startMs", T0.toString)
      .option("nowMs", nowMs.toString)
      .load()

  test("micro-batch pulls exactly the closed candles; restart resumes offsets") {
    val dir = Files.createTempDirectory("graft_cstream").toString
    // frozen clock: 3 closed 15m intervals + 5 minutes of an open one
    val q = LiveIngest.start(spark, stream(T0 + 3 * 900000 + 300000),
      s"$dir/lake", s"$dir/ckpt", interval = "15m",
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val rows = spark.read.parquet(s"$dir/lake")
    assert(rows.count() == 3, "only completed intervals may land")
    val ts = rows.select(unix_micros($"timestamp") / 1000).as[Double]
      .collect().map(_.toLong).sorted
    assert(ts.toSeq == Seq(T0, T0 + 900000, T0 + 1800000))

    // clock advances 2 more intervals: restart fetches ONLY the delta
    val q2 = LiveIngest.start(spark, stream(T0 + 5 * 900000 + 10000),
      s"$dir/lake", s"$dir/ckpt", interval = "15m",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    val after = spark.read.parquet(s"$dir/lake")
    assert(after.count() == 5, s"expected 5 rows after resume, got ${after.count()}")
  }

  private def multiStream(nowMs: Long) =
    spark.readStream.format("graft.sources.CandleStreamSource")
      .option("series", "BTC-USDT:15m:coinbase,ETH-USDT:1h:kucoin")
      .option("startMs", T0.toString)
      .option("nowMs", nowMs.toString)
      .load()

  test("one query tails multiple (symbol,interval,exchange) series; each resumes independently") {
    val dir = Files.createTempDirectory("graft_mstream").toString
    def runOnce(nowMs: Long): Unit = {
      val q = multiStream(nowMs).writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // frozen clock at T0+2h05m: the 15m series has 8 closed candles,
    // the 1h series 2 — different per-series watermarks in ONE offset
    runOnce(T0 + 125 * 60000)
    val first = spark.read.parquet(s"$dir/out")
      .groupBy($"symbol").count().as[(String, Long)].collect().toMap
    assert(first("BTC-USDT") == 8, s"15m series: $first")
    assert(first("ETH-USDT") == 2, s"1h series: $first")

    // advance 1h: restart fetches ONLY each series' delta from the shared
    // checkpoint (4 more 15m candles, 1 more 1h candle)
    runOnce(T0 + 185 * 60000)
    val after = spark.read.parquet(s"$dir/out")
      .groupBy($"symbol").count().as[(String, Long)].collect().toMap
    assert(after("BTC-USDT") == 12, s"after resume: $after")
    assert(after("ETH-USDT") == 3, s"after resume: $after")
    // and the exchanges tag through per series
    val ex = spark.read.parquet(s"$dir/out")
      .select($"symbol", $"exchange").distinct().as[(String, String)].collect().toSet
    assert(ex == Set("BTC-USDT" -> "coinbase", "ETH-USDT" -> "kucoin"))
  }

  test("offset guards: legacy bare-long refuses multi-series; bad series keys rejected") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.{CandleMicroBatchStream, CandleOffset}
    import scala.jdk.CollectionConverters._
    def mkStream(opts: Map[String, String]) =
      new CandleMicroBatchStream(new CaseInsensitiveStringMap(opts.asJava))
    // single series: the legacy bare-long checkpoint still adopts cleanly
    val single = mkStream(Map("symbol" -> "BTC-USDT", "interval" -> "15m"))
    val adopted = single.deserializeOffset("1609459200000")
      .asInstanceOf[CandleOffset]
    assert(adopted.offsets == Map("BTC-USDT:15m:coinbase" -> 1609459200000L))
    // multi series: adopting onto series.head would hand the watermark to
    // whichever series the option string lists first — must fail instead
    val multi = mkStream(Map(
      "series" -> "BTC-USDT:15m:coinbase,ETH-USDT:1h:kucoin"))
    intercept[IllegalStateException](multi.deserializeOffset("1609459200000"))
    // keys outside the offset-JSON alphabet are config errors at start
    intercept[IllegalArgumentException](
      mkStream(Map("series" -> "BTC\"USDT:15m:coinbase")))
  }
}
