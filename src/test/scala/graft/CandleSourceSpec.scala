package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector tests: chunk-planned partitions, limit
  * pushdown, column pruning, end-to-end read into the merge sink.
  */
class CandleSourceSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L // 2021-01-01

  private def read(opts: (String, String)*) = {
    val base = spark.read.format("graft.sources.CandleSource")
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("scan covers the window with one row per interval step") {
    val df = read("symbol" -> "BTC-USDT", "interval" -> "1h",
      "startMs" -> T0.toString, "endMs" -> (T0 + 2 * 86400000L).toString)
    assert(df.count() == 48)
    val ts = df.select(unix_micros($"timestamp") / 1000).as[Double].collect().map(_.toLong).sorted
    assert(ts.head == T0 && ts.last == T0 + 47 * 3600000L)
  }

  test("absent window gets the Kucoin default synthesis: 300 intervals back from now") {
    // only a frozen clock — no startMs/endMs
    val df = read("symbol" -> "BTC-USDT", "interval" -> "1h",
      "nowMs" -> (T0 + 300L * 3600000L).toString)
    assert(df.count() == 300, "window spans exactly maxCandles intervals")
    val ts = df.select(unix_micros($"timestamp") / 1000).as[Double]
      .collect().map(_.toLong).sorted
    assert(ts.head == T0, "start = end − 300 × interval")
  }

  test("partition planning matches reference chunk math (one per ≤300-candle window)") {
    // 40 days of 1h candles: chunkDays(1h)=12 → 4 partitions
    val df = read("interval" -> "1h",
      "startMs" -> T0.toString, "endMs" -> (T0 + 40L * 86400000L).toString)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("limit is pushed to the reader (no full-window fetch)") {
    val df = read("interval" -> "15m",
      "startMs" -> T0.toString, "endMs" -> (T0 + 86400000L).toString).limit(5)
    assert(df.count() == 5)
    // pushLimit succeeded → the scan itself carries the cap (and Spark
    // plants no per-partition LocalLimit, trusting the source)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("pushedLimit=5"), s"limit must reach the scan: ${plan.take(300)}")
  }

  test("column pruning reaches readSchema") {
    val df = read("interval" -> "1h",
      "startMs" -> T0.toString, "endMs" -> (T0 + 86400000L).toString)
      .select($"close", $"symbol")
    assert(df.schema.fieldNames.toSeq == Seq("close", "symbol"))
    assert(df.where($"close" >= 0).count() == 24)
  }

  test("per-exchange rate-limit defaults: binanceus 500 ms, others 1000 ms; option wins") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    def planned(opts: Map[String, String]) =
      new graft.sources.CandleScanBuilder(new CaseInsensitiveStringMap(opts.asJava))
        .build().asInstanceOf[graft.sources.CandleScan]
        .planInputPartitions()
        .map(_.asInstanceOf[graft.sources.CandleInputPartition])
    val window = Map("interval" -> "1h",
      "startMs" -> T0.toString, "endMs" -> (T0 + 86400000L).toString)
    assert(planned(window + ("exchange" -> "binanceus")).forall(_.rateLimitMs == 500L))
    assert(planned(window + ("exchange" -> "coinbase")).forall(_.rateLimitMs == 1000L))
    assert(planned(window + ("exchange" -> "kucoin")).forall(_.rateLimitMs == 1000L))
    // explicit option always beats the default table
    assert(planned(window + ("exchange" -> "binanceus", "rateLimitMs" -> "0"))
      .forall(_.rateLimitMs == 0L))
  }

  test("throttle fires once per partition (per request), not per candle") {
    // 24 candles in ONE chunk partition with a 300 ms throttle: per-
    // request sleeping costs 0.3 s; per-candle would cost 7.2 s
    val t0 = System.nanoTime()
    val n = read("interval" -> "1h", "rateLimitMs" -> "300",
      "startMs" -> T0.toString, "endMs" -> (T0 + 86400000L).toString).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n == 24)
    assert(sec < 5.0, f"throttle must be per-request; took $sec%.1f s for 24 candles")
  }

  test("connector → merge sink end-to-end") {
    val lake = java.nio.file.Files.createTempDirectory("graft_dsv2").toString + "/lake"
    val df = read("interval" -> "1h",
      "startMs" -> T0.toString, "endMs" -> (T0 + 86400000L).toString)
    val tagged = graft.lake.MergeWriter.withPartitionCols(df, "1h", "spot")
    graft.lake.MergeWriter.merge(spark, tagged, lake, 1)
    assert(spark.read.parquet(lake).count() == 24)
  }
}
