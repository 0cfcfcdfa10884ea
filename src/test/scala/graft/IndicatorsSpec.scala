package graft

import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** Invariants for the technical-indicator tier (q90–q92). The DuckDB
  * hash-match is the cross-engine gate; these specs pin the mathematical
  * properties that a hash can't explain when it breaks.
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  test("q90: band ordering, RSI range, drawdown sign, SMA window mean") {
    val rows = Indicators.q90Indicators(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sma = r.getAs[Double]("sma7")
      val up = r.getAs[Double]("bb_upper")
      val lo = r.getAs[Double]("bb_lower")
      assert(lo <= sma && sma <= up, s"band ordering violated: $r")
      val dd = r.getAs[Double]("drawdown")
      assert(dd <= 0.0, s"drawdown must be <= 0: $r")
      if (!r.isNullAt(r.fieldIndex("rsi14"))) {
        val rsi = r.getAs[Double]("rsi14")
        assert(rsi >= 0.0 && rsi <= 100.0, s"RSI out of range: $r")
      }
    }
    // first row of each series: window has 1 row, so sma7 == quantized close
    val firstBySeries = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (_, rs) => rs.minBy(_.getAs[String]("day")) }
    firstBySeries.foreach { r =>
      val cl = math.floor(r.getAs[Double]("close") * 10000) / 10000.0
      assert(math.abs(r.getAs[Double]("sma7") - cl) < 1e-9,
        s"1-row SMA != close: $r")
    }
  }

  test("q90: monotone series has RSI 100 and zero drawdown at the high") {
    // synthetic strictly-increasing series → every diff is a gain
    val ev = (1 to 20).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"),
        1L, "up", 100.0 + i, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ind").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q90Indicators(spark, dir).collect()
    assert(out.length == 20)
    out.drop(1).foreach { r =>
      assert(r.getAs[Double]("rsi14") == 100.0, s"monotone-up RSI must be 100: $r")
      assert(r.getAs[Double]("drawdown") == 0.0, s"new high has zero drawdown: $r")
    }
  }

  test("q159: weekly-periodic series — seasonal-naive wins; drifting series — naive wins") {
    // "weekly": value depends only on day-of-week (period 7) with big
    // amplitude → lag-7 error 0, lag-1 error large. "drift": value
    // climbs 1 unit/day → lag-1 error 1/day, lag-7 error 7/day.
    val days = (1 to 28).map(i => java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"))
    val ev = days.zipWithIndex.flatMap { case (ts, i) =>
      Seq((i.toLong * 2, ts, 1L, "weekly", 100.0 + 10.0 * (i % 7), "{}"),
        (i.toLong * 2 + 1, ts, 1L, "drift", 100.0 + i, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("backtest").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q159ForecastBacktest(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val wk = out("weekly")
    assert(wk.getAs[Long]("n_eval") == 21, "first 7 days must be excluded")
    assert(wk.getAs[Long]("seasonal_abs_err") == 0L && wk.getAs[Boolean]("seasonal_wins"),
      s"period-7 series must backtest perfectly on lag-7: $wk")
    val dr = out("drift")
    assert(!dr.getAs[Boolean]("seasonal_wins"), s"drifting series must favor naive: $dr")
    // exact integer MAE in cl units: naive errs 1.0/day = 10000 cl
    assert(dr.getAs[Long]("naive_mae_cl") == 10000L && dr.getAs[Long]("seasonal_mae_cl") == 70000L, s"$dr")
  }

  test("q91: correlation is in [-1,1]; identical series correlate at ~1") {
    val rows = Indicators.q91ReturnCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("ret_corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $r")
    }
    // two copies of the same walk (offset event ids, same values) → corr ~ 1
    val walk = (1 to 25).flatMap { i =>
      val v = 100.0 + 7 * math.sin(i * 1.3) + i % 5
      Seq(
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-02-$i%02d 12:00:00"), 1L, "a", v, "{}"),
        (100 + i.toLong, java.sql.Timestamp.valueOf(f"2024-02-$i%02d 12:00:00"), 1L, "b", v, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("corr").toString
    walk.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val c = Indicators.q91ReturnCorr(spark, dir).collect()
    assert(c.length == 1)
    // returns are quantized to basis points; identical series differ only
    // by the (identical) quantization → corr exactly 1 up to fxp rounding
    assert(math.abs(c.head.getAs[Double]("ret_corr") - 1.0) < 1e-6, c.head.toString)
  }

  test("q109: constant series EWMA equals the constant; head denominator adapts") {
    val ev = (1 to 12).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"),
        1L, "flat", 42.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ind109").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q109Ewma(spark, dir).orderBy("day").collect()
    assert(out.length == 12)
    out.foreach { r =>
      assert(r.getAs[Double]("ewma") == 42.5, s"constant series must hold: $r")
    }
    // head adaptivity: row k (0-based, k < 8) has k+1 populated lags →
    // den = sum of the TOP k+1 dyadic weights 128,64,... = 256 - 2^(7-k)
    out.take(8).zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("den") == 256L - (1L << (7 - k)),
        s"adaptive denominator wrong at row $k: $r")
    }
    assert(out.drop(8).forall(_.getAs[Long]("den") == 255L))
  }

  test("q110: alternating series has strongly negative lag-1 autocorrelation") {
    val ev = (1 to 20).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"),
        1L, "zig", if (i % 2 == 0) 110.0 else 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ind110").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q110Autocorr(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_pairs") == 18L, s"20 days -> 19 returns -> 18 pairs: $r")
    val ac = r.getAs[Double]("autocorr_lag1")
    assert(ac < -0.99, s"alternating returns must anti-correlate: $r")
  }

  test("q93: present hours pass through; gaps interpolate strictly between neighbors") {
    val rows = Indicators.q93Interpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.getAs[Boolean]("is_gap"))
        assert(r.getAs[Double]("interp") == r.getAs[Double]("val"), s"pass-through broken: $r")
      assert(!r.isNullAt(r.fieldIndex("interp")), s"null interp inside grid span: $r")
    }
  }

  test("q93: a linear synthetic series interpolates its gap exactly") {
    // hours 0,1,2,3,10 with value = 5*hour; hours 4..9 missing →
    // linear interpolation must reconstruct 5*hour exactly
    val ev = Seq(0, 1, 2, 3, 10).map { h =>
      (h.toLong, java.sql.Timestamp.valueOf(f"2024-03-01 ${h}%02d:30:00"),
        1L, "s", 5.0 * h, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("interp").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q93Interpolate(spark, dir).collect()
    assert(out.length == 11)
    out.foreach { r =>
      val h = r.getAs[Long]("hour") % 24
      assert(r.getAs[Double]("interp") == 5.0 * h, s"not linear: $r")
    }
  }

  test("q94: planted engulfing candle and gap-up fire; flags recompute") {
    // day1 red (open 110 close 100), day2 green engulfing (95→115),
    // day3 gaps up (low 130 > day2 high 120)
    def candle(day: Int, o: Double, h: Double, l: Double, c: Double) = Seq(
      (day * 10L, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 01:00:00"), 1L, "p", o, "{}"),
      (day * 10L + 1, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 12:00:00"), 1L, "p", h, "{}"),
      (day * 10L + 2, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 13:00:00"), 1L, "p", l, "{}"),
      (day * 10L + 3, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 23:00:00"), 1L, "p", c, "{}"))
    val ev = (candle(1, 110, 112, 99, 100) ++ candle(2, 95, 120, 94, 115) ++
      candle(3, 131, 140, 130, 135))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("candle").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Indicators.q94CandlePatterns(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Boolean]("bull_engulf"), r.getAs[Boolean]("gap_up"))).toMap
    assert(out.get("2024-04-02").exists(_._1), s"engulfing not flagged: $out")
    assert(out.get("2024-04-03").exists(_._2), s"gap-up not flagged: $out")
  }

  test("q95: flagged spreads exceed |z|=3 and rz is reproducible from the row") {
    val rows = Indicators.q95SpreadMonitor(spark, sf).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rz")) > 3.0, s"under threshold: $r")
      assert(r.getAs[Double]("spread") ==
        r.getAs[Double]("ca") - r.getAs[Double]("cb"), s"spread mismatch: $r")
    }
  }

  test("q92: flagged outliers all exceed the robust-z threshold, both tails") {
    val rows = Indicators.q92MadOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rz")) > 3.5, s"under-threshold row: $r")
      val recomputed = 0.6745 * (r.getAs[Double]("value") - r.getAs[Double]("med")) /
        r.getAs[Double]("mad")
      assert(recomputed == r.getAs[Double]("rz"), s"rz not reproducible: $r")
    }
  }
}
