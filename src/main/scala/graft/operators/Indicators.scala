package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Technical-indicator surface over candle series — the analytics the
  * reference's consumers run on the candles it collects (SMA, Bollinger
  * bands, RSI, VWAP, drawdown, cross-series correlation, robust outliers).
  * The reference itself stops at ingestion (crypto_collector.py:529–560
  * writes raw OHLCV and never aggregates); this tier is the downstream
  * query surface a candle lake exists to serve.
  *
  * Determinism contract (the q70/q77 fixed-point idiom): every windowed
  * SUM runs over integers (`value` floored at 1e-4 precision into a
  * long), so partial-aggregation order cannot perturb results across
  * partitionings or engines; each derived statistic is then a fixed
  * chain of identical IEEE double ops in Spark and DuckDB. Window frames
  * are ROWS-bounded (7/14 rows), so state per key is O(frame), not
  * O(partition) — the plan is one shuffle on the series key then a
  * single sorted pass, which holds at any series count.
  *
  * Scale shape: stage 1 is the q22 OHLC resample (partial+final hash
  * agg, map-side combine); stage 2 is one window pass partitioned by
  * series. At 100 TB the daily relation is ~5 orders smaller than the
  * tick relation, so the window pass is effectively free; the resample
  * agg dominates and scales linearly.
  */
object Indicators {

  /** Daily close/high/low/trades per event_type with the close quantized
    * to an exact long at 1e-4 (`cl`). Close is an order statistic
    * (max_by over unique ts) — no float summation anywhere upstream.
    */
  private def dailyCandles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day_ts"))
      .agg(
        min_by($"value", $"ts").as("open"),
        max_by($"value", $"ts").as("close"),
        max($"value").as("high"),
        min($"value").as("low"),
        count(lit(1)).as("n_trades"))
      .withColumn("cl", floor($"close" * 10000).cast("long"))
  }

  private val dailySql =
    """SELECT event_type, DATE_TRUNC('day', ts) AS day_ts,
      |    ARG_MIN(value, ts) AS open,
      |    ARG_MAX(value, ts) AS close, MAX(value) AS high, MIN(value) AS low,
      |    COUNT(*) AS n_trades,
      |    CAST(FLOOR(ARG_MAX(value, ts) * 10000) AS BIGINT) AS cl
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** SMA(7) + Bollinger(7, ±2σ) + RSI(14) + VWAP(7, trade-count-weighted)
    * + running-max drawdown per daily series. All window sums are over
    * exact longs; every double output is one identical op chain in both
    * engines (sqrt/division of exactly-representable integers).
    */
  def q90Indicators(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    val f7 = w.rowsBetween(-6, 0)
    val f14 = w.rowsBetween(-13, 0)
    val all = w.rowsBetween(Window.unboundedPreceding, 0)
    val diff = $"cl" - lag($"cl", 1).over(w)
    dailyCandles(s, d)
      .withColumn("s7", sum($"cl").over(f7))
      .withColumn("sxx7", sum($"cl" * $"cl").over(f7))
      .withColumn("n7", count(lit(1)).over(f7))
      .withColumn("gain", when(diff > 0, diff).when(diff.isNotNull, lit(0L)))
      .withColumn("loss", when(diff < 0, -diff).when(diff.isNotNull, lit(0L)))
      .withColumn("sg", sum($"gain").over(f14))
      .withColumn("sl", sum($"loss").over(f14))
      .withColumn("wn", sum($"cl" * $"n_trades").over(f7))
      .withColumn("wd", sum($"n_trades").over(f7))
      .withColumn("runmax", max($"cl").over(all))
      // derived doubles: identical expression shapes on the oracle side
      .withColumn("sma7", $"s7".cast("double") / $"n7" / 10000.0)
      .withColumn("sd7",
        sqrt(($"n7" * $"sxx7" - $"s7" * $"s7").cast("double")) / $"n7" / 10000.0)
      .withColumn("bb_upper", $"sma7" + lit(2.0) * $"sd7")
      .withColumn("bb_lower", $"sma7" - lit(2.0) * $"sd7")
      .withColumn("rsi14",
        when($"sl" > 0, lit(100.0) - lit(100.0) / (lit(1.0) + $"sg".cast("double") / $"sl".cast("double")))
          .when($"sg" > 0, lit(100.0))
          .when($"sg".isNotNull, lit(50.0)))
      .withColumn("vwap7", $"wn".cast("double") / $"wd".cast("double") / 10000.0)
      .withColumn("drawdown", ($"cl" - $"runmax").cast("double") / $"runmax".cast("double"))
      .select($"event_type", date_format($"day_ts", "yyyy-MM-dd").as("day"),
        $"close", $"sma7", $"bb_upper", $"bb_lower", $"rsi14", $"vwap7", $"drawdown")
      .orderBy($"event_type", $"day")
  }

  val q90Sql: String =
    s"""WITH daily AS (
      |  $dailySql
      |), diffed AS (
      |  SELECT *, cl - LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts) AS diff
      |  FROM daily
      |), ind AS (
      |  SELECT *,
      |    SUM(cl) OVER f7 AS s7,
      |    SUM(cl * cl) OVER f7 AS sxx7,
      |    COUNT(*) OVER f7 AS n7,
      |    SUM(CASE WHEN diff > 0 THEN diff WHEN diff IS NOT NULL THEN 0 END) OVER f14 AS sg,
      |    SUM(CASE WHEN diff < 0 THEN -diff WHEN diff IS NOT NULL THEN 0 END) OVER f14 AS sl,
      |    SUM(cl * n_trades) OVER f7 AS wn,
      |    SUM(n_trades) OVER f7 AS wd,
      |    MAX(cl) OVER (PARTITION BY event_type ORDER BY day_ts
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      |  FROM diffed
      |  WINDOW f7 AS (PARTITION BY event_type ORDER BY day_ts ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |    f14 AS (PARTITION BY event_type ORDER BY day_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
      |), fin AS (
      |  SELECT *,
      |    CAST(s7 AS DOUBLE) / n7 / 10000.0 AS sma7,
      |    SQRT(CAST(n7 * sxx7 - s7 * s7 AS DOUBLE)) / n7 / 10000.0 AS sd7
      |  FROM ind
      |)
      |SELECT event_type, STRFTIME(day_ts, '%Y-%m-%d') AS day, close,
      |  sma7,
      |  sma7 + 2.0 * sd7 AS bb_upper,
      |  sma7 - 2.0 * sd7 AS bb_lower,
      |  CASE WHEN sl > 0 THEN 100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))
      |       WHEN sg > 0 THEN 100.0
      |       WHEN sg IS NOT NULL THEN 50.0 END AS rsi14,
      |  CAST(wn AS DOUBLE) / CAST(wd AS DOUBLE) / 10000.0 AS vwap7,
      |  CAST(cl - runmax AS DOUBLE) / CAST(runmax AS DOUBLE) AS drawdown
      |FROM fin
      |ORDER BY event_type, day""".stripMargin

  /** Pairwise daily-return correlation between series (the quant
    * cross-correlation matrix). Returns are quantized to basis points
    * with an exact floor-division (the q77 pmod idiom — Spark `div`
    * truncates toward zero where DuckDB `//` floors, so the numerator is
    * made exactly divisible first); the correlation is then the q77
    * fixed-point co-moment over those integers. Day-aligned pairing is a
    * self-join on day over the tiny daily relation (broadcast at any
    * realistic series count; |pairs| = C(series,2)).
    */
  def q91ReturnCorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    val rets = dailyCandles(s, d)
      .withColumn("prev", lag($"cl", 1).over(w))
      .filter($"prev".isNotNull)
      // r = floor((cl - prev) * 10000 / prev): exact integer floor-div
      .withColumn("num", ($"cl" - $"prev") * 10000L)
      .withColumn("r", expr("(num - ((num % prev + prev) % prev)) div prev"))
      .select($"event_type", $"day_ts", $"r")
    val a = rets.select($"event_type".as("s_a"), $"day_ts", $"r".as("ra"))
    val b = rets.select($"event_type".as("s_b"), $"day_ts", $"r".as("rb"))
    val joined = a.join(broadcast(b), Seq("day_ts")).filter($"s_a" < $"s_b")
    val D = "decimal(38,0)"
    joined.groupBy($"s_a", $"s_b")
      .agg(count(lit(1)).cast(D).as("n"),
        sum($"ra".cast(D)).as("sx"), sum($"rb".cast(D)).as("sy"),
        sum(($"ra" * $"rb").cast(D)).as("sxy"),
        sum(($"ra" * $"ra").cast(D)).as("sxx"),
        sum(($"rb" * $"rb").cast(D)).as("syy"))
      .withColumn("covnum", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("varxnum", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("varynum", $"n" * $"syy" - $"sy" * $"sy")
      .withColumn("cr", expr("(covnum - ((covnum % n + n) % n)) div n"))
      .withColumn("vxr", expr("(varxnum - ((varxnum % n + n) % n)) div n"))
      .withColumn("vyr", expr("(varynum - ((varynum % n + n) % n)) div n"))
      .select($"s_a", $"s_b", $"n".cast("long").as("n"),
        ($"cr".cast("double") / sqrt($"vxr".cast("double") * $"vyr".cast("double")))
          .as("ret_corr"))
      .orderBy($"s_a", $"s_b")
  }

  val q91Sql: String =
    s"""WITH daily AS (
      |  $dailySql
      |), rets AS (
      |  SELECT event_type, day_ts, num, prev,
      |    (num - ((num % prev + prev) % prev)) // prev AS r
      |  FROM (
      |    SELECT *, (cl - LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts)) * 10000 AS num,
      |      LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts) AS prev
      |    FROM daily)
      |  WHERE prev IS NOT NULL
      |), st AS (
      |  SELECT a.event_type AS s_a, b.event_type AS s_b, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(a.r AS HUGEINT)) AS sx, SUM(CAST(b.r AS HUGEINT)) AS sy,
      |    SUM(CAST(a.r * b.r AS HUGEINT)) AS sxy,
      |    SUM(CAST(a.r * a.r AS HUGEINT)) AS sxx,
      |    SUM(CAST(b.r * b.r AS HUGEINT)) AS syy
      |  FROM rets a JOIN rets b ON a.day_ts = b.day_ts AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |), cm AS (
      |  SELECT s_a, s_b, n,
      |    n * sxy - sx * sy AS covnum,
      |    n * sxx - sx * sx AS varxnum,
      |    n * syy - sy * sy AS varynum
      |  FROM st
      |), red AS (
      |  SELECT s_a, s_b, n,
      |    CAST((covnum - ((covnum % n + n) % n)) // n AS BIGINT) AS cr,
      |    CAST((varxnum - ((varxnum % n + n) % n)) // n AS BIGINT) AS vxr,
      |    CAST((varynum - ((varynum % n + n) % n)) // n AS BIGINT) AS vyr
      |  FROM cm
      |)
      |SELECT s_a, s_b, CAST(n AS BIGINT) AS n,
      |  CAST(cr AS DOUBLE) / SQRT(CAST(vxr AS DOUBLE) * CAST(vyr AS DOUBLE)) AS ret_corr
      |FROM red
      |ORDER BY s_a, s_b""".stripMargin

  /** Robust (MAD-based) outlier detection per series: median and
    * median-absolute-deviation are order statistics (the proven q29
    * percentile↔QUANTILE_CONT parity — no summation, so no float-order
    * hazard), then one identical double op chain flags |0.6745·(x−med)/MAD|
    * > 3.5. Two partial+final aggs over the fact table plus two broadcast
    * joins of |series|-row relations — linear scan cost at any scale.
    */
  def q92MadOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val med = ev.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("ad", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(percentile($"ad", lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("rz", lit(0.6745) * ($"value" - $"med") / $"mad")
      .filter(abs($"rz") > 3.5)
      .select($"event_type", $"event_id", $"value", $"med", $"mad", $"rz")
      .orderBy($"event_type", $"event_id")
  }

  val q92Sql: String =
    """WITH med AS (
      |  SELECT event_type, QUANTILE_CONT(value, 0.5) AS med FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_type, e.event_id, e.value, m.med, ABS(e.value - m.med) AS ad
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, QUANTILE_CONT(ad, 0.5) AS mad FROM dev GROUP BY 1
      |)
      |SELECT d.event_type, d.event_id, d.value, d.med, m.mad,
      |  0.6745 * (d.value - d.med) / m.mad AS rz
      |FROM dev d JOIN mad m USING (event_type)
      |WHERE ABS(0.6745 * (d.value - d.med) / m.mad) > 3.5
      |ORDER BY d.event_type, d.event_id""".stripMargin

  /** Linear interpolation of missing hourly values (extends q68's
    * zero-fill/forward-fill with the third gap policy a series lake
    * needs). Neighbor values are order statistics (arg_max per hour,
    * last/first ignoreNulls over the grid) — raw doubles, no summation —
    * and the interpolation weight is an integer-hour ratio, so the
    * arithmetic chain is identical in both engines. Grid build and both
    * window passes share one (user) partitioning; state is O(1) per row.
    */
  def q93Interpolate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hl = events(s, d)
      .filter($"user_id" < 30)
      .select($"user_id", expr("unix_micros(ts) DIV 3600000000").as("hour"),
        $"ts", $"value")
      .groupBy($"user_id", $"hour")
      .agg(max_by($"value", $"ts").as("val"))
    val grid = hl.groupBy($"user_id")
      .agg(min($"hour").as("h0"), max($"hour").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("hour"))
    val past = Window.partitionBy($"user_id").orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy($"user_id").orderBy($"hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(hl, Seq("user_id", "hour"), "left")
      .withColumn("pv", last($"val", ignoreNulls = true).over(past))
      .withColumn("ph", last(when($"val".isNotNull, $"hour"), ignoreNulls = true).over(past))
      .withColumn("nv", first($"val", ignoreNulls = true).over(future))
      .withColumn("nh", first(when($"val".isNotNull, $"hour"), ignoreNulls = true).over(future))
      .withColumn("interp",
        when($"val".isNotNull, $"val")
          .when($"pv".isNotNull && $"nv".isNotNull,
            $"pv" + ($"nv" - $"pv") *
              (($"hour" - $"ph").cast("double") / ($"nh" - $"ph").cast("double")))
          .when($"pv".isNotNull, $"pv")
          .otherwise($"nv"))
      .select($"user_id", $"hour", $"val", $"interp", $"val".isNull.as("is_gap"))
      .orderBy($"user_id", $"hour")
  }

  val q93Sql: String =
    """WITH hl AS (
      |  SELECT user_id, EPOCH_US(ts) // 3600000000 AS hour, ARG_MAX(value, ts) AS val
      |  FROM events WHERE user_id < 30 GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, UNNEST(RANGE(MIN(hour), MAX(hour) + 1)) AS hour
      |  FROM hl GROUP BY user_id
      |), nbr AS (
      |  SELECT g.user_id, g.hour, h.val,
      |    LAST_VALUE(h.val IGNORE NULLS) OVER past AS pv,
      |    LAST_VALUE(CASE WHEN h.val IS NOT NULL THEN g.hour END IGNORE NULLS) OVER past AS ph,
      |    FIRST_VALUE(h.val IGNORE NULLS) OVER future AS nv,
      |    FIRST_VALUE(CASE WHEN h.val IS NOT NULL THEN g.hour END IGNORE NULLS) OVER future AS nh
      |  FROM grid g LEFT JOIN hl h ON h.user_id = g.user_id AND h.hour = g.hour
      |  WINDOW past AS (PARTITION BY g.user_id ORDER BY g.hour ROWS UNBOUNDED PRECEDING),
      |    future AS (PARTITION BY g.user_id ORDER BY g.hour
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, hour, val,
      |  CASE WHEN val IS NOT NULL THEN val
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |         pv + (nv - pv) * (CAST(hour - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
      |       WHEN pv IS NOT NULL THEN pv
      |       ELSE nv END AS interp,
      |  val IS NULL AS is_gap
      |FROM nbr
      |ORDER BY user_id, hour""".stripMargin

  /** Candle pattern detection (doji / hammer / bullish engulfing /
    * gap-up) over the daily series. Every predicate is an integer
    * comparison on fixed-point OHLC (×10⁴) — cross-engine determinism is
    * structural, not numeric. One window pass for the lagged prior
    * candle; pure map after that.
    */
  def q94CandlePatterns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    val fxp = dailyCandles(s, d)
      .withColumn("o", floor($"open" * 10000).cast("long"))
      .withColumn("h", floor($"high" * 10000).cast("long"))
      .withColumn("l", floor($"low" * 10000).cast("long"))
      .withColumn("c", $"cl")
    val body = abs($"c" - $"o")
    val lower = least($"o", $"c") - $"l"
    val upper = $"h" - greatest($"o", $"c")
    fxp
      .withColumn("po", lag($"o", 1).over(w))
      .withColumn("pc", lag($"c", 1).over(w))
      .withColumn("ph", lag($"h", 1).over(w))
      .withColumn("doji", body * 10 <= $"h" - $"l")
      .withColumn("hammer", lower >= body * 2 && upper <= body)
      .withColumn("bull_engulf",
        $"po" > $"pc" && $"c" > $"o" && $"o" <= $"pc" && $"c" >= $"po")
      .withColumn("gap_up", $"l" > $"ph")
      .filter($"doji" || $"hammer" ||
        coalesce($"bull_engulf", lit(false)) || coalesce($"gap_up", lit(false)))
      .select($"event_type", date_format($"day_ts", "yyyy-MM-dd").as("day"),
        $"open", $"high", $"low", $"close",
        $"doji", $"hammer",
        coalesce($"bull_engulf", lit(false)).as("bull_engulf"),
        coalesce($"gap_up", lit(false)).as("gap_up"))
      .orderBy($"event_type", $"day")
  }

  val q94Sql: String =
    s"""WITH daily AS (
      |  $dailySql
      |), fxp AS (
      |  SELECT *, CAST(FLOOR(open * 10000) AS BIGINT) AS o,
      |    CAST(FLOOR(high * 10000) AS BIGINT) AS h,
      |    CAST(FLOOR(low * 10000) AS BIGINT) AS l,
      |    cl AS c
      |  FROM daily
      |), lagged AS (
      |  SELECT *, LAG(o, 1) OVER w AS po, LAG(c, 1) OVER w AS pc, LAG(h, 1) OVER w AS ph
      |  FROM fxp WINDOW w AS (PARTITION BY event_type ORDER BY day_ts)
      |), flags AS (
      |  SELECT *,
      |    ABS(c - o) * 10 <= h - l AS doji,
      |    LEAST(o, c) - l >= ABS(c - o) * 2 AND h - GREATEST(o, c) <= ABS(c - o) AS hammer,
      |    COALESCE(po > pc AND c > o AND o <= pc AND c >= po, FALSE) AS bull_engulf,
      |    COALESCE(l > ph, FALSE) AS gap_up
      |  FROM lagged
      |)
      |SELECT event_type, STRFTIME(day_ts, '%Y-%m-%d') AS day,
      |  open, high, low, close, doji, hammer, bull_engulf, gap_up
      |FROM flags
      |WHERE doji OR hammer OR bull_engulf OR gap_up
      |ORDER BY event_type, day""".stripMargin

  /** Cross-series spread monitor — the quant flagship: resample two
    * series to hourly closes (one scan, one agg), pair them on the hour,
    * robust-z the spread with q92's MAD machinery (order statistics +
    * one fixed double chain), flag |z| > 3. The paired relation and both
    * stat relations are series-sized; the corpus is scanned once.
    */
  def q95SpreadMonitor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // no self-join: both series pair in ONE aggregate via conditional
    // arg-max (max_by ignores rows whose ordering expr is null), so the
    // corpus is scanned and shuffled exactly once — per-series filters
    // would otherwise push into two canonically-different scans and
    // defeat exchange reuse
    val sp = events(s, d)
      .filter($"event_type".isin("click", "view"))
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hour"))
      .agg(
        max_by(when($"event_type" === "click", $"value"),
          when($"event_type" === "click", $"ts")).as("ca"),
        max_by(when($"event_type" === "view", $"value"),
          when($"event_type" === "view", $"ts")).as("cb"))
      .filter($"ca".isNotNull && $"cb".isNotNull)
      .withColumn("spread", $"ca" - $"cb")
    val med = sp.agg(percentile($"spread", lit(0.5)).as("med"))
    val dev = sp.crossJoin(broadcast(med)).withColumn("ad", abs($"spread" - $"med"))
    val mad = dev.agg(percentile($"ad", lit(0.5)).as("mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("rz", lit(0.6745) * ($"spread" - $"med") / $"mad")
      .filter(abs($"rz") > 3.0)
      .select($"hour", $"ca", $"cb", $"spread", $"rz")
      .orderBy($"hour")
  }

  val q95Sql: String =
    """WITH hc AS (
      |  SELECT EPOCH_US(ts) // 3600000000 AS hour,
      |    ARG_MAX(value, ts) FILTER (event_type = 'click') AS ca,
      |    ARG_MAX(value, ts) FILTER (event_type = 'view') AS cb
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
      |), sp AS (
      |  SELECT hour, ca, cb, ca - cb AS spread
      |  FROM hc WHERE ca IS NOT NULL AND cb IS NOT NULL
      |), st AS (SELECT QUANTILE_CONT(spread, 0.5) AS med FROM sp),
      |dev AS (SELECT sp.*, st.med, ABS(spread - med) AS ad FROM sp, st),
      |m2 AS (SELECT QUANTILE_CONT(ad, 0.5) AS mad FROM dev)
      |SELECT hour, ca, cb, spread, 0.6745 * (spread - med) / mad AS rz
      |FROM dev, m2
      |WHERE ABS(0.6745 * (spread - med) / mad) > 3.0
      |ORDER BY hour""".stripMargin

  /** q109 — exponentially weighted moving average with DYADIC weights:
    * the classic EWMA recursion s_t = α·x_t + (1−α)·s_{t−1} is not
    * hash-reproducible across engines (each step compounds a float
    * rounding), so the weights are fixed at α = 1/2 and the window
    * truncated to K = 8 lags — weight 2^(K−1−k) for lag k, all integer.
    * Truncation error is ≤ 2^−8 of the oldest mass, below the 1e−4
    * close quantization anyway. Numerator/denominator stay exact longs
    * (Σ 2^j·cl ≤ 255·10⁹ ≪ 2⁶³); the reported double is ONE division of
    * exactly-representable integers, identical in both engines. The
    * adaptive denominator (missing lags at a series head drop their
    * weight) reproduces pandas' `ewm(adjust=True)` semantics.
    *
    * Scale shape: one window pass over the daily relation, ROWS-bounded
    * frame (8 lags) so state per series is O(K); the q22-style resample
    * agg upstream dominates and is partial+final.
    */
  def q109Ewma(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    val K = 8
    val lags = (0 until K).map(k =>
      (lag($"cl", k).over(w) * (1L << (K - 1 - k))).as(s"t$k"))
    val wts = (0 until K).map(k =>
      when(lag($"cl", k).over(w).isNotNull, 1L << (K - 1 - k))
        .otherwise(0L).as(s"w$k"))
    dailyCandles(s, d)
      .select(Seq($"event_type", $"day_ts", $"cl") ++ lags ++ wts: _*)
      .withColumn("num", (0 until K).map(k => coalesce(col(s"t$k"), lit(0L))).reduce(_ + _))
      .withColumn("den", (0 until K).map(k => col(s"w$k")).reduce(_ + _))
      .select($"event_type", date_format($"day_ts", "yyyy-MM-dd").as("day"),
        $"cl", $"num", $"den",
        ($"num".cast("double") / $"den" / 10000.0).as("ewma"))
      .orderBy($"event_type", $"day")
  }

  val q109Sql: String = {
    val K = 8
    val lagCols = (0 until K).map(k =>
      s"LAG(cl, $k) OVER (PARTITION BY event_type ORDER BY day_ts) AS l$k").mkString(",\n      |    ")
    val num = (0 until K).map(k => s"COALESCE(l$k, 0) * ${1L << (K - 1 - k)}").mkString(" + ")
    val den = (0 until K).map(k =>
      s"CASE WHEN l$k IS NOT NULL THEN ${1L << (K - 1 - k)} ELSE 0 END").mkString(" + ")
    s"""WITH daily AS (
      |  $dailySql
      |), lagged AS (
      |  SELECT event_type, day_ts, cl,
      |    $lagCols
      |  FROM daily
      |)
      |SELECT event_type, STRFTIME(day_ts, '%Y-%m-%d') AS day, cl,
      |  CAST($num AS BIGINT) AS num,
      |  CAST($den AS BIGINT) AS den,
      |  CAST($num AS DOUBLE) / ($den) / 10000.0 AS ewma
      |FROM lagged ORDER BY event_type, day""".stripMargin
  }

  /** q110 — lag-1 autocorrelation of daily returns per series (momentum
    * vs mean-reversion diagnostic). Returns are q91's exact basis-point
    * floor-division integers; the pairing is a LAG window (no join —
    * the series is already sorted for the return lag), and the
    * correlation is the q77/q91 fixed-point co-moment: every sum
    * DECIMAL(38,0)/HUGEINT-exact, reduced by exact floor-division
    * before ONE identical IEEE chain. One shuffle per series total.
    */
  def q110Autocorr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    val D = "decimal(38,0)"
    dailyCandles(s, d)
      .withColumn("prev", lag($"cl", 1).over(w))
      .filter($"prev".isNotNull)
      .withColumn("num", ($"cl" - $"prev") * 10000L)
      .withColumn("r", expr("(num - ((num % prev + prev) % prev)) div prev"))
      .withColumn("rp", lag($"r", 1).over(w))
      .filter($"rp".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).cast(D).as("n"),
        sum($"r".cast(D)).as("sx"), sum($"rp".cast(D)).as("sy"),
        sum(($"r" * $"rp").cast(D)).as("sxy"),
        sum(($"r" * $"r").cast(D)).as("sxx"),
        sum(($"rp" * $"rp").cast(D)).as("syy"))
      .withColumn("covnum", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("varxnum", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("varynum", $"n" * $"syy" - $"sy" * $"sy")
      .withColumn("cr", expr("(covnum - ((covnum % n + n) % n)) div n"))
      .withColumn("vxr", expr("(varxnum - ((varxnum % n + n) % n)) div n"))
      .withColumn("vyr", expr("(varynum - ((varynum % n + n) % n)) div n"))
      .select($"event_type", $"n".cast("long").as("n_pairs"),
        ($"cr".cast("double") / sqrt($"vxr".cast("double") * $"vyr".cast("double")))
          .as("autocorr_lag1"))
      .orderBy($"event_type")
  }

  val q110Sql: String =
    s"""WITH daily AS (
      |  $dailySql
      |), rets AS (
      |  SELECT event_type, day_ts,
      |    (num - ((num % prev + prev) % prev)) // prev AS r
      |  FROM (
      |    SELECT *, (cl - LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts)) * 10000 AS num,
      |      LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts) AS prev
      |    FROM daily)
      |  WHERE prev IS NOT NULL
      |), paired AS (
      |  SELECT event_type, r,
      |    LAG(r, 1) OVER (PARTITION BY event_type ORDER BY day_ts) AS rp
      |  FROM rets
      |), st AS (
      |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(r AS HUGEINT)) AS sx, SUM(CAST(rp AS HUGEINT)) AS sy,
      |    SUM(CAST(r * rp AS HUGEINT)) AS sxy,
      |    SUM(CAST(r * r AS HUGEINT)) AS sxx,
      |    SUM(CAST(rp * rp AS HUGEINT)) AS syy
      |  FROM paired WHERE rp IS NOT NULL GROUP BY event_type
      |), cm AS (
      |  SELECT event_type, n,
      |    n * sxy - sx * sy AS covnum,
      |    n * sxx - sx * sx AS varxnum,
      |    n * syy - sy * sy AS varynum
      |  FROM st
      |), red AS (
      |  SELECT event_type, n,
      |    CAST((covnum - ((covnum % n + n) % n)) // n AS BIGINT) AS cr,
      |    CAST((varxnum - ((varxnum % n + n) % n)) // n AS BIGINT) AS vxr,
      |    CAST((varynum - ((varynum % n + n) % n)) // n AS BIGINT) AS vyr
      |  FROM cm
      |)
      |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
      |  CAST(cr AS DOUBLE) / SQRT(CAST(vxr AS DOUBLE) * CAST(vyr AS DOUBLE)) AS autocorr_lag1
      |FROM red ORDER BY event_type""".stripMargin

  /** q159 — rolling-origin forecast BACKTEST: per daily series, the
    * exact mean absolute error of the lag-1 naive forecast vs the lag-7
    * seasonal-naive forecast, evaluated only where BOTH have history —
    * the model-selection primitive every monitoring/forecasting layer
    * runs before trusting a seasonal model (M-competition baselines:
    * beat seasonal-naive or go home). `seasonal_wins` is the decision
    * bit. MAE stays in exact cl units (floor(close·10⁴) longs —
    * dailyCandles' quantization): sums of |Δ| are exact int64, the
    * per-series MAE is integral `div` — no float anywhere, so the
    * comparison bit is engine-exact even when the two MAEs differ by
    * one quantum.
    *
    * Scale shape: the resample agg upstream is partial+final
    * (map-side combine on (event_type, day)); the two lags ride ONE
    * series-partitioned window pass (O(1) state rows per series, no
    * global window); the backtest rollup is a |series|-row agg.
    */
  def q159ForecastBacktest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"day_ts")
    dailyCandles(s, d)
      .select($"event_type", $"day_ts", $"cl",
        lag($"cl", 1).over(w).as("naive"),
        lag($"cl", 7).over(w).as("seasonal"))
      .filter($"naive".isNotNull && $"seasonal".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs($"cl" - $"naive")).as("naive_abs_err"),
        sum(abs($"cl" - $"seasonal")).as("seasonal_abs_err"))
      .withColumn("naive_mae_cl", expr("naive_abs_err div n_eval"))
      .withColumn("seasonal_mae_cl", expr("seasonal_abs_err div n_eval"))
      .withColumn("seasonal_wins", $"seasonal_abs_err" < $"naive_abs_err")
      .orderBy($"event_type")
  }

  val q159Sql: String =
    s"""WITH daily AS (
       |  $dailySql
       |), lagged AS (
       |  SELECT event_type, cl,
       |    LAG(cl, 1) OVER (PARTITION BY event_type ORDER BY day_ts) AS naive,
       |    LAG(cl, 7) OVER (PARTITION BY event_type ORDER BY day_ts) AS seasonal
       |  FROM daily
       |), ev AS (
       |  SELECT event_type,
       |    CAST(COUNT(*) AS BIGINT) AS n_eval,
       |    CAST(SUM(ABS(cl - naive)) AS BIGINT) AS naive_abs_err,
       |    CAST(SUM(ABS(cl - seasonal)) AS BIGINT) AS seasonal_abs_err
       |  FROM lagged WHERE naive IS NOT NULL AND seasonal IS NOT NULL
       |  GROUP BY event_type
       |)
       |SELECT event_type, n_eval, naive_abs_err, seasonal_abs_err,
       |  naive_abs_err // n_eval AS naive_mae_cl,
       |  seasonal_abs_err // n_eval AS seasonal_mae_cl,
       |  seasonal_abs_err < naive_abs_err AS seasonal_wins
       |FROM ev ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_forecast_backtest" -> (q159ForecastBacktest _),
    "q90_indicators" -> (q90Indicators _),
    "q91_return_corr" -> (q91ReturnCorr _),
    "q92_mad_outliers" -> (q92MadOutliers _),
    "q93_interpolate" -> (q93Interpolate _),
    "q94_candle_patterns" -> (q94CandlePatterns _),
    "q95_spread_monitor" -> (q95SpreadMonitor _),
    "q109_ewma" -> (q109Ewma _),
    "q110_autocorr" -> (q110Autocorr _),
  )

  val oracles: Map[String, String] = Map(
    "q159_forecast_backtest" -> q159Sql,
    "q90_indicators" -> q90Sql,
    "q91_return_corr" -> q91Sql,
    "q92_mad_outliers" -> q92Sql,
    "q93_interpolate" -> q93Sql,
    "q94_candle_patterns" -> q94Sql,
    "q95_spread_monitor" -> q95Sql,
    "q109_ewma" -> q109Sql,
    "q110_autocorr" -> q110Sql,
  )
}
