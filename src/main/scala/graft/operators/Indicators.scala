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
        max_by($"value", $"ts").as("close"),
        max($"value").as("high"),
        min($"value").as("low"),
        count(lit(1)).as("n_trades"))
      .withColumn("cl", floor($"close" * 10000).cast("long"))
  }

  private val dailySql =
    """SELECT event_type, DATE_TRUNC('day', ts) AS day_ts,
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_indicators" -> (q90Indicators _),
    "q91_return_corr" -> (q91ReturnCorr _),
    "q92_mad_outliers" -> (q92MadOutliers _),
  )

  val oracles: Map[String, String] = Map(
    "q90_indicators" -> q90Sql,
    "q91_return_corr" -> q91Sql,
    "q92_mad_outliers" -> q92Sql,
  )
}
