package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Event-sequence / time-series analytics over `events` — the behavioral
  * queries a training-data pipeline runs over interaction logs to select,
  * weight, and sanity-check data (funnel progress, activity gap filling,
  * hopping-window rates, statistical outlier flags).
  *
  * Scale posture (100 TB): every query shuffles on `user_id` or
  * `event_type`-sized keys exactly once, window frames are the streaming
  * kinds (`ROWS UNBOUNDED PRECEDING` running aggregates — Spark evaluates
  * them incrementally, no per-partition buffering), and the only
  * row-expanding operators (`sequence` explode, sliding-window Expand)
  * grow output proportionally to the data, never quadratically.
  *
  * Cross-engine determinism: all timestamp comparisons in integer µs
  * (`unix_micros` / `EPOCH_US` — see q60's note on the ns→µs read gap),
  * all derived metrics integer-exact (counts, fixed-point decimal), ties
  * ordered by `event_id`.
  */
object SeqOps {

  /** Funnel-stage analysis: how far each user progressed through the
    * ordered view → click → purchase sequence (a click only counts after
    * a view, a purchase only after such a click). Implemented as three
    * stacked running-max window flags over ONE (user, time) sort — flag
    * k at a row is "stage k completed at or before this row", so
    * `max(case type=X and flag_{k-1}=1)` composes the ordering constraint
    * without self-joins. Spark plans the three Window operators over a
    * single Exchange+Sort (identical partitioning/ordering), so the whole
    * funnel costs one shuffle of the events table — the MATCH_RECOGNIZE
    * shape (Flink CEP / Trino pattern recognition) for this query, with
    * running flags instead of an NFA.
    */
  def q67FunnelStages(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
    e.withColumn("f1", max(when($"event_type" === "view", 1).otherwise(0)).over(w))
      .withColumn("f2", max(when($"event_type" === "click" && $"f1" === 1, 1).otherwise(0)).over(w))
      .withColumn("f3", max(when($"event_type" === "purchase" && $"f2" === 1, 1).otherwise(0)).over(w))
      .groupBy($"user_id")
      .agg(max($"f1").cast("long").as("reached_view"),
        max($"f2").cast("long").as("reached_click"),
        max($"f3").cast("long").as("reached_purchase"))
      .withColumn("funnel_stage",
        $"reached_view" + $"reached_click" + $"reached_purchase")
      .orderBy($"user_id")
  }

  val q67Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, EPOCH_US(ts) AS ts_us, event_type FROM events
      |), s1 AS (
      |  SELECT *, MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |          ROWS UNBOUNDED PRECEDING) AS f1 FROM e
      |), s2 AS (
      |  SELECT *, MAX(CASE WHEN event_type = 'click' AND f1 = 1 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |          ROWS UNBOUNDED PRECEDING) AS f2 FROM s1
      |), s3 AS (
      |  SELECT *, MAX(CASE WHEN event_type = 'purchase' AND f2 = 1 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |          ROWS UNBOUNDED PRECEDING) AS f3 FROM s2
      |)
      |SELECT user_id,
      |  CAST(MAX(f1) AS BIGINT) AS reached_view,
      |  CAST(MAX(f2) AS BIGINT) AS reached_click,
      |  CAST(MAX(f3) AS BIGINT) AS reached_purchase,
      |  CAST(MAX(f1) + MAX(f2) + MAX(f3) AS BIGINT) AS funnel_stage
      |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Time-series gap fill: per-user hourly activity counts with every
    * missing hour between that user's first and last active hour
    * materialized as an explicit zero row, plus a forward-filled
    * last-active-hour count (`last(..., ignoreNulls)` running window —
    * the standard observation-carried-forward repair before resampling
    * or feature extraction). The hour grid is generated DISTRIBUTED —
    * `sequence(h0, h1)` + explode per user, never a driver-side range —
    * so the fill parallelizes with the user count. Restricted to
    * user_id < 30 to bound the verify dump; the plan is
    * cardinality-independent.
    */
  def q68GapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cnt = events(s, d)
      .filter($"user_id" < 30)
      .select($"user_id", expr("unix_micros(ts) DIV 3600000000").as("hour"))
      .groupBy($"user_id", $"hour").agg(count(lit(1)).as("n"))
    // Catalyst merges this agg-over-agg into ONE aggregate straight off
    // the scan (min/max distribute over the inner grouping), so this
    // branch shuffles per-user rows, not per-(user, hour) rows — no
    // exchange to reuse with the join side, and cheaper than
    // materializing `cnt` twice would be
    val grid = cnt.groupBy($"user_id")
      .agg(min($"hour").as("h0"), max($"hour").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("hour"))
    val w = Window.partitionBy($"user_id").orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cnt, Seq("user_id", "hour"), "left")
      .select($"user_id", $"hour", coalesce($"n", lit(0L)).as("n"))
      .withColumn("carry_n",
        last(when($"n" > 0, $"n"), ignoreNulls = true).over(w))
      .orderBy($"user_id", $"hour")
  }

  val q68Sql: String =
    """WITH cnt AS (
      |  SELECT user_id, EPOCH_US(ts) // 3600000000 AS hour, COUNT(*) AS n
      |  FROM events WHERE user_id < 30 GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, UNNEST(RANGE(MIN(hour), MAX(hour) + 1)) AS hour
      |  FROM cnt GROUP BY user_id
      |)
      |SELECT g.user_id, g.hour, COALESCE(c.n, 0) AS n,
      |  LAST_VALUE(CASE WHEN c.n > 0 THEN c.n END IGNORE NULLS)
      |    OVER (PARTITION BY g.user_id ORDER BY g.hour
      |          ROWS UNBOUNDED PRECEDING) AS carry_n
      |FROM grid g LEFT JOIN cnt c ON c.user_id = g.user_id AND c.hour = g.hour
      |ORDER BY g.user_id, g.hour""".stripMargin

  /** Hopping (sliding) window aggregation: event counts per type over
    * 1-hour windows sliding every 15 minutes — the overlap-window rate
    * monitor that tumbling q22/q71-style buckets can't express. Spark's
    * `window(ts, "1 hour", "15 minutes")` plans an Expand (each event
    * replicated into its ⌈1h/15m⌉ = 4 covering windows) feeding a normal
    * partial+final hash aggregate: output scales with (windows × types),
    * input expansion is the fixed 4×, and there is exactly one shuffle.
    * The oracle reproduces Spark's epoch-aligned window assignment in
    * closed form: the k-th preceding 15-minute bucket start for
    * k ∈ [0, 4).
    */
  def q69HoppingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"w.start").as("win_start_us"), $"event_type", $"n")
      .orderBy($"win_start_us", $"event_type")
  }

  val q69Sql: String =
    """SELECT win_start_us, event_type, COUNT(*) AS n FROM (
      |  SELECT ((EPOCH_US(ts) // 900000000) - t.k) * 900000000 AS win_start_us,
      |         event_type
      |  FROM events, RANGE(0, 4) t(k))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Statistical outlier flags: events whose value deviates from their
    * type's mean by more than two standard deviations — the z-score
    * filter quality pipelines run before aggregating noisy measurements.
    * Exactness across engines: values are fixed-pointed to integer µ-units
    * (`floor(value·10⁶)` — one identical IEEE op chain), and the
    * criterion |v−μ| > 2σ is evaluated in cleared-denominator integer
    * form, (v·n − s)² > 4·(n·ss − s²), over exact wide-integer sums
    * (DECIMAL(38,0) here, HUGEINT in the oracle) — no float mean, no
    * float sqrt, no aggregation-order sensitivity. Magnitude envelope:
    * values ≤ 10³ and n ≤ 10⁸ keep every intermediate under 10³⁸.
    * Plan: one 5-row stats aggregate broadcast back over the scan.
    */
  def q70ZscoreOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"event_id", $"event_type",
      floor($"value" * 1000000d).cast("decimal(38,0)").as("v"))
    val st = e.groupBy($"event_type")
      .agg(sum($"v").as("s"), sum($"v" * $"v").as("ss"),
        count(lit(1)).cast("decimal(38,0)").as("n"))
    e.join(broadcast(st), Seq("event_type"))
      .filter(($"v" * $"n" - $"s") * ($"v" * $"n" - $"s") >
        lit(4) * ($"n" * $"ss" - $"s" * $"s"))
      .select($"event_id", $"event_type", $"v".cast("long").as("v_fxp"))
      .orderBy($"event_id")
  }

  val q70Sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(FLOOR(value * 1000000) AS HUGEINT) AS v FROM events
      |), st AS (
      |  SELECT event_type, SUM(v) AS s, SUM(v * v) AS ss,
      |         CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM e GROUP BY event_type
      |)
      |SELECT event_id, e.event_type, CAST(v AS BIGINT) AS v_fxp
      |FROM e JOIN st USING (event_type)
      |WHERE (v * n - s) * (v * n - s) > 4 * (n * ss - s * s)
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_funnel_stages" -> (q67FunnelStages _),
    "q68_gap_fill" -> (q68GapFill _),
    "q69_hopping_window" -> (q69HoppingWindow _),
    "q70_zscore_outliers" -> (q70ZscoreOutliers _),
  )

  val oracles: Map[String, String] = Map(
    "q67_funnel_stages" -> q67Sql,
    "q68_gap_fill" -> q68Sql,
    "q69_hopping_window" -> q69Sql,
    "q70_zscore_outliers" -> q70Sql,
  )
}
