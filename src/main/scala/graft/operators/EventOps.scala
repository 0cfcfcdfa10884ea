package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.dsum
import graft.sources.Tables._

/** Event-stream operator surface over the `events` table: the reference's
  * streaming/merge semantics (SURVEY.md §2.2 K2, §2.8, §2.9) re-expressed
  * as deterministic batch queries — keyed keep-last dedup, gap detection
  * via lag, OHLC resampling (candle aggregation), as-of join, JSON
  * extraction (F11), and the reference's derive-date partition key (P3).
  */
object EventOps {

  /** K2 merge semantic: keep the last event per (user_id, event_type) key,
    * ordered by (ts, event_id). This is exactly the sink dedup of
    * crypto_collector.py:548–553 with a deterministic tie-break.
    */
  def q20KeepLastDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    KeepLast.dedup(events(s, d), Seq($"user_id", $"event_type"), Seq($"ts", $"event_id"))
      .select($"user_id", $"event_type", $"event_id", unix_micros($"ts").as("ts_us"), $"value")
      .orderBy($"user_id", $"event_type")
  }

  val q20Sql: String =
    """SELECT user_id, event_type, event_id, EPOCH_US(ts) AS ts_us, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Gap detection via lag (§2.8): inter-event gaps over 30 minutes per
    * user — the natural QA query over a candle series.
    */
  def q21GapDetect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, d)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("gap_us", unix_micros($"ts") - $"prev_us")
      .filter($"gap_us" > 30L * 60 * 1000000)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"), $"gap_us")
      .orderBy($"user_id", $"event_id")
  }

  val q21Sql: String =
    """SELECT user_id, event_id, EPOCH_US(ts) AS ts_us, gap_us FROM (
      |  SELECT user_id, event_id, ts,
      |    EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |WHERE gap_us > 30 * 60 * 1000000
      |ORDER BY user_id, event_id""".stripMargin

  /** OHLC resampling (SURVEY §2.5 note): tumbling 1-day windows per
    * event_type — first/max/min/last/sum over `value`, i.e. the candle
    * aggregation the reference re-fetches from APIs instead of computing.
    * open/close use min_by/max_by ordered by ts (unique per table): exact
    * first/last in one shuffle, no window sort.
    */
  def q22ResampleOhlc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"), $"event_type")
      .agg(
        min_by($"value", $"ts").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"ts").as("close"),
        dsum($"value").as("volume"),
        count(lit(1)).as("n"))
      .orderBy($"day", $"event_type")
  }

  val q22Sql: String =
    """SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day, event_type,
      |  ARG_MIN(value, ts) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  ARG_MAX(value, ts) AS close,
      |  CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS volume,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** As-of join (§2.4): each purchase event picks up the most recent
    * click at-or-before it by the same user. Oracle: DuckDB native ASOF.
    */
  def q23AsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // both sides are filters of the same events table → the single-scan
    // self variant: one projection tags each row purchase/click, no
    // two-branch union re-reading the source.
    // day buckets: events span ~30 days, so the union sort runs over
    // users × days partitions instead of users alone (and stays correct
    // however few distinct keys the corpus has — see AsOfJoin.joinBucketed)
    val e = events(s, d)
      .filter($"event_type".isin("purchase", "click"))
      .select($"event_id", $"user_id", $"ts", $"value", $"event_type",
        $"event_id".as("c_event_id"), $"value".as("c_value"))
    AsOfJoin.joinBucketedSelf(e, isLeft = $"event_type" === "purchase",
        key = "user_id", time = "ts",
        leftCols = Seq("event_id", "user_id", "ts", "value"),
        payload = Seq("c_event_id", "c_value"), tieBreak = "c_event_id",
        widthSeconds = 86400L)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value",
        $"asof_c_event_id".as("click_event_id"), $"asof_c_value".as("click_value"))
      .orderBy($"event_id")
  }

  // DuckDB ASOF JOIN matches t_r <= t_l (latest such row). Equal-timestamp
  // ties on the right cannot occur here (event ts are unique per table).
  val q23Sql: String =
    """SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS ts_us, p.value,
      |  c.event_id AS click_event_id, c.value AS click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** JSON extraction (F11): pull `k` out of the props JSON payload —
    * the reference's response-payload decode re-expressed.
    */
  def q24JsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        dsum($"k".cast("double")).as("sum_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q24Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(FLOOR(SUM(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The reference's sink pipeline end-to-end (E3 lifecycle): derive the
    * yyyyMMdd partition key (P3), keyed keep-last dedup within each
    * (date, event_type) "partition file" (K2), then count rows routed to
    * each partition (A1/A3) — crypto_collector.py:523–558 over testdata.
    */
  def q25SinkMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withDate = events(s, d)
      .withColumn("date", date_format($"ts", "yyyyMMdd"))
    KeepLast.dedup(withDate, Seq($"date", $"event_type", $"user_id"), Seq($"ts", $"event_id"))
      .groupBy($"date", $"event_type")
      .agg(count(lit(1)).as("n_rows"), dsum($"value").as("sum_value"))
      .orderBy($"date", $"event_type")
  }

  val q25Sql: String =
    """SELECT date, event_type, COUNT(*) AS n_rows,
      |  CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_value
      |FROM (
      |  SELECT STRFTIME(ts, '%Y%m%d') AS date, event_type, user_id, ts, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY STRFTIME(ts, '%Y%m%d'), event_type, user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |GROUP BY date, event_type
      |ORDER BY date, event_type""".stripMargin

  /** Bucketed RANGE JOIN: per purchase, the same-user clicks in the
    * preceding hour. The declarative inequality join (`c_ts ∈
    * [p_ts − 1h, p_ts)`) would plan as an equi-join on user alone with a
    * residual range filter — correct, but every user's whole history
    * co-locates in one task and a hot user degenerates to O(n·m) pair
    * scans in that task. The scale shape bounds the candidates
    * structurally: coarse hour buckets become part of the JOIN KEY — a
    * 1-hour probe window overlaps at most 2 buckets, so the probe side
    * explodes to exactly 2 (user, bucket) keys and the build side keys
    * on its own bucket; the exact range predicate remains as the
    * residual. Candidates per probe row shrink from |user's history| to
    * |user's two hours|; each click lands in exactly one bucket, so the
    * per-bucket partial counts add back losslessly (every probe row
    * appears in both bucket groups — once with real matches, once
    * possibly empty — and the LEFT join + count(non-null) keeps
    * zero-click purchases). Same two-level key idea as
    * [[AsOfJoin.joinBucketed]], applied to a windowed aggregation.
    */
  def q60RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        floor($"ts".cast("long") / 3600).cast("long").as("__bp"))
      .withColumn("__b", explode(array($"__bp" - 1, $"__bp")))
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"value".as("c_value"),
        floor($"ts".cast("long") / 3600).cast("long").as("__b"))
    purchases
      // range predicate in integer µs on BOTH engines: Spark's events
      // table is µs-truncated (nanosAsLong read) while DuckDB reads the
      // parquet at full ns — a raw timestamp comparison could disagree
      // for a click within 1 µs of the exact boundary
      .join(clicks,
        $"user_id" === $"c_user" && purchases("__b") === clicks("__b") &&
          unix_micros($"c_ts") >= unix_micros($"ts") - lit(3600000000L) &&
          unix_micros($"c_ts") < unix_micros($"ts"),
        "left")
      .groupBy($"event_id", $"user_id", $"ts")
      .agg(count($"c_ts").cast("long").as("n_clicks"),
        max($"c_value").as("max_click_value"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"n_clicks", $"max_click_value")
      .orderBy($"event_id")
  }

  val q60Sql: String =
    """SELECT p.event_id, p.user_id, EPOCH_US(p.ts) AS ts_us,
      |  COUNT(c.ts) AS n_clicks, MAX(c.value) AS max_click_value
      |FROM events p LEFT JOIN events c
      |  ON c.user_id = p.user_id AND c.event_type = 'click'
      |  AND EPOCH_US(c.ts) >= EPOCH_US(p.ts) - 3600000000
      |  AND EPOCH_US(c.ts) < EPOCH_US(p.ts)
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id, p.user_id, p.ts
      |ORDER BY p.event_id""".stripMargin

  /** RANGE-frame window (§2.8's remaining frame kind — q19's running
    * total is a ROWS frame): per event, count and max over the same
    * user's trailing hour, frame bounds in VALUE space (integer µs) so
    * both engines treat ties as peers identically. Partitioned by
    * user_id — high cardinality, so unlike a status-keyed window this
    * parallelizes with the data; a single hot user would get the q60
    * bucket treatment instead.
    */
  def q61RangeWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        count(lit(1)).over(w).cast("long").as("n_1h"),
        max($"value").over(w).as("max_1h"))
      .orderBy($"event_id")
  }

  val q61Sql: String =
    """SELECT event_id, user_id, EPOCH_US(ts) AS ts_us,
      |  COUNT(*) OVER w AS n_1h, MAX(value) OVER w AS max_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Bounded ROWS-frame moving window — the frame kind that completes
    * §2.8 next to q19's unbounded running total and q61's value-space
    * RANGE frame: per user, the trailing-4-rows moving sum/count of
    * `value` (the smoothing primitive behind moving averages). Exactness:
    * values fixed-pointed to integer µ-units before the window sum, so
    * the ≤4-term reduction is order-independent and engine-exact; the
    * ordering carries `event_id` as a total tie-break (a timestamp tie
    * would otherwise make frame CONTENTS nondeterministic — bounded
    * frames are sensitive to peer order, unlike q19's
    * unbounded-preceding sum where peers commute). Spark evaluates the
    * sliding frame incrementally per partition — no buffering beyond
    * the 4-row frame.
    */
  def q75MovingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts"), $"event_id").rowsBetween(-3, 0)
    events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        sum(floor($"value" * 1000000d)).over(w).as("mov_sum_fxp"),
        count(lit(1)).over(w).cast("long").as("mov_n"))
      .orderBy($"event_id")
  }

  val q75Sql: String =
    """SELECT event_id, user_id, EPOCH_US(ts) AS ts_us,
      |  CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_fxp,
      |  COUNT(*) OVER w AS mov_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q169 — stream-stream interval join, batch-oracle replayed (the
    * q160/q167 discipline applied to the join state machine): the
    * events table is delivered as TWO independent file-source STREAMS
    * (clicks and purchases), joined per user on an event-time range
    * (purchase within 6 h after the click) through the REAL
    * Structured Streaming stream-stream inner join
    * ([[graft.streaming.StreamJoin.clickToPurchase]]: watermarks both
    * sides, keyed join state, range residual), run to completion with
    * AvailableNow into a parquet sink and read back. Nothing in the
    * replay is late beyond the watermark, so the streaming result must
    * hash-equal the batch interval join the oracle computes — the same
    * equivalence theorem the engine's other replay rows pin; the
    * late-data divergence (state eviction, behind-watermark drops) is
    * deliberately exercised in StreamJoinSpec instead, where it is the
    * SPEC, not a bug.
    *
    * Scale: both streams shuffle once on user_id into the keyed state
    * store; per-key state is bounded by rate × (lag + watermark), never
    * stream length. lag_sec is exact integer µs math on both engines.
    */
  def q169StreamJoinReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rawSchema = table(s, d, "events").schema
    def side(tpe: String): DataFrame = {
      // the file stream source wants a directory; glob-filter the one table
      val raw = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val tsd = if (rawSchema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
      tsd.filter($"event_type" === tpe && $"user_id".isNotNull &&
          $"event_id".isNotNull && $"ts".isNotNull)
        .select($"user_id", $"event_id", $"ts")
    }
    val joined = graft.streaming.StreamJoin.clickToPurchase(
      side("click"), side("purchase"))
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val base = s"$wh/graft_sjoin_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, base)
    // 8 state partitions (not the relational 32): a stream-stream join
    // materializes FOUR store instances per partition, and this replay's
    // keyspace (1.5 k users) doesn't need 32-way state parallelism —
    // store open/commit overhead dominated the micro-batch at 32. The
    // no-data finalize batch is skipped: an INNER join emits every match
    // in the data batch itself; the extra batch only advances the
    // watermark to evict state we are about to discard anyway.
    graft.streaming.StreamJoin.withConfs(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      val q = joined.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", s"$base/out")
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$base/out")
      .orderBy($"user_id", $"click_id", $"purchase_id")
  }

  /** The batch interval join the streaming replay must reproduce. */
  val q169Sql: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |       (EPOCH_US(p.ts) - EPOCH_US(c.ts)) // 1000000 AS lag_sec
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
      |WHERE c.user_id IS NOT NULL AND c.event_id IS NOT NULL AND c.ts IS NOT NULL
      |  AND p.event_id IS NOT NULL AND p.ts IS NOT NULL
      |ORDER BY 1, 2, 3""".stripMargin

  /** q172 — NATIVE streaming session windows, batch-oracle replayed:
    * q18 sessionizes with a batch window chain; this runs the same
    * 30-minute-gap sessions through Structured Streaming's
    * `session_window` aggregate — the stateful operator that MERGES
    * per-key session state as events arrive (two separate windows fuse
    * when a bridging event lands; pinned cross-batch in
    * SessionWindowSpec) — over the events table as a file-source
    * stream, AvailableNow, append mode, parquet sink, read back.
    *
    * Determinism contract (what makes a streaming run hash-checkable):
    * watermark delay 0 ⇒ final watermark = max event time, and append
    * mode emits exactly the sessions whose window END (last event +
    * gap; windows MERGE on touch, so an event at EXACTLY gap
    * distance still extends the session — the same ≤-gap island rule
    * as batch q18, pinned in SessionWindowSpec) lands at or before
    * that watermark. The oracle computes the identical island relation
    * with the strict->-gap split rule and the same flush predicate — so the replay checks merge semantics, boundary
    * convention, AND the emission rule at once.
    *
    * Scale: one shuffle on user_id into the session state store; state
    * is per OPEN session (bounded by active keys × gap horizon, evicted
    * at watermark), never stream length.
    */
  def q172SessionWindowReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rawSchema = table(s, d, "events").schema
    val raw = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val tsd = if (rawSchema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
    val sess = graft.streaming.SessionWindows.userSessions(tsd)
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val base = s"$wh/graft_swin_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, base)
    val q = sess.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$base/out")
      .start()
    q.awaitTermination()
    s.read.parquet(s"$base/out").orderBy($"user_id", $"start_us")
  }

  /** The same sessions relationally: strict->-gap split islands, end =
    * last + gap, flushed iff end ≤ the final watermark (= global max ts).
    */
  val q172Sql: String =
    """WITH e AS (
      |  SELECT user_id, EPOCH_US(ts) AS ts_us FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), m AS (
      |  SELECT MAX(ts_us) AS wm FROM e
      |), flg AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM (SELECT user_id, ts_us,
      |          LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
      |        FROM e)
      |), sid AS (
      |  SELECT user_id, ts_us,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flg
      |), sess AS (
      |  SELECT user_id, MIN(ts_us) AS start_us,
      |         MAX(ts_us) + 1800000000 AS end_us, COUNT(*) AS n_events
      |  FROM sid GROUP BY user_id, sid
      |)
      |SELECT user_id, start_us, end_us, CAST(n_events AS BIGINT) AS n_events
      |FROM sess, m WHERE end_us <= wm
      |ORDER BY user_id, start_us""".stripMargin

  /** q173 — retention cohort matrix, the product-analytics staple the
    * event surface lacked: users cohort by their first active day, and
    * each (cohort_day, day_offset ≤ 13) cell reports how many cohort
    * members were active again offset days later, as an exact permille
    * of cohort size. Day indexing is exact epoch-µs integer `div`
    * (timezone-free), so every cell is engine-exact.
    *
    * Plan shape: the only corpus-sized work is the one (user, day)
    * distinct exchange; the result is checkpointed (events scans once)
    * and everything after — per-user min, the activity×cohort join,
    * the cell aggregation — runs on the distinct user-day relation,
    * bounded by users × days, not event count.
    */
  def q173RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val act = events(s, d)
      .filter($"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id", expr("unix_micros(ts) div 86400000000L").as("day"))
      .distinct()
      .localCheckpoint() // user-day-sized; feeds cohort, sizes, and the join
    val cohort = act.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val sizes = cohort.groupBy($"cohort_day").agg(count(lit(1)).as("cohort_size"))
    act.join(cohort, Seq("user_id"))
      .withColumn("day_offset", $"day" - $"cohort_day")
      .filter($"day_offset" <= 13)
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("rate_permille", expr("(n_active * 1000) div cohort_size"))
      .select($"cohort_day", $"day_offset", $"n_active", $"cohort_size",
        $"rate_permille")
      .orderBy($"cohort_day", $"day_offset")
  }

  val q173Sql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS day
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_day
      |)
      |SELECT a.cohort_day, a.day_offset, a.n_active,
      |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |  (a.n_active * 1000) // CAST(s.cohort_size AS BIGINT) AS rate_permille
      |FROM (
      |  SELECT c.cohort_day, act.day - c.cohort_day AS day_offset,
      |         CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM act JOIN cohort c USING (user_id)
      |  WHERE act.day - c.cohort_day <= 13
      |  GROUP BY 1, 2) a
      |JOIN sizes s USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q176 — Markov next-event transition matrix, the behavioral-model
    * sibling of q173's retention matrix (and of q137's conditional
    * bigram surprisal, lifted from tokens to user actions): per user,
    * events order by (ts, event_id) and every consecutive pair
    * contributes one (from_type → to_type) transition; the output is
    * the full transition-count matrix with each row's empirical
    * probability as an exact integer permille of the from-state total.
    * Transitions deliberately cross session boundaries (the
    * gap-agnostic chain is the standard first-order Markov abstraction;
    * q18's sessionizer owns the gap semantics).
    *
    * Scale: one shuffle on user_id feeds the per-user sort-window
    * (lead) — the same partitioning q18/q21 use; everything after runs
    * on the transition relation, at most |event_types|² rows. The
    * from-state totals join is a broadcast of ≤ |event_types| rows.
    * Integer permille keeps every cell engine-exact.
    */
  def q176MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tr = events(s, d)
      .filter($"user_id".isNotNull && $"ts".isNotNull &&
        $"event_type".isNotNull && $"event_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n_transitions"))
      .localCheckpoint() // |types|²-sized; feeds totals and the join
    val totals = tr.groupBy($"from_type")
      .agg(sum($"n_transitions").cast("long").as("from_total"))
    tr.join(broadcast(totals), Seq("from_type"))
      .withColumn("p_permille", expr("(n_transitions * 1000) div from_total"))
      .select($"from_type", $"to_type", $"n_transitions", $"from_total",
        $"p_permille")
      .orderBy($"from_type", $"to_type")
  }

  val q176Sql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |         LEAD(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS to_type
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL AND event_id IS NOT NULL
      |), tr AS (
      |  SELECT event_type AS from_type, to_type,
      |         CAST(COUNT(*) AS BIGINT) AS n_transitions
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
      |), tot AS (
      |  SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS from_total
      |  FROM tr GROUP BY 1
      |)
      |SELECT t.from_type, t.to_type, t.n_transitions, o.from_total,
      |       (t.n_transitions * 1000) // o.from_total AS p_permille
      |FROM tr t JOIN tot o USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** q187 — session PATH mining: the sequence-analytics staple one
    * level above q176's first-order transition matrix (which forgets
    * everything before the previous step) — per 30-minute-gap session
    * (q18's island rule: a gap STRICTLY over 30 min opens a new
    * session), the ordered event-type path truncated to its first 8
    * steps, and the top-20 paths by session count under a total order.
    * This is the "how do users actually traverse the product" query
    * behind funnel design; q67's MATCH_RECOGNIZE shape checks a KNOWN
    * pattern, this mines the unknown ones.
    *
    * Determinism: path assembly sorts (ts, event_id) structs inside the
    * session group — struct sort_array, not collect order; truncation
    * at 8 is the same inclusive slice in both engines (the DuckDB
    * list-slice off-by-one from round 10 is exactly the bug class this
    * pins); top-20 leaves via TakeOrderedAndProject under
    * (count DESC, path).
    *
    * Scale: one user_id window shuffle (q18's), one session-key
    * partial-combine agg whose payload is the ≤8-step path string, one
    * path-count agg on the path relation. Session state never exceeds
    * the session's own events; the path relation is
    * bounded by distinct paths, not sessions.
    */
  def q187SessionPaths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, d)
      .filter($"user_id".isNotNull && $"ts".isNotNull &&
        $"event_type".isNotNull && $"event_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type",
        expr("unix_micros(ts)").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("brk",
        ($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L).cast("long"))
      .withColumn("sess", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess")
      .agg(sort_array(collect_list(struct($"us", $"event_id", $"event_type")))
        .as("evs"))
      .select(concat_ws(">",
        slice(expr("transform(evs, e -> e.event_type)"), 1, 8)).as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(20)
  }

  val q187Sql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, EPOCH_US(ts) AS us
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL AND event_id IS NOT NULL
      |), brk AS (
      |  SELECT user_id, us, event_id, event_type,
      |    CASE WHEN us - LAG(us) OVER w IS NULL
      |           OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS b
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, us, event_id, event_type,
      |    SUM(b) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM brk
      |), paths AS (
      |  SELECT ARRAY_TO_STRING(
      |           (LIST(event_type ORDER BY us, event_id))[1:8], '>') AS path
      |  FROM sess GROUP BY user_id, sid
      |)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  /** q188 — NATIVE streaming exact dedup (`dropDuplicatesWithinWatermark`),
    * batch-oracle replayed: the last built-in stateful operator the
    * streaming tier hadn't exercised (q172 `session_window`, q169
    * stream-stream join, q167/T4 custom state). At-least-once delivery
    * is SIMULATED structurally — the same events table feeds TWO
    * unioned file-source streams, so every event arrives exactly twice
    * — and the keyed dedup state must collapse the pair: the read-back
    * must hash-equal the batch relation's single copy (without the
    * operator the sink holds 2× rows, so the hash check is the
    * dedup's proof, not a formality). Watermark 1 h bounds the state
    * retention window, the semantic difference from plain
    * `dropDuplicates`: a duplicate arriving LATER than the watermark
    * horizon is NOT collapsed (by design — bounded state), which is the
    * documented divergence class and exactly why q160's merge-based
    * first-wins exists for lake-durable idempotence.
    *
    * Scale: one shuffle on event_id into the dedup state store; state
    * per in-horizon key, watermark-evicted — rate × horizon, never
    * stream length. Scoped to 8 state partitions (q169's reasoning).
    */
  def q188StreamDedupReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rawSchema = table(s, d, "events").schema
    def side(): DataFrame = {
      val raw = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val tsd = if (rawSchema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
      tsd.filter($"event_id".isNotNull && $"user_id".isNotNull &&
          $"ts".isNotNull && $"event_type".isNotNull)
        .select($"event_id", $"user_id", $"event_type", $"ts")
    }
    val doubled = side().unionByName(side())
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val base = s"$wh/graft_sdedup_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, base)
    graft.streaming.StreamJoin.withConfs(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      val q = doubled.drop("ts").writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", s"$base/out")
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$base/out")
      .orderBy($"event_id")
  }

  /** The single-copy batch relation the doubled delivery must collapse to. */
  val q188Sql: String =
    """SELECT event_id, user_id, event_type FROM events
      |WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      |  AND ts IS NOT NULL AND event_type IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** q207 — `transformWithState` replay ([[graft.streaming.RunningStats]]):
    * Spark 4's arbitrary-state successor to mapGroupsWithState — typed
    * state handles on the RocksDB store — exercised as a REAL
    * four-micro-batch streaming query: events deliver as four files
    * (one per `event_id mod 4` slice, `maxFilesPerTrigger = 1` under
    * AvailableNow), the processor folds a running (count, Σ⌊value⌋)
    * per (event_type, user-slot) key in a ValueState and emits the
    * running totals once per batch the key appears in. File-arrival
    * ORDER is the one thing a relational oracle cannot see, so the
    * hash-checked output is the order-independent summary — emission
    * count (= batches seen) and final totals (= per-key maxima:
    * monotone by v ≥ 0) — while batch-order-sensitive semantics
    * (running sequences, event-time timers, list state) are pinned
    * deterministically in TransformWithStateSpec with a MemoryStream.
    *
    * Scale: state is one tuple per live key, never stream length; each
    * micro-batch shuffles only its own rows on the key; RocksDB keeps
    * the per-partition state off-heap (the provider the new API
    * requires, and the one a 100 TB deployment runs anyway).
    */
  def q207TransformWithStateReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .filter($"event_id".isNotNull && $"user_id".isNotNull &&
        $"event_type".isNotNull && $"value".isNotNull && $"value" >= 0)
      .select(concat($"event_type", lit("_"),
          pmod($"user_id", lit(97)).cast("string")).as("k"),
        floor($"value").cast("long").as("v"),
        pmod($"event_id", lit(4)).as("b"))
      .localCheckpoint()
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val base = s"$wh/graft_tws_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, base)
    // four delivery files, written in batch order (the file source
    // triggers by modification time; order only affects the
    // batch-order-sensitive fields the summary below projects away)
    (0L to 3L).foreach { b =>
      ev.filter($"b" === b).drop("b").coalesce(1).write
        .mode(if (b == 0L) org.apache.spark.sql.SaveMode.Overwrite
              else org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$base/in")
    }
    val stream = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
      .as[graft.streaming.RunningStats.In]
    val emits = graft.streaming.RunningStats.profile(stream)
    graft.streaming.StreamJoin.withConfs(s,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      val q = emits.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", s"$base/out")
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$base/out")
      .groupBy($"k")
      .agg(count(lit(1)).as("n_emissions"),
        max($"run_n").as("n_events"), max($"run_v").as("v_total"))
      .orderBy($"k")
  }

  /** Order-independent summary recomputed relationally: emissions =
    * distinct batches a key appears in, totals = plain aggregates.
    */
  val q207Sql: String =
    """WITH e AS (
      |  SELECT event_type || '_' || CAST(user_id % 97 AS VARCHAR) AS k,
      |         CAST(FLOOR(value) AS BIGINT) AS v, event_id % 4 AS b
      |  FROM events
      |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL AND value IS NOT NULL AND value >= 0
      |)
      |SELECT k, CAST(COUNT(DISTINCT b) AS BIGINT) AS n_emissions,
      |       COUNT(*) AS n_events, CAST(SUM(v) AS BIGINT) AS v_total
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** q196 — LAST-TOUCH attribution: every purchase credits the
    * latest click by the same user at or before it, but only within a
    * 6-hour lookback (marketing's standard attribution window) — the
    * business query q23's as-of join exists to serve, composed here as
    * as-of (≤, latest, tie-broken) + window residual (credit expires),
    * then rolled up to the report: per click-hour-of-day, attributed
    * purchases, matched purchase count, and total attributed value.
    * Unattributed purchases (no click within 6 h) roll into the
    * 'organic' row — attribution reports must account for EVERY
    * conversion or the channel shares lie; the oracle's correlated
    * window computes the same latest-click relation independently.
    *
    * Scale: [[AsOfJoin.join]]'s single (key, time)-sorted merge pass —
    * one shuffle on user_id, no range explosion; the residual and
    * roll-up run on the purchase relation. The same query at candle
    * scale is the q23 trade-quote shape.
    */
  def q196LastTouchAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .filter($"user_id".isNotNull && $"ts".isNotNull &&
        $"event_id".isNotNull && $"value".isNotNull)
      .select($"user_id", $"event_id", $"event_type", $"ts", $"value")
      .localCheckpoint() // one scan feeds both sides
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("c_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"),
        $"value")
    AsOfJoin.join(purchases, clicks, "user_id", "user_id", "p_ts", "c_ts",
        payload = Seq("click_id", "c_ts"), tieBreak = "click_id")
      .withColumn("attributed",
        $"asof_c_ts".isNotNull &&
          expr("unix_micros(p_ts) - unix_micros(asof_c_ts) <= 21600000000L"))
      .withColumn("bucket",
        when($"attributed",
          expr("(unix_micros(asof_c_ts) div 3600000000L) % 24").cast("string"))
          .otherwise("organic"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.Exact.dsum($"value").as("attributed_value"))
      .orderBy($"bucket")
  }

  val q196Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, ts, value FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND event_id IS NOT NULL AND value IS NOT NULL
       |), p AS (
       |  SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
       |  FROM ev WHERE event_type = 'purchase'
       |), lastc AS (
       |  SELECT p.purchase_id, p.p_ts, p.value,
       |    (SELECT c.ts FROM ev c
       |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
       |       AND c.ts <= p.p_ts
       |     ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS c_ts
       |  FROM p
       |)
       |SELECT CASE WHEN c_ts IS NOT NULL
       |              AND EPOCH_US(p_ts) - EPOCH_US(c_ts) <= 21600000000
       |            THEN CAST((EPOCH_US(c_ts) // 3600000000) % 24 AS VARCHAR)
       |            ELSE 'organic' END AS bucket,
       |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |       ${graft.functions.Exact.sqlDsum("value")} AS attributed_value
       |FROM lastc GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_last_touch_attribution" -> (q196LastTouchAttribution _),
    "q207_transform_with_state" -> (q207TransformWithStateReplay _),
    "q188_stream_dedup_replay" -> (q188StreamDedupReplay _),
    "q187_session_paths" -> (q187SessionPaths _),
    "q176_markov_transitions" -> (q176MarkovTransitions _),
    "q173_retention_cohorts" -> (q173RetentionCohorts _),
    "q172_session_window_replay" -> (q172SessionWindowReplay _),
    "q169_stream_join_replay" -> (q169StreamJoinReplay _),
    "q20_keeplast_dedup" -> (q20KeepLastDedup _),
    "q21_gap_detect" -> (q21GapDetect _),
    "q22_resample_ohlc" -> (q22ResampleOhlc _),
    "q23_asof_join" -> (q23AsofJoin _),
    "q24_json_extract" -> (q24JsonExtract _),
    "q25_sink_merge" -> (q25SinkMerge _),
    "q60_range_join" -> (q60RangeJoin _),
    "q61_range_window" -> (q61RangeWindow _),
    "q75_moving_window" -> (q75MovingWindow _),
  )

  val oracles: Map[String, String] = Map(
    "q196_last_touch_attribution" -> q196Sql,
    "q207_transform_with_state" -> q207Sql,
    "q188_stream_dedup_replay" -> q188Sql,
    "q187_session_paths" -> q187Sql,
    "q176_markov_transitions" -> q176Sql,
    "q173_retention_cohorts" -> q173Sql,
    "q172_session_window_replay" -> q172Sql,
    "q169_stream_join_replay" -> q169Sql,
    "q20_keeplast_dedup" -> q20Sql,
    "q21_gap_detect" -> q21Sql,
    "q22_resample_ohlc" -> q22Sql,
    "q23_asof_join" -> q23Sql,
    "q24_json_extract" -> q24Sql,
    "q25_sink_merge" -> q25Sql,
    "q60_range_join" -> q60Sql,
    "q61_range_window" -> q61Sql,
    "q75_moving_window" -> q75Sql,
  )
}
