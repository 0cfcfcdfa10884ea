package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.sources.Tables._

/** Distribution-drift monitors — the data-quality instrumentation a
  * long-running ingest pipeline runs between snapshots: "does source X
  * still look like the corpus?" (chi-square goodness of fit) and "did
  * this metric's distribution move between cohorts?" (two-sample
  * Kolmogorov–Smirnov). The reference collects and stores but never
  * validates (crypto_collector.py:529–560); production pipelines gate
  * promotion of a new snapshot on exactly these statistics.
  *
  * Determinism contract: all counts are exact longs off one scan;
  * every derived double is one identical exactly-rounded IEEE chain
  * (integer→double conversion, one divide, one subtract, one multiply)
  * in Spark and DuckDB; order-sensitive float SUMs go through
  * [[Exact.dsum]] (decimal accumulation); KS's MAX is order-free.
  */
object Drift {

  /** q96 — per-source chi-square drift of the document-length
    * distribution against the whole corpus.
    *
    * Shape for 100 TB: ONE corpus scan feeds the (source, bucket)
    * partial+final count aggregate; every marginal (per-source totals,
    * per-bucket totals, grand total) is re-aggregated FROM that tiny
    * relation (|sources|×|buckets| rows), never from the corpus. The
    * grid completion (a source's empty buckets still contribute their
    * expected count) is a broadcast left join on the same tiny relation.
    */
  def q96DriftChi2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the count relation is BOUNDED (|sources|×|buckets|) with four
    // consumers below whose differing column needs would otherwise
    // prune the partial aggregates apart and re-scan the corpus per
    // marginal — the q88 bounded-relation checkpoint posture
    val obs = documents(s, d)
      .select($"source",
        least(floor($"n_chars" / 60).cast("long"), lit(9L)).as("bucket"))
      .groupBy($"source", $"bucket").agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val srcs = obs.groupBy($"source").agg(sum($"o").as("n_src"))
    val gb = obs.groupBy($"bucket").agg(sum($"o").as("g"))
    val tot = obs.agg(sum($"o").as("n_all"))
    val expected = ($"g" * $"n_src").cast("double") / $"n_all"
    val term = ($"o" - expected) * ($"o" - expected) / expected
    srcs.crossJoin(broadcast(gb)).crossJoin(broadcast(tot))
      .join(obs, Seq("source", "bucket"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
      .select($"source", $"n_src", term.as("term"))
      .groupBy($"source", $"n_src")
      .agg(Exact.dsum($"term").as("chi2"))
      .select($"source", $"n_src".as("n_docs"), $"chi2")
      .orderBy($"source")
  }

  val q96Sql: String =
    s"""WITH b AS (
       |  SELECT source, LEAST(CAST(FLOOR(n_chars / 60) AS BIGINT), 9) AS bucket
       |  FROM documents),
       |obs AS (SELECT source, bucket, COUNT(*) AS o FROM b GROUP BY 1, 2),
       |srcs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_src FROM obs GROUP BY 1),
       |gb AS (SELECT bucket, CAST(SUM(o) AS BIGINT) AS g FROM obs GROUP BY 1),
       |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_all FROM obs),
       |terms AS (
       |  SELECT s.source, s.n_src,
       |    (COALESCE(o.o, 0) - CAST(gl.g * s.n_src AS DOUBLE) / t.n_all)
       |      * (COALESCE(o.o, 0) - CAST(gl.g * s.n_src AS DOUBLE) / t.n_all)
       |      / (CAST(gl.g * s.n_src AS DOUBLE) / t.n_all) AS term
       |  FROM srcs s CROSS JOIN gb gl CROSS JOIN tot t
       |  LEFT JOIN obs o ON o.source = s.source AND o.bucket = gl.bucket)
       |SELECT source, n_src AS n_docs, ${Exact.sqlDsum("term")} AS chi2
       |FROM terms GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Two-phase distributed empirical CDF: global cumulative counts of
    * the `a`/`b` indicator columns in value order, WITHOUT a global
    * single-partition window. Phase 1 aggregates per coarse value
    * bucket (bounded by the value range, not row count) and prefix-sums
    * that tiny relation; phase 2 windows WITHIN each bucket and adds
    * the broadcast carry-in — the q23/q68 carry idiom, so sort
    * parallelism is per-bucket. `RANGE ... CURRENT ROW` makes
    * same-value ties share one CDF point in both phases and engines.
    */
  private[graft] def cdf2(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    // Two passes over the input — the textbook distributed-CDF shape:
    // the counts pass reads only (bucket, a, b) via a column-pruned
    // scan and its exchange is REUSED by the grand-total aggregate
    // ([[totalsFromBuckets]] derives totals from the bucket counts, so
    // totals cost no third scan); the row pass feeds the per-bucket
    // window through the exchange its required distribution demands
    // anyway. (A single shared exchange for both passes is impossible
    // without defeating column pruning: the counts pass must not read
    // `value`.)
    val bucketed = ev.withColumn("bucket", floor($"value").cast("long"))
      // explicit N (TextOps discipline): the in-bucket range windows
      // serialize onto one task if AQE coalesces this exchange
      .repartition(ev.sparkSession.sparkContext.defaultParallelism, $"bucket")
    // co-partitioned on the group key → partial+final agg, no exchange
    val per = bucketed.groupBy($"bucket")
      .agg(sum($"a").as("ba"), sum($"b").as("bb"))
    // single-partition window over the BUCKET relation only (≤ value
    // range rows — hundreds), never the event relation
    val wB = BoundedWindow.ordered($"bucket", $"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = per.select($"bucket",
      coalesce(sum($"ba").over(wB), lit(0L)).as("ca0"),
      coalesce(sum($"bb").over(wB), lit(0L)).as("cb0"))
    val wIn = Window.partitionBy($"bucket").orderBy($"value")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(carry), "bucket")
      .select($"value",
        ($"ca0" + sum($"a").over(wIn)).as("ca"),
        ($"cb0" + sum($"b").over(wIn)).as("cb"))
  }

  /** Grand totals derived from the per-bucket relation (not the raw
    * input), so KS shares [[cdf2]]'s single scan.
    */
  private def totalsFromBuckets(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    ev.withColumn("bucket", floor($"value").cast("long"))
      .repartition(ev.sparkSession.sparkContext.defaultParallelism, $"bucket")
      .groupBy($"bucket").agg(sum($"a").as("ba"), sum($"b").as("bb"))
      .agg(sum($"ba").as("na"), sum($"bb").as("nb"))
  }

  /** q97 — two-sample Kolmogorov–Smirnov statistic between the `value`
    * distributions of two event cohorts: D = max |F_a(v) − F_b(v)|.
    * One scan, one bucket agg, one per-bucket window, one max — no
    * global sort anywhere.
    */
  def q97KsDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .filter($"event_type".isin("purchase", "view"))
      .select($"value",
        when($"event_type" === "purchase", 1L).otherwise(0L).as("a"),
        when($"event_type" === "view", 1L).otherwise(0L).as("b"))
    val tot = totalsFromBuckets(ev)
    cdf2(ev)
      .crossJoin(broadcast(tot))
      .select(abs($"ca".cast("double") / $"na" - $"cb".cast("double") / $"nb")
        .as("dist"), $"na", $"nb")
      .groupBy($"na", $"nb").agg(max($"dist").as("ks"))
      .select($"ks", $"na".as("n_a"), $"nb".as("n_b"))
  }

  val q97Sql: String =
    """WITH ev AS (
      |  SELECT value,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM ev),
      |cum AS (
      |  SELECT value,
      |    SUM(a) OVER (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |    SUM(b) OVER (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      |  FROM ev)
      |SELECT MAX(ABS(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)) AS ks,
      |  na AS n_a, nb AS n_b
      |FROM cum, tot GROUP BY na, nb""".stripMargin

  /** q99 — data-quality audit: referential integrity (orphans both
    * directions), temporal sanity (shipped before ordered), and domain
    * ranges, reported as one (constraint, violation-count) relation —
    * the promotion gate a pipeline runs before publishing a snapshot.
    *
    * Shape for 100 TB: ONE full-outer shuffle join on the key carries
    * every cross-table constraint (orphans = null-side counts, the
    * date inversion = matched-row predicate) AND the single-table
    * range checks (conditional sums ignore the other side's null
    * rows), so the whole audit is one exchange per input plus a
    * map-side-partial scalar aggregate. Adding a constraint is a new
    * aggregate column, not a new pass.
    */
  def q99DqAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = lineitem(s, d)
      .select($"l_orderkey", $"l_discount", $"l_quantity", $"l_shipdate")
    val o = orders(s, d).select($"o_orderkey", $"o_orderdate", $"o_totalprice")
    def viol(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(cond, 1L).otherwise(0L))
    val c = l.join(o, $"l_orderkey" === $"o_orderkey", "full_outer")
      .agg(
        viol($"l_orderkey".isNotNull && $"o_orderkey".isNull)
          .as("fk_orphan_lineitem"),
        viol($"o_orderkey".isNotNull && $"l_orderkey".isNull)
          .as("childless_order"),
        viol($"l_shipdate" < $"o_orderdate").as("ship_before_order"),
        viol($"l_discount" < 0 || $"l_discount" > 0.08).as("discount_range"),
        viol($"l_quantity" <= 0).as("qty_nonpositive"),
        viol($"o_orderkey".isNotNull && $"o_totalprice" <= 0)
          .as("price_nonpositive"))
    c.unpivot(Array.empty[org.apache.spark.sql.Column],
        "constraint_name", "n_violations")
      .orderBy($"constraint_name")
  }

  val q99Sql: String =
    """WITH j AS (
      |  SELECT l.l_orderkey AS lk, l.l_discount, l.l_quantity, l.l_shipdate,
      |         o.o_orderkey AS ok, o.o_orderdate, o.o_totalprice
      |  FROM lineitem l FULL OUTER JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN lk IS NOT NULL AND ok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fk_orphan_lineitem,
      |    CAST(SUM(CASE WHEN ok IS NOT NULL AND lk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS childless_order,
      |    CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order,
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS discount_range,
      |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS qty_nonpositive,
      |    CAST(SUM(CASE WHEN ok IS NOT NULL AND o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_nonpositive
      |  FROM j)
      |SELECT * FROM (
      |  SELECT 'fk_orphan_lineitem' AS constraint_name, fk_orphan_lineitem AS n_violations FROM c
      |  UNION ALL SELECT 'childless_order', childless_order FROM c
      |  UNION ALL SELECT 'ship_before_order', ship_before_order FROM c
      |  UNION ALL SELECT 'discount_range', discount_range FROM c
      |  UNION ALL SELECT 'qty_nonpositive', qty_nonpositive FROM c
      |  UNION ALL SELECT 'price_nonpositive', price_nonpositive FROM c)
      |ORDER BY constraint_name""".stripMargin

  /** q177 — CUSUM change-point monitor (Page 1954), the SEQUENTIAL
    * drift detector next to q96/q97's batch two-sample tests: those ask
    * "do two snapshots differ?", CUSUM asks "at which point did this
    * series' level shift?" — the alerting primitive a live metric
    * pipeline runs per series. Per event_type, events order by
    * (ts, event_id) and the one-sided upward statistic
    * S_i = max(0, S_{i-1} + dev_i − k) is computed via its prefix-sum
    * closed form S_i = P_i − min(0, min_{j≤i} P_j) (P = running sum of
    * dev − k) — which turns the sequential recurrence into two
    * window functions over ONE per-series sort. Two variants per
    * series: k = 0 (raw cumulative excursion — grows like √n on pure
    * noise, so the audit is non-vacuous at every SF) and k = mad (the
    * classic drift-compensated form that stays near zero on noise and
    * fires only on sustained shifts; its detection behavior on a real
    * injected shift is pinned in DriftSpec).
    *
    * Determinism: deviations are value − μ in ONE double op (exact in
    * both engines), then cast to DECIMAL(38,10) — all prefix sums,
    * mins, and threshold compares run in exact decimal; μ, mad, and
    * the reported maxima go through [[graft.functions.Exact]]'s
    * floor-quantized double (no tie cases in either engine).
    *
    * Scale: one shuffle partitions by series (event_type here; symbol
    * at deployment) and sorts within — the q18/q21 window shape; both
    * CUSUM variants and the alarm filter ride that single sort.
    * Per-series means/mads are a 5-row broadcast. Nothing is
    * driver-side; series count scales the partitioning, not the plan.
    */
  def q177CusumChangepoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = org.apache.spark.sql.types.DecimalType(38, 10)
    val ev = events(s, d)
      .filter($"event_type".isNotNull && $"value".isNotNull &&
        $"ts".isNotNull && $"event_id".isNotNull)
      .select($"event_type", $"event_id", $"ts", $"value")
    val mu = ev.groupBy($"event_type").agg(Exact.davg($"value").as("mu"))
    val dev = ev.join(broadcast(mu), Seq("event_type"))
      .withColumn("dev", ($"value" - $"mu").cast(D))
    val mad = dev.groupBy($"event_type")
      .agg((floor(sum(abs($"dev")) * 10000).cast("double") / 10000.0 /
        count(lit(1))).as("mad"))
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zero = lit(0).cast(D)
    val stat = dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("p", sum($"dev").over(w))
      .withColumn("pk", sum(($"dev" - $"mad".cast(D)).cast(D)).over(w))
      .withColumn("s", $"p" - least(min($"p").over(w), zero))
      .withColumn("sk", $"pk" - least(min($"pk").over(w), zero))
      .withColumn("alarm", $"s" > ($"mad" * 8).cast(D))
    stat.groupBy($"event_type")
      .agg(count(lit(1)).as("n_pts"),
        sum($"alarm".cast("long")).cast("long").as("n_alarms"),
        min(when($"alarm", $"event_id")).as("first_alarm_event"),
        (floor(max($"s") * 10000).cast("double") / 10000.0).as("max_stat"),
        (floor(max($"sk") * 10000).cast("double") / 10000.0).as("max_stat_drift"))
      .orderBy($"event_type")
  }

  val q177Sql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id, ts, value FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND ts IS NOT NULL AND event_id IS NOT NULL
      |), m AS (
      |  SELECT event_type,
      |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0
      |      / COUNT(*) AS mu
      |  FROM ev GROUP BY 1
      |), dv AS (
      |  SELECT e.event_type, e.event_id, e.ts,
      |         CAST(e.value - m.mu AS DECIMAL(38,10)) AS dev
      |  FROM ev e JOIN m USING (event_type)
      |), md AS (
      |  SELECT event_type,
      |    CAST(FLOOR(SUM(ABS(dev)) * 10000) AS DOUBLE) / 10000.0 / COUNT(*) AS mad
      |  FROM dv GROUP BY 1
      |), ps AS (
      |  SELECT d.event_type, d.event_id, d.ts, md.mad,
      |    SUM(d.dev) OVER w AS p,
      |    SUM(CAST(d.dev - CAST(md.mad AS DECIMAL(38,10)) AS DECIMAL(38,10))) OVER w AS pk
      |  FROM dv d JOIN md USING (event_type)
      |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.ts, d.event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), st AS (
      |  SELECT event_type, event_id, mad,
      |    p  - LEAST(MIN(p)  OVER w, CAST(0 AS DECIMAL(38,10))) AS s,
      |    pk - LEAST(MIN(pk) OVER w, CAST(0 AS DECIMAL(38,10))) AS sk
      |  FROM ps
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), al AS (
      |  SELECT event_type, event_id, s, sk,
      |         s > CAST(mad * 8 AS DECIMAL(38,10)) AS alarm
      |  FROM st
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pts,
      |  CAST(SUM(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
      |  MIN(CASE WHEN alarm THEN event_id END) AS first_alarm_event,
      |  CAST(FLOOR(MAX(s)  * 10000) AS DOUBLE) / 10000.0 AS max_stat,
      |  CAST(FLOOR(MAX(sk) * 10000) AS DOUBLE) / 10000.0 AS max_stat_drift
      |FROM al GROUP BY 1 ORDER BY 1""".stripMargin

  /** q195 — SEASONALITY-strength audit (variance explained by the
    * hour-of-day profile): the decomposition-side time-series monitor
    * next to q177's change-point and q109/q110's smoothing/memory —
    * "does this metric have a daily rhythm worth modeling?" answered as
    * an exact permille: 1 − SSE(residual vs hourly means) /
    * SSE(vs global mean), the R² of the seasonal-naive model. A metric
    * with no rhythm scores ≈ 0 (this corpus's uniform values do — the
    * audit says so exactly); a strongly diurnal one scores near 1000,
    * which DriftSpec plants. Hour-of-day by integer µs arithmetic
    * (timezone-free, q170's discipline); means davg-quantized; both
    * SSEs are xsum-style floor-quantized sums of single-op squares —
    * the whole statistic engine-exact with no square root anywhere.
    *
    * Scale: one corpus pass feeds two tiny broadcast aggregates (5
    * global + 120 hourly cells) and one final partial-combine agg; the
    * corpus shuffles zero times (aggregates partial-combine, joins are
    * broadcasts).
    */
  def q195SeasonalityStrength(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .filter($"event_type".isNotNull && $"value".isNotNull && $"ts".isNotNull)
      .select($"event_type", $"value",
        expr("(unix_micros(ts) div 3600000000L) % 24").as("hod"))
      .localCheckpoint() // one scan feeds three aggregates
    val mu = ev.groupBy($"event_type").agg(Exact.davg($"value").as("mu"))
    val muH = ev.groupBy($"event_type", $"hod")
      .agg(Exact.davg($"value").as("mu_h"))
    ev.join(broadcast(mu), Seq("event_type"))
      .join(broadcast(muH), Seq("event_type", "hod"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor(($"value" - $"mu") * ($"value" - $"mu") * 1e6))
          .cast("double") / 1e6).as("sse_total"),
        (sum(floor(($"value" - $"mu_h") * ($"value" - $"mu_h") * 1e6))
          .cast("double") / 1e6).as("sse_resid"))
      .select($"event_type", $"n",
        floor($"sse_total" * 10000).cast("long").as("sse_total_q"),
        floor($"sse_resid" * 10000).cast("long").as("sse_resid_q"),
        floor(($"sse_total" - $"sse_resid") * 1000.0 / $"sse_total")
          .cast("long").as("strength_permille"))
      .orderBy($"event_type")
  }

  val q195Sql: String =
    """WITH ev AS (
      |  SELECT event_type, value,
      |         (EPOCH_US(ts) // 3600000000) % 24 AS hod
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
      |), m AS (
      |  SELECT event_type,
      |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0
      |      / COUNT(*) AS mu
      |  FROM ev GROUP BY 1
      |), mh AS (
      |  SELECT event_type, hod,
      |    CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0
      |      / COUNT(*) AS mu_h
      |  FROM ev GROUP BY 1, 2
      |), agg AS (
      |  SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(FLOOR((e.value - m.mu) * (e.value - m.mu) * 1e6) AS BIGINT))
      |         AS DOUBLE) / 1e6 AS sse_total,
      |    CAST(SUM(CAST(FLOOR((e.value - mh.mu_h) * (e.value - mh.mu_h) * 1e6) AS BIGINT))
      |         AS DOUBLE) / 1e6 AS sse_resid
      |  FROM ev e JOIN m USING (event_type) JOIN mh USING (event_type, hod)
      |  GROUP BY 1
      |)
      |SELECT event_type, n,
      |  CAST(FLOOR(sse_total * 10000) AS BIGINT) AS sse_total_q,
      |  CAST(FLOOR(sse_resid * 10000) AS BIGINT) AS sse_resid_q,
      |  CAST(FLOOR((sse_total - sse_resid) * 1000.0 / sse_total) AS BIGINT)
      |    AS strength_permille
      |FROM agg ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_drift_chi2" -> (q96DriftChi2 _),
    "q97_ks_drift" -> (q97KsDrift _),
    "q99_dq_audit" -> (q99DqAudit _),
    "q177_cusum_changepoint" -> (q177CusumChangepoint _),
    "q195_seasonality_strength" -> (q195SeasonalityStrength _),
  )

  val oracles: Map[String, String] = Map(
    "q96_drift_chi2" -> q96Sql,
    "q97_ks_drift" -> q97Sql,
    "q99_dq_audit" -> q99Sql,
    "q177_cusum_changepoint" -> q177Sql,
    "q195_seasonality_strength" -> q195Sql,
  )
}
