package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables._

/** Second relational batch: cube/grouping sets, pivot, sessionization,
  * running totals, the rank family, scalar-function pack, theta join,
  * exact median — rounding out SURVEY.md §2.5–§2.8 coverage.
  */
object Relational2 {

  /** CUBE over (returnflag, linestatus): all 4 grouping combinations. */
  def q16Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"), $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  val q16Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Pivot event counts per user into one column per event type. */
  def q17Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  val q17Sql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sessionization: a new session starts after a >30-minute gap; one row
    * per (user, session) with bounds and size. The batch formulation of
    * streaming session windows (§2.9): gap flag via lag, session id via
    * running sum — two window passes over one shuffle by user.
    */
  /** Per-user sessions under the 30-minute gap rule — q18's body, shared
    * with q164's interval-overlap join. One shuffle by user; both window
    * passes and the rollup ride the same (user) partitioning.
    */
  private[operators] def sessions(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000000
    val flagged = ev
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("new_sess",
        when(($"ts_us" - lag($"ts_us", 1).over(byUser)) > gapUs || lag($"ts_us", 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
  }

  def q18Sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sessions(events(s, d)).orderBy($"user_id", $"session_id")
  }

  val q18Sql: String =
    """SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      |FROM (
      |  SELECT user_id, ts_us,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, EPOCH_US(ts) AS ts_us,
      |      CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                > 30 * 60 * 1000000
      |           OR LAG(EPOCH_US(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events))
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** q164 — interval-OVERLAP join: cross-user pairs of sessions that
    * overlap in time (co-activity detection), with the exact overlap
    * length. The interval×interval member of the range-join family:
    * q60 joins POINTS to intervals (bucketed range join), q23 joins
    * points to the latest preceding point (as-of); two interval SETS
    * overlapping each other is the third shape (think concurrent
    * sessions, meeting conflicts, position-vs-outage windows), and it
    * is invisible to both — a session pair can overlap with neither
    * side containing the other's start... actually any overlap shares
    * max(starts); the point is no equi key exists.
    *
    * Scale shape: each session explodes to its covered HOUR buckets
    * (sessions are gap-bounded, so per-session fan-out is small); the
    * candidate join is EQUI on the bucket key (shuffle keyed by hour —
    * never the quadratic all-pairs theta join the oracle runs), the
    * exact overlap predicate is the join residual, and each
    * qualifying pair is emitted exactly ONCE — in the bucket of
    * max(starts), the overlap's first hour, which both sides provably
    * cover — so no distinct pass is needed (the standard interval-join
    * dedup trick). The session relation localCheckpoints once; both
    * join branches carve from it.
    */
  def q164SessionOverlapJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val se = sessions(events(s, d))
      .select($"user_id", $"session_id", $"start_us", $"end_us",
        explode(expr("sequence(start_us div 3600000000L, end_us div 3600000000L)")).as("b"))
      .localCheckpoint()
    val a = se.select($"b", $"user_id".as("user_a"), $"session_id".as("session_a"),
      $"start_us".as("sa"), $"end_us".as("ea"))
    val bb = se.select($"b", $"user_id".as("user_b"), $"session_id".as("session_b"),
      $"start_us".as("sb"), $"end_us".as("eb"))
    a.join(bb, Seq("b"))
      .filter($"user_a" < $"user_b" && $"sa" <= $"eb" && $"sb" <= $"ea" &&
        $"b" === expr("greatest(sa, sb) div 3600000000L"))
      .select($"user_a", $"session_a", $"user_b", $"session_b",
        (least($"ea", $"eb") - greatest($"sa", $"sb")).as("overlap_us"))
      .orderBy($"user_a", $"session_a", $"user_b", $"session_b")
  }

  /** The oracle runs the brute inequality theta join over the same
    * session CTE — candidate-set-free ground truth for the bucketed
    * equi-join + first-shared-hour dedup.
    */
  val q164Sql: String =
    """WITH sess AS (
      |  SELECT user_id, session_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      |  FROM (
      |    SELECT user_id, ts_us,
      |      CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |    FROM (
      |      SELECT user_id, event_id, EPOCH_US(ts) AS ts_us,
      |        CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                  > 30 * 60 * 1000000
      |             OR LAG(EPOCH_US(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             THEN 1 ELSE 0 END AS new_sess
      |      FROM events))
      |  GROUP BY user_id, session_id
      |)
      |SELECT a.user_id AS user_a, a.session_id AS session_a,
      |  b.user_id AS user_b, b.session_id AS session_b,
      |  LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us) AS overlap_us
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id AND a.start_us <= b.end_us AND b.start_us <= a.end_us
      |ORDER BY user_a, session_a, user_b, session_b""".stripMargin

  /** Running revenue total per customer (cumulative window sum). Exact
    * decimal accumulation + FLOOR-at-2-decimals output: cumulative double
    * sums would depend on each engine's window-sum algorithm (DuckDB uses
    * segment trees — different summation order).
    */
  def q19RunningTotal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_total",
        floor(sum($"o_totalprice".cast(DecimalType(38, 10))).over(w) * 100).cast("double") / 100.0)
      .select($"o_custkey", $"o_orderkey", unix_micros($"o_orderdate").as("odate_us"), $"running_total")
      .orderBy($"o_custkey", $"odate_us", $"o_orderkey")
  }

  val q19Sql: String =
    """SELECT o_custkey, o_orderkey, EPOCH_US(o_orderdate) AS odate_us,
      |  CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS UNBOUNDED PRECEDING) * 100) AS DOUBLE) / 100.0 AS running_total
      |FROM orders
      |ORDER BY o_custkey, odate_us, o_orderkey""".stripMargin

  /** Rank family: rank/dense_rank (real ties on priority), percent_rank,
    * and ntile over a unique ordering (ties would make ntile assignment
    * order-dependent).
    *
    * Scale-aware evaluation. `o_orderstatus` has 3 values, so the naive
    * `Window.partitionBy(o_orderstatus)` collapses the whole table onto
    * 3 sort tasks — at 100 TB each would sort a third of the table on
    * one core. Instead:
    *
    *  - rank/dense_rank/percent_rank order by `o_orderpriority`, which
    *    has ~5 distinct values: every row's rank is fully determined by
    *    the per-(status, priority) row counts. A 15-row count aggregate
    *    (map-side partial, shrinks with group count not data size) +
    *    a window over THAT tiny relation + a broadcast join back gives
    *    exact ranks with full scan parallelism and no big-table sort.
    *
    *  - ntile(4) orders by the high-cardinality (totalprice, orderkey),
    *    so ranks can't come from value counts. Classic two-pass
    *    distributed row_number instead: coarse range-bucket each row
    *    (`floor(totalprice/4096)` ≈ 125 buckets — at real scale the
    *    boundaries would come from a sample, same shape), count rows
    *    per (status, bucket), prefix-sum those counts over the tiny
    *    bucket relation, broadcast the offsets back, and add a local
    *    row_number within each (status, bucket) — ~375 sort partitions
    *    instead of 3, each sorting only its bucket. ntile is then a
    *    closed-form function of (global rn, group size n): the first
    *    n%4 buckets take ceil(n/4) rows, the rest floor(n/4).
    *
    * Output is bit-identical to the naive windows; the oracle stays the
    * plain RANK/NTILE SQL.
    */
  def q26WindowRanks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)

    // rank family from per-(status, priority) counts — tiny relation
    val wp = Window.partitionBy($"o_orderstatus").orderBy($"o_orderpriority")
    val prioRanks = o.groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("rk", coalesce(sum($"__cnt").over(
        wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
      .withColumn("drk", row_number().over(wp).cast("long"))
      .withColumn("__n", sum($"__cnt").over(Window.partitionBy($"o_orderstatus")))
      .withColumn("prk", when($"__n" > 1,
        ($"rk" - 1).cast("double") / ($"__n" - 1)).otherwise(lit(0.0)))
      .select($"o_orderstatus", $"o_orderpriority", $"rk", $"drk", $"prk")

    // two-pass distributed row_number for ntile: bucket offsets + local rn
    val bucketed = o.withColumn("__b", floor($"o_totalprice" / 4096).cast("long"))
    val wb = Window.partitionBy($"o_orderstatus").orderBy($"__b")
    val offsets = bucketed.groupBy($"o_orderstatus", $"__b")
      .agg(count(lit(1)).as("__bcnt"))
      .withColumn("__off", coalesce(sum($"__bcnt").over(
        wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum($"__bcnt").over(Window.partitionBy($"o_orderstatus")))
      .select($"o_orderstatus", $"__b", $"__off", $"__n")

    val wl = Window.partitionBy($"o_orderstatus", $"__b")
      .orderBy($"o_totalprice", $"o_orderkey")
    // SQL NTILE(4): rem = n%4 leading buckets of base+1 rows, then base.
    // Exact integer arithmetic (`div`) — Column./ would be double division.
    // null-safe (<=>) joins: a plain equi-join would drop NULL-status/
    // priority/price rows that the naive windows rank like any other
    // value — the parity must not depend on the data being null-free
    val pr = prioRanks.withColumnRenamed("o_orderstatus", "__prs")
      .withColumnRenamed("o_orderpriority", "__prp")
    val off = offsets.withColumnRenamed("o_orderstatus", "__ofs")
      .withColumnRenamed("__b", "__ofb")
    bucketed
      .join(broadcast(pr),
        $"o_orderstatus" <=> $"__prs" && $"o_orderpriority" <=> $"__prp")
      .join(broadcast(off), $"o_orderstatus" <=> $"__ofs" && $"__b" <=> $"__ofb")
      .withColumn("__rn", $"__off" + row_number().over(wl))
      .withColumn("quartile", expr(
        """CASE WHEN __rn <= (__n % 4) * (__n div 4 + 1)
          |     THEN (__rn - 1) div (__n div 4 + 1) + 1
          |     ELSE __n % 4 + (__rn - (__n % 4) * (__n div 4 + 1) - 1) div (__n div 4) + 1
          |END""".stripMargin).cast("long"))
      .select($"o_orderstatus", $"o_orderkey", $"o_orderpriority",
        $"rk", $"drk", $"prk", $"quartile")
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val q26Sql: String =
    """SELECT o_orderstatus, o_orderkey, o_orderpriority,
      |  RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rk,
      |  DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drk,
      |  PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS prk,
      |  NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
      |FROM orders
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** UNPIVOT (melt) — the inverse reshape of q17's pivot: four measure
    * columns become (metric, value) long-form rows via the typed
    * `Dataset.unpivot` API (Spark's `Expand` operator underneath — a
    * pure per-row flatMap, no shuffle; output is 4× the rows but the
    * plan stays one scan → expand → sort). Long-form is what a metrics
    * warehouse or a plotting/feature pipeline ingests.
    */
  def q66Unpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_orderkey" < 200)
      .unpivot(
        ids = Array($"l_orderkey", $"l_linenumber"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "metric",
        valueColumnName = "value")
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        $"metric", $"value")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric")
  }

  // portable long-form construction: UNION ALL (DuckDB's UNPIVOT keyword
  // would also work, but the union is dialect-free and plans identically)
  val q66Sql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      |WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Scalar-function pack (F9/F10 + math): clamps, abs, sqrt (IEEE
    * correctly-rounded — transcendentals are deliberately absent, libm
    * implementations differ in the last bit), floor/ceil, integer mod,
    * sign, conditional NULLIF/COALESCE.
    */
  def q27ScalarPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_orderkey" < 500)
      .select($"l_orderkey", $"l_linenumber",
        least($"l_quantity", lit(25.0)).as("clamped_lo"),
        greatest($"l_quantity", lit(10.0)).as("clamped_hi"),
        abs($"l_discount" - 0.05).as("disc_dev"),
        sqrt($"l_quantity").as("sqrt_qty"),
        floor($"l_extendedprice" / 1000.0).cast("long").as("price_k"),
        ceil($"l_quantity" / 7.0).cast("long").as("qty_ceil7"),
        ($"l_orderkey" % 7).as("key_mod7"),
        signum($"l_discount" - 0.05).cast("long").as("disc_sign"),
        coalesce(nullif($"l_returnflag", lit("N")), lit("kept")).as("flag_or_kept"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q27Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  LEAST(l_quantity, 25.0) AS clamped_lo,
      |  GREATEST(l_quantity, 10.0) AS clamped_hi,
      |  ABS(l_discount - 0.05) AS disc_dev,
      |  SQRT(l_quantity) AS sqrt_qty,
      |  CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
      |  CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
      |  l_orderkey % 7 AS key_mod7,
      |  CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign,
      |  COALESCE(NULLIF(l_returnflag, 'N'), 'kept') AS flag_or_kept
      |FROM lineitem
      |WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Theta self-join: nation pairs within the same region (non-equi
    * condition on keys; the equality on region makes it a hash join with
    * a range residual, not a cartesian).
    */
  def q28ThetaJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = nation(s, d)
    n.as("a").join(n.as("b"),
        $"a.n_regionkey" === $"b.n_regionkey" && $"a.n_nationkey" < $"b.n_nationkey")
      .select($"a.n_regionkey".as("regionkey"),
        $"a.n_name".as("nation_a"), $"b.n_name".as("nation_b"))
      .orderBy($"regionkey", $"nation_a", $"nation_b")
  }

  val q28Sql: String =
    """SELECT a.n_regionkey AS regionkey, a.n_name AS nation_a, b.n_name AS nation_b
      |FROM nation a JOIN nation b
      |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |ORDER BY regionkey, nation_a, nation_b""".stripMargin

  /** Exact median (percentile_cont 0.5) of quantity per return flag —
    * safe cross-engine because quantities are small integral doubles, so
    * both interpolation formulas hit exact midpoints.
    */
  def q29Median(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q29Sql: String =
    """SELECT l_returnflag, QUANTILE_CONT(l_quantity, 0.5) AS median_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_cube" -> (q16Cube _),
    "q17_pivot" -> (q17Pivot _),
    "q18_sessionize" -> (q18Sessionize _),
    "q164_session_overlap_join" -> (q164SessionOverlapJoin _),
    "q19_running_total" -> (q19RunningTotal _),
    "q26_window_ranks" -> (q26WindowRanks _),
    "q27_scalar_pack" -> (q27ScalarPack _),
    "q28_theta_join" -> (q28ThetaJoin _),
    "q29_median" -> (q29Median _),
    "q66_unpivot" -> (q66Unpivot _),
  )

  val oracles: Map[String, String] = Map(
    "q16_cube" -> q16Sql,
    "q17_pivot" -> q17Sql,
    "q18_sessionize" -> q18Sql,
    "q164_session_overlap_join" -> q164Sql,
    "q19_running_total" -> q19Sql,
    "q26_window_ranks" -> q26Sql,
    "q27_scalar_pack" -> q27Sql,
    "q28_theta_join" -> q28Sql,
    "q29_median" -> q29Sql,
    "q66_unpivot" -> q66Sql,
  )
}
