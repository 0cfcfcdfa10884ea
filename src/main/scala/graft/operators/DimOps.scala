package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Lake-maintenance operator queries: CDC / slowly-changing-dimension
  * history ([[graft.lake.Scd2Writer]], q168) and physical-layout
  * economics ([[graft.lake.Compactor.zOrderRewrite]], q171).
  */
object DimOps {

  /** q168 — incremental SCD2 dimension maintenance, batch-replay
    * oracle-checked (the q160 discipline): orders are a CDC event
    * stream over each customer's order-priority tier (entity =
    * o_custkey, attr = o_orderpriority, event time = o_orderdate, seq =
    * o_orderkey), delivered as four event-time-ordered yearly batches
    * through the REAL [[graft.lake.Scd2Writer.mergeScd2]] — four full
    * write/read/merge cycles against a scratch dimension lake — and the
    * final read-back must hash-equal the one-pass full-history window
    * the DuckDB oracle computes. That equality checks the whole
    * contract at once: run collapse (consecutive equal priorities open
    * no version), batch-boundary invisibility (a batch starting with
    * the stored current attr opens no version), close-out polarity
    * (the prior version's valid_to = the change's event time, and its
    * stale `current` row is retired from the current partition), and
    * the late/duplicate guard (absorbed redeliveries — exercised
    * directly in Scd2WriterSpec).
    *
    * Scale: each merge shuffles the BATCH once on entity_id and prunes
    * its dimension read to state=current × touched hash buckets — the
    * ever-growing closed history is never read; see Scd2Writer's
    * layout notes for the 100 TB posture.
    */
  def q168Scd2Replay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = orders(s, d)
      .filter($"o_custkey".isNotNull && $"o_orderpriority".isNotNull &&
        $"o_orderdate".isNotNull && $"o_orderkey".isNotNull)
      .select($"o_custkey".as("entity_id"), $"o_orderpriority".as("attr"),
        $"o_orderdate".as("ts"), $"o_orderkey".as("seq"),
        year($"o_orderdate").as("yr"))
      .localCheckpoint() // one orders scan feeds the four batch filters
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val dim = s"$wh/graft_scd2_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, dim)
    // event-time-ordered batches (ties inside one year never straddle a
    // boundary) — the premise of the replay ≡ full-history equivalence
    Seq($"yr" <= 1996, $"yr" === 1997 || $"yr" === 1998,
        $"yr" === 1999 || $"yr" === 2000, $"yr" >= 2001)
      .foreach { cond =>
        graft.lake.Scd2Writer.mergeScd2(s, ev.filter(cond).drop("yr"), dim)
      }
    graft.lake.Scd2Writer.readDim(s, dim)
      .select($"entity_id".as("custkey"), $"attr".as("priority"),
        $"valid_from", $"since_order",
        // lake rows keep NULL valid_to for open versions; the query
        // surfaces the SCD2 high-date sentinel (2200-01-01 — inside the
        // ns-datetime range of the driver's comparator, which also
        // cannot round-trip a NULL timestamp cell)
        coalesce($"valid_to", lit("2200-01-01 00:00:00").cast("timestamp"))
          .as("valid_to"),
        $"is_current")
      .orderBy($"custkey", $"valid_from", $"since_order")
  }

  /** One-pass full-history SCD2 as a window chain — what the four
    * incremental merges must reproduce exactly.
    */
  val q168Sql: String =
    """WITH ev AS (
      |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
      |         o_orderdate AS ts, o_orderkey AS seq
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
      |    AND o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
      |), chg AS (
      |  SELECT custkey, priority, ts, seq FROM (
      |    SELECT custkey, priority, ts, seq,
      |           LAG(priority) OVER (PARTITION BY custkey ORDER BY ts, seq) AS prev
      |    FROM ev)
      |  WHERE prev IS NULL OR priority <> prev
      |)
      |SELECT custkey, priority, ts AS valid_from, seq AS since_order,
      |       COALESCE(LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, seq),
      |                TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
      |       LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, seq) IS NULL AS is_current
      |FROM chg
      |ORDER BY custkey, valid_from, since_order""".stripMargin

  /** q171 — Z-order layout skipping audit: the decision query behind
    * [[graft.lake.Compactor.zOrderRewrite]] (would re-clustering the
    * events lake on the Morton curve of (user, hour) actually pay?).
    * Events map to the two normalized dimensions (user_id; hour bucket
    * relative to the corpus minimum — both ≤ 2¹⁶ here, the
    * [[graft.functions.ZInterleave]] normalization contract), and two
    * candidate file layouts are simulated arithmetically: `time` =
    * 4-hour slabs (what a time-sorted ingest naturally writes) and
    * `zorder` = 1024-wide Morton-key ranges. For the data-derived 10 %
    * query box ([0, max_user div 10] × [0, span div 10]) each layout
    * reports how many files footer min/max statistics would FAIL to
    * prune and how many rows those surviving files hold — time-sorted
    * files span every user (umin = 0, nothing user-prunes), Morton
    * files are tight in both dims, and the rows-scanned gap between the
    * two rows of output IS the audit's answer. File-level ground truth
    * for the real writer lives in CompactorSpec (input_file_name spans
    * after an actual zOrderRewrite).
    *
    * Scale: one events pass computes dims + both file keys (the bounds
    * are a 1-row broadcast); per-layout stats are partial-combine
    * aggregates on file ids — file-count-sized, never row-sized; the
    * final roll-up is per-layout single-row. All bit/div math, engine-
    * exact against the oracle's arithmetic expansion of the interleave.
    */
  def q171ZorderSkipping(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val ev = events(s, d)
      .filter($"event_id".isNotNull && $"user_id".isNotNull && $"ts".isNotNull)
      .select($"user_id".as("u"), expr("unix_micros(ts) div 3600000000L").as("hb"))
    val bounds = ev.agg(min($"hb").as("hb0"), max($"hb").as("hb1"),
      max($"u").as("u1"))
    val keyed = ev.crossJoin(broadcast(bounds))
      .select($"u", ($"hb" - $"hb0").as("h"),
        expr("u1 div 10").as("uhi"), expr("(hb1 - hb0) div 10").as("hhi"))
      .withColumn("zf", expr("z_interleave16(u, h) div 1024"))
      .withColumn("tf", expr("h div 4"))
      .localCheckpoint() // one scan feeds both layout roll-ups
    def layout(name: String, fid: org.apache.spark.sql.Column): DataFrame =
      keyed.groupBy(fid.as("fid"))
        .agg(count(lit(1)).as("n"), min($"u").as("umin"), min($"h").as("hmin"),
          max($"uhi").as("uhi"), max($"hhi").as("hhi"))
        // the box starts at 0, so a file survives pruning iff both its
        // mins sit at or below the box's upper corner
        .withColumn("hit", ($"umin" <= $"uhi" && $"hmin" <= $"hhi").cast("long"))
        .agg(count(lit(1)).as("n_files"), sum($"hit").as("files_hit"),
          sum(expr("hit * n")).as("rows_in_hit_files"), sum($"n").as("total_rows"))
        .select(lit(name).as("layout"), $"n_files", $"files_hit".cast("long"),
          $"rows_in_hit_files".cast("long"), $"total_rows".cast("long"))
        .toDF("layout", "n_files", "files_hit", "rows_in_hit_files", "total_rows")
    layout("time", $"tf").unionByName(layout("zorder", $"zf"))
      .orderBy($"layout")
  }

  /** The same two simulated layouts, with the Morton interleave expanded
    * arithmetically (bit b of u → 2b, bit b of h → 2b+1).
    */
  val q171Sql: String = {
    val z = (0 until 16).map(b =>
      s"((((u >> $b) & 1) << ${2 * b}) | (((h >> $b) & 1) << ${2 * b + 1}))")
      .mkString(" | ")
    s"""WITH ev AS (
       |  SELECT user_id AS u, EPOCH_US(ts) // 3600000000 AS hb
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
       |), b AS (
       |  SELECT MIN(hb) AS hb0, MAX(hb) AS hb1, MAX(u) AS u1 FROM ev
       |), keyed AS (
       |  SELECT u, hb - hb0 AS h, u1 // 10 AS uhi, (hb1 - hb0) // 10 AS hhi,
       |         ($z) // 1024 AS zf, (hb - hb0) // 4 AS tf
       |  FROM (SELECT u, hb, hb0, hb1, u1, hb - hb0 AS h FROM ev, b) t
       |), zfiles AS (
       |  SELECT zf AS fid, COUNT(*) AS n, MIN(u) AS umin, MIN(h) AS hmin,
       |         MAX(uhi) AS uhi, MAX(hhi) AS hhi
       |  FROM keyed GROUP BY 1
       |), tfiles AS (
       |  SELECT tf AS fid, COUNT(*) AS n, MIN(u) AS umin, MIN(h) AS hmin,
       |         MAX(uhi) AS uhi, MAX(hhi) AS hhi
       |  FROM keyed GROUP BY 1
       |), s AS (
       |  SELECT 'zorder' AS layout, COUNT(*) AS n_files,
       |    CAST(SUM(CASE WHEN umin <= uhi AND hmin <= hhi THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |    CAST(SUM(CASE WHEN umin <= uhi AND hmin <= hhi THEN n ELSE 0 END) AS BIGINT) AS rows_in_hit_files,
       |    CAST(SUM(n) AS BIGINT) AS total_rows
       |  FROM zfiles
       |  UNION ALL
       |  SELECT 'time', COUNT(*),
       |    CAST(SUM(CASE WHEN umin <= uhi AND hmin <= hhi THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN umin <= uhi AND hmin <= hhi THEN n ELSE 0 END) AS BIGINT),
       |    CAST(SUM(n) AS BIGINT)
       |  FROM tfiles
       |)
       |SELECT layout, n_files, files_hit, rows_in_hit_files, total_rows
       |FROM s ORDER BY layout""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q168_scd2_replay" -> (q168Scd2Replay _),
    "q171_zorder_skipping" -> (q171ZorderSkipping _)
  )

  val oracles: Map[String, String] = Map(
    "q168_scd2_replay" -> q168Sql,
    "q171_zorder_skipping" -> q171Sql
  )
}
