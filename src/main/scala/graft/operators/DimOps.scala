package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Dimension-maintenance queries over the lake writers — the CDC /
  * slowly-changing-dimension family ([[graft.lake.Scd2Writer]]).
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q168_scd2_replay" -> (q168Scd2Replay _)
  )

  val oracles: Map[String, String] = Map(
    "q168_scd2_replay" -> q168Sql
  )
}
