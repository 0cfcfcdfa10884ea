package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.BloomAgg
import graft.sources.Tables._

/** Bloom-pruned semi join (q89) — the explicit runtime-filter operator:
  * build an 8 KiB [[graft.functions.BloomAgg]] sketch of the dim-side
  * keys (high-value orders), broadcast it as a one-row relation, prune
  * the fact side with the codegen'd `bloom_contains` probe BEFORE the
  * exact semi join, then let the semi join remove the (≲0.1% here)
  * false positives — so the result is EXACTLY the plain semi join the
  * oracle runs, while the fact-side shuffle carries only rows that
  * (almost certainly) survive.
  *
  * Why this matters at 100 TB: when the key side is too big to
  * broadcast as a hash join (the semi join becomes shuffle-on-both-
  * sides), the 8 KiB sketch still broadcasts — the fact table's shuffle
  * volume drops by the filter's selectivity (~80% here) for the cost of
  * one map-side probe per row. This is Spark's own
  * `runtime.bloomFilter` optimization surfaced as a composable,
  * deterministic operator (fixed splitmix64 hashing → identical
  * pruning on every engine, partitioning, and re-run).
  */
object RuntimeFilter {

  /** The sketch reaches the probe as an UNCORRELATED SCALAR SUBQUERY —
    * deliberately. Joining the one-row sketch relation in and filtering
    * on the joined column reads naturally, but Catalyst then treats the
    * probe as a join condition and `PushDownLeftSemiAntiJoin` pushes
    * the EXACT semi join underneath it (observed), so the "prune"
    * would run on rows the join already filtered — useless. A scalar
    * subquery instead plans as a one-time subquery job whose 8 KiB
    * result feeds a plain Filter that STAYS on the fact scan below the
    * join — the same execution shape as Spark's injected runtime bloom
    * filters (BloomSpec pins the placement).
    */
  def q89BloomSemi(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    s.udf.register("bloom_agg", BloomAgg())
    orders(s, d).createOrReplaceTempView("g89_orders")
    lineitem(s, d).createOrReplaceTempView("g89_lineitem")
    s.sql(
      """SELECT l_orderkey, COUNT(*) AS n_items,
        |  CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_qty,
        |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_price
        |FROM g89_lineitem
        |WHERE bloom_contains(
        |        (SELECT bloom_agg(o_orderkey) FROM g89_orders WHERE o_totalprice > 400000.0),
        |        l_orderkey)
        |  AND l_orderkey IN (SELECT o_orderkey FROM g89_orders WHERE o_totalprice > 400000.0)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin)
  }

  val q89Sql: String =
    """SELECT l_orderkey, COUNT(*) AS n_items,
      |  CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_qty,
      |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) * 10000) AS DOUBLE) / 10000.0 AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_bloom_semi" -> (q89BloomSemi _),
  )

  val oracles: Map[String, String] = Map(
    "q89_bloom_semi" -> q89Sql,
  )
}
