package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Extended statistical aggregates: covariance, correlation, simple linear
  * regression (slope/intercept), population stddev — the `corr`/`covar_pop`/
  * `regr_*` surface every OLAP engine ships.
  *
  * Built-in streaming co-moment implementations (Welford-style) are
  * aggregation-ORDER-dependent in the last float bits, so results differ
  * across partitionings and engines. Instead every statistic here is
  * derived from exact integer co-moment sums (the q70 fixed-point idiom):
  * quantize inputs by FLOOR into integers, aggregate n, Σx, Σy, Σxy, Σx²,
  * Σy² exactly (DECIMAL(38,0) in Spark, HUGEINT in DuckDB), then compute
  * each statistic with one fixed scalar op chain over single
  * correctly-rounded integer→double casts.
  *
  * Int64 headroom: the cleared-denominator co-moments n·Σxy − Σx·Σy grow
  * as n²·var — past int64 around 10⁵ rows/group (sf0.1) — so each is
  * reduced by an EXACT floor-division by n before the int64 cast:
  * floordiv(a,n) = (a − pmod(a,n)) div n, where pmod/div are identical
  * integer ops in Spark (decimal `%`, `div`) and DuckDB (hugeint `%`,
  * `//`; the subtraction makes the numerator exactly divisible, so any
  * trunc-vs-floor convention difference is moot). The reduced co-moments
  * grow as n·var: with x = qty in cents (var≈2·10⁶) and y = price in
  * hundreds (var≈10⁵), they stay under 2⁶³ to n ≈ 10¹² rows per group —
  * past 100 TB. The 1/n flooring perturbs each statistic by ≤1/reduced
  * value (relative ~10⁻¹⁰), identically in both engines.
  *
  * Quantization note: y = floor(price/100) means the price-side moments
  * are over prices rounded down to hundreds; uniform quantization noise
  * adds ~100²/12 to var(y·100) ≈ 10⁹ — relative bias ~10⁻⁶ on stddev,
  * zero on determinism. (Finer y at unit precision would overflow the
  * reduced vary around n≈10¹⁰, inside the 100 TB envelope.)
  *
  * Scale shape: ONE partial+final aggregation over the fact table (the
  * six sums are mergeable, so map-side combine applies); the per-group
  * statistic math runs on a |groups|-row relation. This is the textbook
  * single-pass distributed formulation — no second scan, no collect.
  */
object StatsOps {

  /** corr / covar_pop / regr_slope / regr_intercept / stddev_pop of
    * (l_quantity, price-in-hundreds) per return flag. x = quantity at
    * cent precision (×100), y = extendedprice at hundreds (÷100); the
    * derived stats are reported in (qty, price) units via fixed scale
    * factors (qx = x/100, qy = 100·y).
    */
  def q77CorrStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // widen: five decimal(38,0) co-moment sums per row otherwise
    // serialize in the single-split scan stage (no-op on a real scan)
    val e = Fanout.widen(lineitem(s, d), $"l_orderkey")
      .select($"l_returnflag",
        floor($"l_quantity" * 100).cast("decimal(38,0)").as("x"),
        floor($"l_extendedprice" / 100).cast("decimal(38,0)").as("y"))
    val st = e.groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .withColumn("covnum", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("varxnum", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("varynum", $"n" * $"syy" - $"sy" * $"sy")
      // exact floor-division by n → int64-safe reduced co-moments (long)
      .withColumn("cr", expr("(covnum - ((covnum % n + n) % n)) div n"))
      .withColumn("vxr", expr("(varxnum - ((varxnum % n + n) % n)) div n"))
      .withColumn("vyr", expr("(varynum - ((varynum % n + n) % n)) div n"))
    val crD = $"cr".cast("double")
    val vxrD = $"vxr".cast("double")
    val vyrD = $"vyr".cast("double")
    val nD = $"n".cast("double")
    st.select(
      $"l_returnflag",
      $"n".cast("long").as("n"),
      $"cr".as("cov_num_red"),
      // scale factors: cov(qx,qy) = covnum/n² (cents × hundreds cancel)
      (crD / sqrt(vxrD * vyrD)).as("corr_qty_price"),
      (crD / nD).as("covar_pop"),
      (crD * 10000.0 / vxrD).as("regr_slope"),
      (($"sy".cast("double") * 100.0
        - crD * 10000.0 / vxrD * ($"sx".cast("double") / 100.0)) / nD)
        .as("regr_intercept"),
      (sqrt(vyrD / nD) * 100.0).as("stddev_pop_price"))
      .orderBy($"l_returnflag")
  }

  val q77Sql: String =
    """WITH e AS (
      |  SELECT l_returnflag,
      |    CAST(FLOOR(l_quantity * 100) AS HUGEINT) AS x,
      |    CAST(FLOOR(l_extendedprice / 100) AS HUGEINT) AS y
      |  FROM lineitem
      |), st AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM e GROUP BY l_returnflag
      |), cm AS (
      |  SELECT *, n * sxy - sx * sy AS covnum,
      |    n * sxx - sx * sx AS varxnum,
      |    n * syy - sy * sy AS varynum
      |  FROM st
      |), d AS (
      |  -- exact floor-division by n: subtracting pmod makes the numerator
      |  -- exactly divisible, so // is exact and the BIGINT cast is safe
      |  -- (reduced co-moments grow as n*var, not n^2*var)
      |  SELECT l_returnflag, n,
      |    CAST((covnum - ((covnum % n + n) % n)) // n AS BIGINT) AS cr,
      |    CAST((varxnum - ((varxnum % n + n) % n)) // n AS BIGINT) AS vxr,
      |    CAST((varynum - ((varynum % n + n) % n)) // n AS BIGINT) AS vyr,
      |    CAST(sx AS BIGINT) AS sxb, CAST(sy AS BIGINT) AS syb
      |  FROM cm
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  cr AS cov_num_red,
      |  CAST(cr AS DOUBLE)
      |    / SQRT(CAST(vxr AS DOUBLE) * CAST(vyr AS DOUBLE))
      |    AS corr_qty_price,
      |  CAST(cr AS DOUBLE) / CAST(n AS DOUBLE) AS covar_pop,
      |  CAST(cr AS DOUBLE) * 10000.0 / CAST(vxr AS DOUBLE) AS regr_slope,
      |  (CAST(syb AS DOUBLE) * 100.0
      |     - CAST(cr AS DOUBLE) * 10000.0 / CAST(vxr AS DOUBLE)
      |       * (CAST(sxb AS DOUBLE) / 100.0)) / CAST(n AS DOUBLE)
      |    AS regr_intercept,
      |  SQRT(CAST(vyr AS DOUBLE) / CAST(n AS DOUBLE)) * 100.0
      |    AS stddev_pop_price
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** q98 — multi-quantile `percentile_cont` (p25/p50/p75/p95 of value
    * per event type) with EXPLICIT order-statistic interpolation, so
    * both engines run one identical IEEE chain: lo and hi are exact
    * parquet doubles picked by row_number, h = (n−1)·p and the mix
    * lo + (hi−lo)·(h−⌊h⌋) are exactly-rounded ops. (q29 leans on
    * Spark's `percentile` ≡ DuckDB's QUANTILE_CONT only at exact
    * midpoints of integral values; this formulation is safe at ANY p
    * over ANY doubles.)
    *
    * Scale shape: exact quantiles need the per-group sort — ONE
    * shuffle on the group key, one sorted pass computing both window
    * functions (row_number shares count's partitioning), then a
    * map-side-partial conditional agg touching 8 rows per group. The
    * sketch-based alternative for when the sort is too dear is q46's
    * approx tier.
    */
  def q98Percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ps = Seq(0.25 -> "25", 0.5 -> "50", 0.75 -> "75", 0.95 -> "95")
    val wOrd = Window.partitionBy($"event_type").orderBy($"value")
    val wAll = Window.partitionBy($"event_type")
    val r = events(s, d).select($"event_type", $"value")
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val aggs = ps.flatMap { case (p, sfx) =>
      val h = ($"n" - 1) * p
      Seq(max(when($"rn" === floor(h) + 1, $"value")).as(s"lo$sfx"),
        max(when($"rn" === ceil(h) + 1, $"value")).as(s"hi$sfx"))
    }
    val g = r.groupBy($"event_type").agg(max($"n").as("n"), aggs: _*)
    val qcols = ps.map { case (p, sfx) =>
      val h = ($"n" - 1) * p
      (col(s"lo$sfx") + (col(s"hi$sfx") - col(s"lo$sfx")) * (h - floor(h)))
        .as(s"p$sfx")
    }
    g.select(($"event_type" +: $"n" +: qcols): _*).orderBy($"event_type")
  }

  val q98Sql: String = {
    val ps = Seq("0.25" -> "25", "0.5" -> "50", "0.75" -> "75", "0.95" -> "95")
    // CAST(p AS DOUBLE): a bare 0.95 is DECIMAL in DuckDB, making
    // h − ⌊h⌋ EXACT (0.35) where Spark's double chain gives
    // 0.34999…905 — the literal's type must match Spark's DoubleType
    // for the two engines to run the same IEEE chain
    val caseCols = ps.map { case (p, sfx) =>
      s"""    MAX(CASE WHEN rn = CAST(FLOOR((n-1)*CAST($p AS DOUBLE)) AS BIGINT)+1 THEN value END) AS lo$sfx,
         |    MAX(CASE WHEN rn = CAST(CEIL((n-1)*CAST($p AS DOUBLE)) AS BIGINT)+1 THEN value END) AS hi$sfx""".stripMargin
    }.mkString(",\n")
    val mixCols = ps.map { case (p, sfx) =>
      s"  lo$sfx + (hi$sfx - lo$sfx) * ((n-1)*CAST($p AS DOUBLE) - FLOOR((n-1)*CAST($p AS DOUBLE))) AS p$sfx"
    }.mkString(",\n")
    s"""WITH r AS (
       |  SELECT event_type, value,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events),
       |g AS (
       |  SELECT event_type, MAX(n) AS n,
       |$caseCols
       |  FROM r GROUP BY event_type)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |$mixCols
       |FROM g ORDER BY event_type""".stripMargin
  }

  /** q185 — rank-based feature normalization (quantile transform): the
    * ML-preprocessing staple that maps a feature to its empirical CDF
    * position — robust to outliers and distribution shape, the standard
    * alternative to z-scoring (q70) when a downstream model wants
    * uniform marginals. Per event_type series, value → exact integer
    * permille rank (rank−1)·1000 div (n−1); RANK (not row_number) so
    * tied raw values map to the SAME normalized value — a correctness
    * property of the transform, not a tie-break choice, and what keeps
    * the output engine-exact with no ordering assumptions beyond the
    * value comparison itself. Output is the audit form: per
    * (series, decile of the transform) the row count and permille
    * range — a quantile transform is CORRECT iff deciles hold ~n/10
    * rows each, which the row counts exhibit and the spec pins.
    *
    * Scale: one shuffle partitions by series and sorts by value — the
    * q18/q26 window shape (the rank rewrite lessons there apply as-is);
    * the decile audit is a partial-combine agg on (series, decile).
    */
  def q185RankNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value")
    val n = Window.partitionBy($"event_type")
    events(s, d)
      .filter($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type", $"value")
      .withColumn("rnk", rank().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .filter($"n" > 1)
      .withColumn("pm", expr("(rnk - 1) * 1000 div (n - 1)"))
      .groupBy($"event_type", expr("pm div 100").as("decile"))
      .agg(count(lit(1)).as("n_rows"),
        min($"pm").as("min_pm"), max($"pm").as("max_pm"))
      .orderBy($"event_type", $"decile")
  }

  val q185Sql: String =
    """WITH r AS (
      |  SELECT event_type,
      |         RANK() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |), pm AS (
      |  SELECT event_type, (rnk - 1) * 1000 // (n - 1) AS pm
      |  FROM r WHERE n > 1
      |)
      |SELECT event_type, pm // 100 AS decile,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       MIN(pm) AS min_pm, MAX(pm) AS max_pm
      |FROM pm GROUP BY 1, 2
      |ORDER BY event_type, decile""".stripMargin

  /** q193 — WEIGHTED median (lower weighted median: the first value, in
    * value order, whose cumulative weight reaches half the total): the
    * class-imbalance-aware center every sampling/pricing pipeline wants
    * when rows carry multiplicities — here the quantity-weighted median
    * extended price per return flag ("the price level at which half the
    * UNITS ship", not half the line items — the two diverge whenever
    * price correlates with lot size, which the audit shows). q29/q98
    * own the unweighted quantile surface; weights change the algorithm
    * (cumulative-weight threshold, not rank), so this is its own
    * operator. Quantities are integral by data contract (cast-to-long
    * exactness checked by the hash itself), so the threshold compare
    * 2·cumw ≥ totw is all-integer; ties in price break by
    * (orderkey, linenumber) identically in both engines.
    *
    * Scale: one shuffle partitions by flag and sorts by value — the
    * q26 rank-window shape; cumulative and total weights ride the same
    * sort, the qualifying-row pick is one more window over it.
    */
  def q193WeightedMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
    val li = lineitem(s, d)
      .filter($"l_returnflag".isNotNull && $"l_extendedprice".isNotNull &&
        $"l_quantity".isNotNull && $"l_orderkey".isNotNull &&
        $"l_linenumber".isNotNull)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
        $"l_linenumber", $"l_quantity".cast("long").as("wt"))
    li.withColumn("cumw",
        sum($"wt").over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("totw",
        sum($"wt").over(Window.partitionBy($"l_returnflag")))
      .filter($"cumw" * 2 >= $"totw")
      .withColumn("rn", row_number().over(ord))
      .filter($"rn" === 1)
      .select($"l_returnflag", $"l_extendedprice".as("weighted_median_price"),
        $"totw".as("total_units"))
      .orderBy($"l_returnflag")
  }

  val q193Sql: String =
    """WITH li AS (
      |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
      |         CAST(l_quantity AS BIGINT) AS wt
      |  FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND l_quantity IS NOT NULL AND l_orderkey IS NOT NULL
      |    AND l_linenumber IS NOT NULL
      |), cw AS (
      |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
      |    SUM(wt) OVER (PARTITION BY l_returnflag
      |                  ORDER BY l_extendedprice, l_orderkey, l_linenumber
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(wt) OVER (PARTITION BY l_returnflag) AS totw
      |  FROM li
      |), q AS (
      |  SELECT l_returnflag, l_extendedprice, totw,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |                       ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |  FROM cw WHERE cumw * 2 >= totw
      |)
      |SELECT l_returnflag, l_extendedprice AS weighted_median_price,
      |       CAST(totw AS BIGINT) AS total_units
      |FROM q WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin

  /** q197 — revenue CONCENTRATION audit (Pareto/Lorenz bands): what
    * share of revenue the top 1 % / top 10 % of customers carry — the
    * whale-dependence diagnostic behind every "80/20" claim, and for a
    * data pipeline the duplicate of q87's domain-cap question asked of
    * VALUE instead of volume. Customers rank by exact total revenue
    * (dsum — per-customer revenue is a quantized double, so the DESC
    * order is engine-identical; custkey tie-break); band cutoffs are
    * integer ceilings of n/100 and n/10; band revenue re-sums the
    * quantized per-customer values through DECIMAL so the permille
    * share is exact.
    *
    * Scale: one orders aggregate to the customer relation, one global
    * sort-rank over customers (q26's distributed-rank rewrites apply
    * when the entity count demands them), band roll-up on 3 cells.
    */
  def q197RevenueConcentration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = orders(s, d)
      .filter($"o_custkey".isNotNull && $"o_totalprice".isNotNull)
      .select($"o_custkey", $"o_totalprice")
      .localCheckpoint() // one scan feeds rank, band roll-up, and total
    val rev = base.groupBy($"o_custkey")
      .agg(graft.functions.Exact.dsum($"o_totalprice").as("rev"))
    // customer relation is entity-sized (15 k at sf0.1) - the global
    // rank is a BoundedWindow in house style (warning-free constant key)
    val w = BoundedWindow.ordered($"o_custkey", $"rev".desc, $"o_custkey")
    val banded = rev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(BoundedWindow.all($"o_custkey")))
      .withColumn("band",
        when($"rn" * 100 <= $"n" + 99, "a_top1pct")
          .when($"rn" * 10 <= $"n" + 9, "b_top10pct")
          .otherwise("c_rest"))
      .select($"o_custkey", $"band")
    // band revenue re-derives from ORDER rows, not by re-summing the
    // quantized per-customer doubles - a second decimal pass over
    // already-floored doubles is exactly the down-scale-cast divergence
    // Exact.scala documents (caught by the hash in this query's first
    // formulation); the per-customer rev exists ONLY to rank
    val total = base.agg(graft.functions.Exact.dsum($"o_totalprice").as("t"))
    base.join(banded, Seq("o_custkey"))
      .groupBy($"band")
      .agg(countDistinct($"o_custkey").as("n_customers"),
        graft.functions.Exact.dsum($"o_totalprice").as("band_revenue"))
      .crossJoin(broadcast(total))
      .select($"band", $"n_customers", $"band_revenue",
        floor($"band_revenue" * 1000.0 / $"t").cast("long")
          .as("share_permille"))
      .orderBy($"band")
  }

  val q197Sql: String =
    """WITH base AS (
      |  SELECT o_custkey, o_totalprice FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      |), rev AS (
      |  SELECT o_custkey,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(38,10))) * 10000) AS DOUBLE)
      |      / 10000.0 AS rev
      |  FROM base GROUP BY 1
      |), banded AS (
      |  SELECT o_custkey,
      |    CASE WHEN rn * 100 <= n + 99 THEN 'a_top1pct'
      |         WHEN rn * 10 <= n + 9 THEN 'b_top10pct'
      |         ELSE 'c_rest' END AS band
      |  FROM (SELECT o_custkey,
      |          ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
      |          COUNT(*) OVER () AS n
      |        FROM rev)
      |), tot AS (
      |  SELECT CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(38,10))) * 10000) AS DOUBLE)
      |      / 10000.0 AS t
      |  FROM base
      |)
      |SELECT band, CAST(COUNT(DISTINCT b.o_custkey) AS BIGINT) AS n_customers,
      |  CAST(FLOOR(SUM(CAST(b.o_totalprice AS DECIMAL(38,10))) * 10000) AS DOUBLE)
      |    / 10000.0 AS band_revenue,
      |  CAST(FLOOR(
      |    CAST(FLOOR(SUM(CAST(b.o_totalprice AS DECIMAL(38,10))) * 10000) AS DOUBLE)
      |      / 10000.0 * 1000.0 / MAX(t)) AS BIGINT) AS share_permille
      |FROM base b JOIN banded USING (o_custkey), tot
      |GROUP BY band
      |ORDER BY band""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_corr_stats" -> (q77CorrStats _),
    "q98_percentiles" -> (q98Percentiles _),
    "q185_rank_normalize" -> (q185RankNormalize _),
    "q193_weighted_median" -> (q193WeightedMedian _),
    "q197_revenue_concentration" -> (q197RevenueConcentration _),
  )

  val oracles: Map[String, String] = Map(
    "q77_corr_stats" -> q77Sql,
    "q98_percentiles" -> q98Sql,
    "q185_rank_normalize" -> q185Sql,
    "q193_weighted_median" -> q193Sql,
    "q197_revenue_concentration" -> q197Sql,
  )
}
