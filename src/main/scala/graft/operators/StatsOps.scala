package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * correctly-rounded integer→double casts. Scales are chosen so every
  * cleared-denominator co-moment stays below 2^63 at oracle scale —
  * int64-range casts are bit-identical across engines, avoiding the
  * double-rounding hazard of wider values.
  *
  * Scale shape: ONE partial+final aggregation over the fact table (the
  * six sums are mergeable, so map-side combine applies); the per-group
  * statistic math runs on a |groups|-row relation. This is the textbook
  * single-pass distributed formulation — no second scan, no collect.
  */
object StatsOps {

  /** corr / covar_pop / regr_slope / regr_intercept / stddev_pop of
    * (l_quantity, l_extendedprice) per return flag. x = quantity at
    * cent precision (×100), y = extendedprice at unit precision — the
    * asymmetric scales keep n·Σy² − (Σy)² within int64 at sf0.01.
    */
  def q77CorrStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = lineitem(s, d).select($"l_returnflag",
      floor($"l_quantity" * 100).cast("decimal(38,0)").as("x"),
      floor($"l_extendedprice").cast("decimal(38,0)").as("y"))
    val st = e.groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    val covnum = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val varx = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val vary = ($"n" * $"syy" - $"sy" * $"sy").cast("double")
    val nD = $"n".cast("double")
    st.select(
      $"l_returnflag",
      $"n".cast("long").as("n"),
      ($"n" * $"sxy" - $"sx" * $"sy").cast("long").as("cov_num_fxp"),
      (covnum / sqrt(varx * vary)).as("corr_qty_price"),
      (covnum / (nD * nD) / 100.0).as("covar_pop"),
      (covnum / varx * 100.0).as("regr_slope"),
      (($"sy".cast("double") - covnum / varx * $"sx".cast("double")) / nD)
        .as("regr_intercept"),
      (sqrt(vary) / nD).as("stddev_pop_price"))
      .orderBy($"l_returnflag")
  }

  val q77Sql: String =
    """WITH e AS (
      |  SELECT l_returnflag,
      |    CAST(FLOOR(l_quantity * 100) AS HUGEINT) AS x,
      |    CAST(FLOOR(l_extendedprice) AS HUGEINT) AS y
      |  FROM lineitem
      |), st AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM e GROUP BY l_returnflag
      |), d AS (
      |  -- every co-moment fits int64 by scale choice; routing the DOUBLE
      |  -- casts through BIGINT makes them single hardware-rounded
      |  -- conversions (a direct HUGEINT->DOUBLE cast double-rounds
      |  -- negative values, diverging from Spark's decimal->double)
      |  SELECT l_returnflag, n,
      |    CAST(n * sxy - sx * sy AS BIGINT) AS covnum,
      |    CAST(n * sxx - sx * sx AS BIGINT) AS varxnum,
      |    CAST(n * syy - sy * sy AS BIGINT) AS varynum,
      |    CAST(sx AS BIGINT) AS sxb, CAST(sy AS BIGINT) AS syb
      |  FROM st
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  covnum AS cov_num_fxp,
      |  CAST(covnum AS DOUBLE)
      |    / SQRT(CAST(varxnum AS DOUBLE) * CAST(varynum AS DOUBLE))
      |    AS corr_qty_price,
      |  CAST(covnum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 100.0
      |    AS covar_pop,
      |  CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE) * 100.0
      |    AS regr_slope,
      |  (CAST(syb AS DOUBLE)
      |     - CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE)
      |       * CAST(sxb AS DOUBLE)) / CAST(n AS DOUBLE)
      |    AS regr_intercept,
      |  SQRT(CAST(varynum AS DOUBLE)) / CAST(n AS DOUBLE)
      |    AS stddev_pop_price
      |FROM d ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_corr_stats" -> (q77CorrStats _),
  )

  val oracles: Map[String, String] = Map(
    "q77_corr_stats" -> q77Sql,
  )
}
