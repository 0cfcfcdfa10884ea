package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}
import graft.sources.Tables._

/** Third batch: GROUPING SETS (SQL entry point), map/array scalar
  * functions over the JSON payload, and approximate distinct counting.
  */
object Relational3 {

  /** GROUPING SETS via the spark.sql entry point (the DataFrame API only
    * exposes rollup/cube) — also exercises temp-view registration.
    */
  def q44GroupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(1) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  val q44Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Map + array scalar functions over the JSON props payload: parse to a
    * typed map, extract keys/values, build and manipulate arrays
    * (§2.6 F11 + the array/map surface the reference lacks).
    */
  def q45MapArrayFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("m", from_json($"props", MapType(StringType, LongType)))
      .withColumn("arr", array($"value", $"value" * 2, -$"value"))
      .select(
        $"event_id",
        concat_ws(",", map_keys($"m")).as("keys_csv"),
        element_at($"m", "k").as("k_val"),
        size($"m").cast("long").as("n_keys"),
        sort_array($"arr").getItem(0).as("arr_min"),
        element_at(slice(sort_array($"arr", asc = false), 1, 2), 1).as("arr_max"),
        array_contains($"arr", $"value").as("has_value"))
      .orderBy($"event_id")
  }

  val q45Sql: String =
    """SELECT event_id,
      |  ARRAY_TO_STRING(json_keys(props), ',') AS keys_csv,
      |  CAST(props->>'$.k' AS BIGINT) AS k_val,
      |  CAST(LEN(json_keys(props)) AS BIGINT) AS n_keys,
      |  LIST_SORT([value, value * 2, -value])[1] AS arr_min,
      |  LIST_SORT([value, value * 2, -value], 'DESC')[1] AS arr_max,
      |  LIST_CONTAINS([value, value * 2, -value], value) AS has_value
      |FROM events ORDER BY event_id""".stripMargin

  /** Approximate distinct (HLL++) next to the exact count — Spark-only
    * (sketch encodings are engine-specific), rows-only driver check; the
    * ScalaTest spec asserts the approximation error bound instead.
    */
  def q46ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.01).as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_grouping_sets" -> (q44GroupingSets _),
    "q45_map_array_funcs" -> (q45MapArrayFuncs _),
    "q46_approx_distinct" -> (q46ApproxDistinct _),
  )

  val oracles: Map[String, String] = Map(
    "q44_grouping_sets" -> q44Sql,
    "q45_map_array_funcs" -> q45Sql,
  )
}
