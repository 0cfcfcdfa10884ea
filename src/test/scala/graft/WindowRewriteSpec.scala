package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Relational, Relational2}
import graft.sources.Tables

/** The q11/q26 scale rewrites (salted two-phase top-k; count-derived
  * ranks + two-pass bucketed row_number for ntile) promise BIT-IDENTICAL
  * output to the naive single-window formulations they replace — the
  * oracle gate checks them against SQL, but this spec pins the parity
  * directly against the Spark windows so a drift can't hide behind a
  * matching-but-weaker oracle.
  */
class WindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("q11 salted two-phase top-k equals the naive single window") {
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val naive = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderstatus", $"rn".cast("long").as("rn"), $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderstatus", $"rn")
      .collect().toSeq
    val got = Relational.q11TopKPerGroup(spark, sf).collect().toSeq
    assert(got == naive)
  }

  test("q26 count-derived ranks + bucketed ntile equal the naive windows") {
    val byPriority = Window.partitionBy($"o_orderstatus").orderBy($"o_orderpriority")
    val unique = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    val naive = Tables.orders(spark, sf)
      .select($"o_orderstatus", $"o_orderkey", $"o_orderpriority",
        rank().over(byPriority).cast("long").as("rk"),
        dense_rank().over(byPriority).cast("long").as("drk"),
        percent_rank().over(byPriority).as("prk"),
        ntile(4).over(unique).cast("long").as("quartile"))
      .orderBy($"o_orderstatus", $"o_orderkey")
      .collect().toSeq
    val got = Relational2.q26WindowRanks(spark, sf).collect().toSeq
    assert(got == naive)
  }
}
