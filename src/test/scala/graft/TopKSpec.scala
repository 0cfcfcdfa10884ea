package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational3
import graft.sources.Tables

/** The bounded-heap top-k aggregate must (a) equal the windowed
  * row_number formulation exactly and (b) actually plan as a
  * partial+final object aggregate — the map-side partial heap is the
  * entire point (shuffle ≤ k rows per group per map partition).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("q64 top-k aggregate equals the windowed row_number form") {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val naive = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn".cast("long").as("rn"), $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
      .collect().toSeq
    val got = Relational3.q64TopkAgg(spark, sf).collect().toSeq
    assert(got == naive)
  }

  test("top-k aggregate ties resolve to the smaller key; short groups keep all rows") {
    val df = Seq(
      ("g1", 5.0, 9L), ("g1", 5.0, 2L), ("g1", 5.0, 7L), ("g1", 1.0, 1L),
      ("g2", 3.0, 4L)).toDF("g", "price", "key")
    val top = graft.functions.TopK(3)
    val out = df.groupBy($"g").agg(top($"price", $"key").as("top"))
      .select($"g", $"top").as[(String, Seq[(Double, Long)])]
      .collect().toMap
    assert(out("g1") == Seq((5.0, 2L), (5.0, 7L), (5.0, 9L)))
    assert(out("g2") == Seq((3.0, 4L)))
  }

  test("top-k buffer ops are split-order insensitive (partial-agg soundness)") {
    // Spark may reduce/merge partial buffers in ANY grouping and order;
    // the result must always equal sorting the whole multiset and taking
    // k. Plain ScalaCheck (no scalatestplus bridge in the offline cache).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.{RankedRow, TopK}
    val agg = new TopK(3)
    val rowGen = Gen.zip(Gen.choose(0.0, 5.0), Gen.choose(0L, 20L))
      .map { case (p, k) => RankedRow(p, k) }
    val prop = Prop.forAll(Gen.listOf(rowGen), Gen.choose(1, 5)) { (rows, nSplits) =>
      val expected = rows
        .sortWith((a, b) => a.price > b.price || (a.price == b.price && a.key < b.key))
        .take(3)
      // arbitrary split → per-split reduce → left-fold merge
      val splits = rows.grouped(math.max(1, rows.size / nSplits + 1)).toList
      val merged = splits
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      merged == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("top-k plans as partial+final aggregation (map-side heaps)") {
    val p = Relational3.q64TopkAgg(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(500))
    assert(p.contains("partial_"), "expect a partial (map-side) aggregate before the shuffle")
  }

  test("long-keyed top-k orders ranks that collide as doubles") {
    // 2^53 and 2^53+1 are distinct longs but the SAME double — a
    // double-keyed heap would fall through to the key tiebreak and
    // invert them. TopKLong must keep the exact int64 order.
    import spark.implicits._
    val big = 1L << 53
    val rows = Seq((big, 1L), (big + 1L, 2L), (big - 2L, 3L))
      .toDF("priority", "key")
    val got = rows.agg(graft.functions.TopKLong(3)($"priority", $"key").as("top"))
      .selectExpr("transform(top, r -> r.key) AS ks").as[Seq[Long]].head()
    assert(got == Seq(2L, 1L, 3L), s"exact int64 ordering violated: $got")
  }
}
