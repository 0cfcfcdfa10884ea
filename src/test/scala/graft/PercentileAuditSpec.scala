package graft

import graft.operators.{Drift, StatsOps}
import org.apache.spark.sql.functions._

/** q98/q99 behaviors the sf0.01 oracle can't isolate: interpolation at
  * analytic points on a known series, and planted constraint
  * violations counted exactly once each.
  */
class PercentileAuditSpec extends SparkSpec {
  import spark.implicits._

  test("q98 interpolation hits analytic quantiles of 0..100") {
    val rows = (0 to 100).map(i =>
      (i.toLong, new java.sql.Timestamp(1609459200000L + i * 1000L), 1L, "click",
        i.toDouble, "{}"))
    val df = StatsOps.q98Percentiles(spark, dirWithEvents(rows))
    val r = df.head()
    assert(r.getAs[Long]("n") == 101L)
    assert(r.getAs[Double]("p25") == 25.0)
    assert(r.getAs[Double]("p50") == 50.0)
    assert(r.getAs[Double]("p75") == 75.0)
    assert(r.getAs[Double]("p95") == 95.0)
  }

  /** Write an events.parquet matching the testdata layout (nanos
    * timestamps are only a property of the driver's files; Tables.events
    * falls back to plain timestamp columns).
    */
  private def dirWithEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_p98d").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q101 PageRank: star-graph hub outranks its leaves, leaves tie") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p101").toString
    // customer 1 trades with suppliers 1..5 — a 5-leaf star
    (1L to 5L).map(i => (i, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    (1L to 5L).map(i => (i, i)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.GraphOps.q101PageRank(spark, dir)
      .select($"kind", $"rank_ppb").as[(String, Long)].collect()
    val hub = got.filter(_._1 == "customer").map(_._2)
    val leaves = got.filter(_._1 == "supplier").map(_._2)
    assert(hub.length == 1 && leaves.length == 5)
    assert(leaves.distinct.length == 1, s"symmetric leaves must tie: ${leaves.toSeq}")
    assert(hub.head > leaves.head, s"hub must outrank leaves: ${got.toSeq}")
    // mass conservation up to integer-division truncation: Σ ≤ 1e9,
    // within n·(iterations+1) ulps of it
    val total = got.map(_._2).sum
    assert(total <= 1000000000L && total > 999999000L, s"rank mass drifted: $total")
  }

  test("q102 BFS: path-graph distances are exact; nodes beyond 4 hops are absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p102").toString
    // chain: cust1 — supp1 — cust2 — supp2 — cust3 — supp3:
    // each order links one customer to one supplier; consecutive pairs
    // share a node, so hop distance from cust1 grows along the chain
    val links = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 2L, 2L),
      (4L, 3L, 2L), (5L, 3L, 3L))
    links.map { case (ok, ck, _) => (ok, ck) }
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    links.map { case (ok, _, sk) => (ok, sk) }
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.GraphOps.q102BfsDistance(spark, dir)
      .select(concat($"kind", lit(":"), $"node_id"), $"dist")
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "customer:1" -> 0L, "supplier:1" -> 1L, "customer:2" -> 2L,
      "supplier:2" -> 3L, "customer:3" -> 4L), // supplier:3 is 5 hops → absent
      s"got $got")
  }

  test("q108 triangles: planted K4 yields 3 per node; unsupported pair excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p108").toString
    // two orders each holding parts 1..4 → all 6 pairs supported (2 orders);
    // one order holding {1,5} → pair (1,5) seen once, below support → no edge
    val rows = (for (ok <- Seq(1L, 2L); p <- 1L to 4L) yield (ok, p)) :+
      (3L, 1L) :+ (3L, 5L)
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    (1L to 5L).map(p => (p, s"Brand#$p"))
      .toDF("p_partkey", "p_brand").write.parquet(s"$dir/part.parquet")
    val got = graft.operators.GraphOps.q108TriangleCount(spark, dir)
      .select($"p_partkey", $"n_tri", $"deg").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // K4 has 4 triangles; each vertex sits in C(3,2)=3 of them, degree 3
    assert(got.toSeq == (1L to 4L).map(p => (p, 3L, 3L)), s"got ${got.toSeq}")
  }

  test("q165 frequent triples: planted co-purchase triple counted exactly; sub-support triples absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p165").toString
    // customers 1,2,3 hold {1,2,3} (customer 1 across TWO orders — the
    // basket is the customer's lifetime set, counted once) → triple
    // (1,2,3) support 3; customer 4 holds {1,2,4} → every triple
    // containing 4 is support-1 and must be pruned (its sub-pairs
    // (1,4)/(2,4) are also sub-support, so the A-Priori prefix +
    // sub-pair semi joins cut it before the count — same answer)
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L)) ++ // customer 1: order 1 {1,2}, order 2 {3}
      (for (ok <- Seq(3L, 4L); p <- 1L to 3L) yield (ok, p)) ++ // customers 2, 3
      Seq((5L, 1L), (5L, 2L), (5L, 4L)) // customer 4
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    val got = graft.operators.GraphOps.q165FrequentTriples(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 3L)), s"got $got")
  }

  test("q136 k-core: pendants peel, the dense bipartite core survives with exact degrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p136").toString
    // K5,5 between customers 1..5 and suppliers 1..5 (one order per
    // pair) + pendant customers 6, 7 on suppliers 1, 2. Doubled edges
    // 54, nodes 12 → k = 54/12/2 = 2: the pendants (degree 1) peel in
    // round 1; everything else sits at degree ≥ 5 and stabilizes.
    val edges = (for (c <- 1L to 5L; s <- 1L to 5L) yield (c, s)) ++
      Seq((6L, 1L), (7L, 2L))
    edges.zipWithIndex.map { case ((c, _), i) => (i.toLong + 1, c) }
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    edges.zipWithIndex.map { case ((_, s), i) => (i.toLong + 1, s) }
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.GraphOps.q136KCorePeel(spark, dir)
      .as[(Long, Long, Boolean, Long)].collect().toSeq.sortBy(_._1)
    val expect = ((1L to 5L).map(c => (c * 2, 5L, true, 2L)) ++
      (1L to 5L).map(s => (s * 2 + 1, 5L, true, 2L))).sortBy(_._1)
    assert(got == expect, s"got $got")
  }

  test("q142 incremental CC: a delta edge MERGES two old components; untouched and increment-only components keep exact labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p142").toString
    val rows = Seq(
      // base component A: parts {1,2} co-purchased twice
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      // base component B: parts {5,6}
      (3L, 5L), (3L, 6L), (4L, 5L), (4L, 6L),
      // bridge pair (2,5): support 1 in base ...
      (5L, 2L), (5L, 5L),
      // untouched base component C: parts {8,9}
      (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L),
      // ... +1 in the increment (order 10 ≡ 0 mod 10) → support 2 →
      // the NEW edge must merge A and B into cluster 1
      (10L, 2L), (10L, 5L),
      // increment-only component: parts {11,12} supported entirely by
      // increment orders 20, 30
      (20L, 11L), (20L, 12L), (30L, 11L), (30L, 12L))
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.GraphOps.q142IncrementalCc(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, // A ∪ B merged via the delta bridge
      8L -> 8L, 9L -> 8L,                     // untouched
      11L -> 11L, 12L -> 11L),                // increment-only
      s"got $got")
  }

  test("q99 counts planted violations exactly once each") {
    val dir = java.nio.file.Files.createTempDirectory("graft_p99").toString
    val t0 = new java.sql.Timestamp(1609459200000L)
    val t1 = new java.sql.Timestamp(1609545600000L)
    // orders: 1 (clean, childful), 2 (childless), 3 (nonpositive price, childful)
    Seq((1L, 1L, "O", 10.0, t0, "1-URGENT"),
        (2L, 1L, "O", 10.0, t0, "1-URGENT"),
        (3L, 1L, "O", -5.0, t0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // lineitems: order 1 clean; order 3 shipped before ordered + bad
    // discount + nonpositive qty; orderkey 99 is an orphan
    Seq((1L, 1L, 1L, 1, 5.0, 100.0, 0.05, 0.0, "N", "O", t1),
        (3L, 1L, 1L, 1, 0.0, 100.0, 0.5, 0.0, "N", "O",
          new java.sql.Timestamp(1609372800000L)),
        (99L, 1L, 1L, 1, 5.0, 100.0, 0.05, 0.0, "N", "O", t1))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Drift.q99DqAudit(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "fk_orphan_lineitem" -> 1L,
      "childless_order" -> 1L,
      "ship_before_order" -> 1L,
      "discount_range" -> 1L,
      "qty_nonpositive" -> 1L,
      "price_nonpositive" -> 1L), s"got $got")
  }
}
