package graft

import graft.functions.{BloomAgg, BloomUtil}
import graft.operators.RuntimeFilter
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** The bloom runtime-filter pair: membership (never a false negative),
  * false-positive rate within theory, the aggregate's merge path, and
  * q89's end shape — bloom prune below the exact semi join, result
  * identical to the unpruned join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate within theory at 3k keys") {
    val bits = new Array[Long](BloomUtil.NumWords)
    val rng = new scala.util.Random(7)
    val keys = Seq.fill(3000)(rng.nextLong()).distinct
    keys.foreach(BloomUtil.add(bits, _))
    val arr = new GenericArrayData(bits)
    assert(keys.forall(BloomUtil.mightContain(arr, _)), "false negative")
    val keySet = keys.toSet
    val probes = Seq.fill(100000)(rng.nextLong()).filterNot(keySet)
    val fp = probes.count(BloomUtil.mightContain(arr, _))
    // theory at n=3000, m=2^16, k=4: (1 - e^(-kn/m))^k ≈ 7.6e-4;
    // allow an order of magnitude of slack before calling the hash broken
    assert(fp.toDouble / probes.size < 0.01, s"$fp false positives in ${probes.size}")
  }

  test("BloomAgg over a partitioned relation equals a single-threaded build") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val agg = keys.toDF("k").repartition(8)
      .agg(BloomAgg()($"k").as("bloom")).as[Array[Long]].head()
    val direct = new Array[Long](BloomUtil.NumWords)
    keys.foreach(BloomUtil.add(direct, _))
    assert(agg.sameElements(direct), "merge path diverged from serial build")
  }

  test("q89 equals the plain (unpruned) semi join") {
    val got = RuntimeFilter.q89BloomSemi(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSet
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey".as("l_orderkey"))
    val naive = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(keys, Seq("l_orderkey"), "left_semi")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Exact.dsum($"l_quantity").as("sum_qty"),
        graft.functions.Exact.dsum($"l_extendedprice").as("sum_price"))
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == naive)
  }

  test("q89 plan: the codegen'd bloom probe prunes the fact side below the semi join") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
    val lp = RuntimeFilter.q89BloomSemi(spark, sf).queryExecution.optimizedPlan
    val semis = lp.collect { case j: LJoin if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"semi join missing from plan:\n$lp")
    // the probe must survive optimization ON THE FACT INPUT of the semi
    // join — that placement is what cuts the join's probe-side volume
    assert(semis.exists(_.left.collectFirst {
      case f: LFilter if f.condition.toString.contains("bloom_contains") => f
    }.nonEmpty), s"bloom probe not below the semi join:\n$lp")
  }
}
