package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** `collect_capped`: collect_list semantics below the cap, a bounded
  * buffer above it — the OOM guard under the dedup pipelines' bucket
  * blocking (q35/q36/q37).
  */
class CollectCappedSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("equals collect_list for every group at or under the cap") {
    val df = Seq.tabulate(500)(i => (i % 7, i.toLong)).toDF("k", "v")
    val capped = df.groupBy($"k")
      .agg(sort_array(call_function("collect_capped", $"v", lit(100))).as("vs"))
    val ref = df.groupBy($"k")
      .agg(sort_array(collect_list($"v")).as("vs"))
    assert(capped.join(ref, Seq("k")).filter(capped("vs") =!= ref("vs")).count() == 0)
    assert(capped.count() == 7)
  }

  test("a hot key's buffer is bounded at cap+1, and the size filter drops it") {
    // one key with 100k members, one with 3 — mirrors a stop-shingle
    // bucket next to a real candidate bucket
    val df = (Seq.fill(100000)(1) ++ Seq.fill(3)(2)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val agg = df.repartition(8, $"v") // force multi-partition partials + merge
      .groupBy($"k")
      .agg(call_function("collect_capped", $"v", lit(10)).as("vs"))
    val sizes = agg.select($"k", size($"vs").as("n")).as[(Int, Int)].collect().toMap
    assert(sizes(1) == 11, s"hot key must cap at cap+1, got ${sizes(1)}")
    assert(sizes(2) == 3)
    // downstream blocking filter: hot bucket dropped, real bucket kept
    assert(agg.filter(size($"vs").between(2, 10)).count() == 1)
  }

  test("struct elements survive (q37's (doc_id, sig) members)") {
    val df = Seq((1, 10L, 111L), (1, 20L, 222L), (2, 30L, 333L)).toDF("k", "id", "sig")
    val out = df.groupBy($"k")
      .agg(call_function("collect_capped", struct($"id", $"sig"), lit(5)).as("ms"))
      .select($"k", explode($"ms").as("m"))
      .select($"k", $"m.id", $"m.sig")
      .as[(Int, Long, Long)].collect().toSet
    assert(out == Set((1, 10L, 111L), (1, 20L, 222L), (2, 30L, 333L)))
  }

  test("null inputs are skipped like collect_list") {
    val df = Seq((1, Some(1L)), (1, None), (1, Some(2L))).toDF("k", "v")
    val out = df.groupBy($"k")
      .agg(sort_array(call_function("collect_capped", $"v", lit(5))).as("vs"))
      .as[(Int, Seq[Long])].collect().head
    assert(out._2 == Seq(1L, 2L))
  }
}
