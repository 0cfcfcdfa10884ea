package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** `sorted_intersect_count` kernel: parity with array_intersect on
  * random sorted-distinct arrays, edge shapes, and codegen
  * participation.
  */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("equals size(array_intersect) on random sorted-distinct arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200) {
      def arr() = rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(80))
        .distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", call_function("sorted_intersect_count", $"a", $"b"))
      .withColumn("ref", size(array_intersect($"a", $"b")).cast("long"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("edges: empty, disjoint, identical, null") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
      .toDF("a", "b")
      .withColumn("c", call_function("sorted_intersect_count", $"a", $"b"))
    assert(df.select($"c").as[Long].collect().toSeq == Seq(0L, 0L, 3L))
    val withNull = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c")
    assert(withNull.head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", call_function("winnow_fps", $"text", lit(8), lit(4)).as("fps"))
      .createOrReplaceTempView("sic_docs")
    val df = spark.sql(
      "SELECT doc_id, sorted_intersect_count(fps, fps) AS c FROM sic_docs")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
