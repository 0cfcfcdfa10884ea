package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.lake.Scd2Writer

/** Incremental type-2 SCD maintenance ([[graft.lake.Scd2Writer]]):
  * version chains, batch-boundary invisibility, redelivery idempotence,
  * the late-event guard, and retirement of stale current rows from the
  * pruned current partition.
  */
class Scd2WriterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = new Timestamp(1609459200000L + day * 86400000L)

  private def batch(rows: (Long, String, Int, Long)*): DataFrame =
    rows.map { case (e, a, d, q) => (e, a, ts(d), q) }
      .toDF("entity_id", "attr", "ts", "seq")

  private def dimDir() = Files.createTempDirectory("graft_scd2").toString + "/dim"

  private def history(path: String): Seq[(Long, String, Timestamp, Long, Option[Timestamp], Boolean)] =
    Scd2Writer.readDim(spark, path)
      .select($"entity_id", $"attr", $"valid_from", $"since_order", $"valid_to",
        $"is_current")
      .as[(Long, String, Timestamp, Long, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime, r._4)).toSeq

  test("run collapse and close-out: A A B yields A[t1,t3) closed + B[t3,∞) current") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 1, 10L), (1L, "A", 2, 11L),
      (1L, "B", 3, 12L)), dim)
    assert(history(dim) == Seq(
      (1L, "A", ts(1), 10L, Some(ts(3)), false),
      (1L, "B", ts(3), 12L, None, true)))
  }

  test("batch boundaries are invisible: a batch starting with the current attr opens no version") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 1, 10L)), dim)
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 2, 11L), (1L, "B", 3, 12L),
      (2L, "X", 3, 13L)), dim)
    assert(history(dim) == Seq(
      (1L, "A", ts(1), 10L, Some(ts(3)), false),
      (1L, "B", ts(3), 12L, None, true),
      (2L, "X", ts(3), 13L, None, true)))
  }

  test("redelivered batch is absorbed; fully-stale redelivery is a no-op") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 1, 10L)), dim)
    val b2 = batch((1L, "B", 2, 11L), (1L, "C", 3, 12L))
    Scd2Writer.mergeScd2(spark, b2, dim)
    val once = history(dim)
    Scd2Writer.mergeScd2(spark, b2, dim) // at-least-once redelivery
    assert(history(dim) == once,
      "redelivering a batch must not duplicate or extend the version chain")
    assert(once == Seq(
      (1L, "A", ts(1), 10L, Some(ts(2)), false),
      (1L, "B", ts(2), 11L, Some(ts(3)), false),
      (1L, "C", ts(3), 12L, None, true)))
  }

  test("late event at or before the current version start is ignored") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 1, 10L), (1L, "B", 5, 11L)), dim)
    // day 3 < current valid_from (day 5); same-ts smaller-seq also late
    Scd2Writer.mergeScd2(spark, batch((1L, "Z", 3, 12L), (1L, "Y", 5, 9L)), dim)
    assert(history(dim) == Seq(
      (1L, "A", ts(1), 10L, Some(ts(5)), false),
      (1L, "B", ts(5), 11L, None, true)))
  }

  test("stale open row is retired from the pruned current partition") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark, batch((1L, "A", 1, 10L)), dim)
    Scd2Writer.mergeScd2(spark, batch((1L, "B", 2, 11L)), dim)
    // the consumer-facing pruned read: state=current must hold ONLY B
    val cur = graft.lake.MergeWriter.readLake(spark, dim)
      .filter($"state" === "current")
      .select($"attr").as[String].collect().toSeq
    assert(cur == Seq("B"), s"stale current row leaked: $cur")
    val closed = graft.lake.MergeWriter.readLake(spark, dim)
      .filter($"state" === "closed").select($"attr").as[String].collect().toSeq
    assert(closed == Seq("A"))
  }

  test("multiple changes for one entity inside one batch produce the full chain") {
    val dim = dimDir()
    Scd2Writer.mergeScd2(spark,
      batch((1L, "A", 1, 10L), (1L, "B", 1, 11L), (1L, "B", 2, 12L),
        (1L, "C", 3, 13L)), dim)
    assert(history(dim) == Seq(
      (1L, "A", ts(1), 10L, Some(ts(1)), false), // same-ts change: seq breaks the tie
      (1L, "B", ts(1), 11L, Some(ts(3)), false),
      (1L, "C", ts(3), 13L, None, true)))
  }
}
