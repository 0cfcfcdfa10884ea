package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.KeepLast

/** Property-based invariants (SURVEY.md §5.3) for the merge/dedup core.
  * Runs the dedup logic (not the filesystem writer) under generated
  * overlapping batches.
  */
class MergePropertySpec extends SparkSpec {

  /** Run a ScalaCheck property (plain ScalaCheck — the scalatestplus
    * bridge isn't in the offline cache) with a small trial count: each
    * trial runs Spark jobs.
    */
  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }
  import spark.implicits._

  private val T0 = 1609459200000L

  // batches: lists of (slot, value); slot → timestamp = T0 + slot*900s
  private val batchGen: Gen[List[(Int, Double)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0, 5), Gen.choose(0.0, 1000.0)))

  private def toDf(b: List[(Int, Double)], seq: Long): DataFrame =
    b.zipWithIndex.map { case ((slot, v), i) =>
      (new Timestamp(T0 + slot * 900000L), v, seq, i.toLong)
    }.toDF("timestamp", "close", "ingest_seq", "row_idx")

  private def merge(dfs: DataFrame*): Map[Long, Double] = {
    val all = dfs.reduce(_ unionByName _)
    KeepLast.dedup(all, Seq($"timestamp"), Seq($"ingest_seq", $"row_idx"))
      .select($"timestamp", $"close").as[(Timestamp, Double)]
      .collect().map { case (t, v) => (t.getTime, v) }.toMap
  }

  test("dedup keeps exactly one row per key and the winner is the max-order row") {
    check(Prop.forAll(batchGen, batchGen) { (b1, b2) =>
      val got = merge(toDf(b1, 1), toDf(b2, 2))
      // model: later batch wins; within a batch, later row wins
      val model = (b1.zipWithIndex.map { case ((s, v), i) => (s, (1L, i.toLong, v)) } ++
        b2.zipWithIndex.map { case ((s, v), i) => (s, (2L, i.toLong, v)) })
        .groupBy(_._1).map { case (slot, rows) => (T0 + slot * 900000L, rows.map(_._2).max._3) }
      got == model
    })
  }

  test("merge is idempotent: merging a batch twice equals merging it once") {
    check(Prop.forAll(batchGen) { b =>
      merge(toDf(b, 1), toDf(b, 1)) == merge(toDf(b, 1))
    })
  }

  test("chronological order invariant after any merge") {
    check(Prop.forAll(batchGen, batchGen) { (b1, b2) =>
      val all = toDf(b1, 1).unionByName(toDf(b2, 2))
      val sorted = KeepLast.dedup(all, Seq($"timestamp"), Seq($"ingest_seq", $"row_idx"))
        .orderBy($"timestamp").select($"timestamp").as[Timestamp]
        .collect().map(_.getTime).toSeq
      sorted == sorted.sorted
    })
  }
}
