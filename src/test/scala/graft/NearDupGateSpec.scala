package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.MinHashLsh
import graft.streaming.CorpusIngest
import graft.streaming.CorpusIngest.Doc

/** The incremental streaming near-dup gate
  * ([[MinHashLsh.incrementalNearDupGate]] + the
  * [[CorpusIngest.startNearDupGated]] wiring): the maintained state
  * must hold SURVIVORS only, the in-batch rule must key on smaller-id
  * (not in-batch survival), and the streaming deployment must land
  * only gate survivors in the lake with batchId-keyed state deltas.
  *
  * Fixture: three 30-token windows over one 42-token ground sequence —
  * A = tokens 1–30, B = 7–36, C = 13–42. Distinct-3-shingle Jaccard:
  * J(A,B) = J(B,C) = 22/34 ≈ 0.65 (≥ τ = 0.5, a near-dup pair);
  * J(A,C) = 16/40 = 0.40 (< τ — NOT a pair). The chain isolates the
  * state polarity: C is a near-dup of B but not of A.
  */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  private def window(from: Int): String =
    (from until from + 30).map(i => f"tok$i%02d").mkString(" ")
  private val A = window(1)
  private val B = window(7)
  private val C = window(13)

  private def batchDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def verdicts(flags: DataFrame): Map[Long, Boolean] =
    flags.select($"doc_id", $"survived").as[(Long, Boolean)].collect().toMap

  test("cross-batch: state holds survivors only — a near-dup of a DROPPED doc passes") {
    val (f0, d0) = MinHashLsh.incrementalNearDupGate(batchDf(1L -> A), None)
    assert(verdicts(f0) == Map(1L -> true))
    val st1 = Some(d0)
    // B is a near-dup of survivor A → dropped; state delta for the batch is empty
    val (f1, d1) = MinHashLsh.incrementalNearDupGate(batchDf(2L -> B), st1)
    assert(verdicts(f1) == Map(2L -> false))
    assert(d1.bands.isEmpty && d1.docs.isEmpty,
      "a dropped doc must contribute NOTHING to the maintained state")
    // C is a near-dup of B only; B never entered the state → C survives
    val (f2, _) = MinHashLsh.incrementalNearDupGate(batchDf(3L -> C), st1)
    assert(verdicts(f2) == Map(3L -> true),
      "near-dup of a dropped (non-state) doc must pass — state polarity leak")
    // control: a re-delivery of A itself is caught by the state
    val (f3, _) = MinHashLsh.incrementalNearDupGate(batchDf(4L -> A), st1)
    assert(verdicts(f3) == Map(4L -> false))
  }

  test("in-batch: rule is ANY smaller-id near-dup, not in-batch survival") {
    // all three in ONE batch: B drops against A (smaller id); C drops
    // against B even though B itself was dropped — the deterministic
    // in-flight rule does not recurse on survival (contrast cross-batch,
    // where only survivors gate)
    val (flags, delta) = MinHashLsh.incrementalNearDupGate(
      batchDf(1L -> A, 2L -> B, 3L -> C), None)
    assert(verdicts(flags) == Map(1L -> true, 2L -> false, 3L -> false))
    assert(delta.docs.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("shingle-less and unrelated docs survive; state delta carries survivor bands only") {
    val (flags, delta) = MinHashLsh.incrementalNearDupGate(
      batchDf(1L -> A, 2L -> "ab cd", 3L -> window(100)), None)
    assert(verdicts(flags) == Map(1L -> true, 2L -> true, 3L -> true))
    // the 2-token doc has no 3-shingles: it survives but cannot enter the
    // band index (nothing to probe it with)
    assert(delta.docs.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(delta.bands.select($"doc_id").distinct().as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
  }

  test("streaming: gate survivors land in the lake; state persists as batchId-keyed deltas") {
    implicit val sc = spark.sqlContext
    val T0 = 1609459200000L
    val mem = MemoryStream[Doc]
    val dir = Files.createTempDirectory("graft_neardup_gate").toString
    def pass(): Unit = {
      val q = CorpusIngest.startNearDupGated(spark, mem.toDF(), s"$dir/lake",
        s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow(),
        watermarkDelay = "1 minute", minQuality = 0.0)
      q.awaitTermination()
    }
    mem.addData(Doc(1L, A, new Timestamp(T0), "web"))
    pass()
    mem.addData(Doc(2L, B, new Timestamp(T0 + 1000), "web")) // near-dup of A
    pass()
    mem.addData(Doc(3L, C, new Timestamp(T0 + 2000), "web")) // near-dup of B ONLY
    pass()
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L),
      "lake must hold exactly the gate survivors (A and C)")
    // state layout: one delta dir per non-empty micro-batch, survivors only
    val state = CorpusIngest.loadGateState(spark, s"$dir/state")
    assert(state.isDefined)
    assert(state.get.docs.select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L), "accumulated state must be exactly the survivors")
    val batches = new java.io.File(s"$dir/state/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(batches.length >= 2, s"expected per-batch delta dirs, got ${batches.toSeq}")
  }

  test("crash after the delta write, before the epoch commit: redelivery preserves survivor state") {
    // Round-11 advice (high): the redelivered batch loads gate state
    // that already CONTAINS its own survivors. Without the self-pair
    // filter + own-delta exclusion, each survivor matched ITSELF at
    // Jaccard 1, was flagged dropped, and the batchId-keyed delta was
    // overwritten EMPTY — survivor state permanently lost, so later
    // near-dups of those docs sailed through the gate into the lake.
    implicit val sc = spark.sqlContext
    val T0 = 1609459200000L
    val mem = MemoryStream[Doc]
    val dir = Files.createTempDirectory("graft_neardup_crash").toString
    val boom = new java.util.concurrent.atomic.AtomicBoolean(true)
    def pass(crash: Boolean): Option[Throwable] = {
      val q = CorpusIngest.startNearDupGated(spark, mem.toDF(), s"$dir/lake",
        s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow(),
        "1 minute", 0.0,
        postBatchHook = _ => if (crash && boom.getAndSet(false))
          throw new IllegalStateException("injected crash before epoch commit"))
      try { q.awaitTermination(); None } catch { case e: Throwable => Some(e) }
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    // batch 0: A survives, B (near-dup of A) drops, an unrelated doc survives
    mem.addData(Doc(1L, A, new Timestamp(T0), "web"),
      Doc(2L, B, new Timestamp(T0 + 1000), "web"),
      Doc(3L, window(100), new Timestamp(T0 + 2000), "web"))
    val err = pass(crash = true)
    assert(err.exists(e => chain(e).exists(_.contains("injected"))),
      s"the injected crash must fail the query, got ${err.map(chain)}")
    // torn premise: batch 0's survivor delta landed before the crash
    assert(new java.io.File(s"$dir/state/bands").listFiles()
      .exists(_.getName.startsWith("batch=")),
      "test premise: the state delta must be on disk before the epoch commit")
    // restart: batch 0 redelivers with state present (the poisoned
    // window), then batch 1 probes the state — a near-dup of survivor A
    // under FRESH text (exact tier can't catch it) plus a fresh doc
    mem.addData(Doc(4L, window(3), new Timestamp(T0 + 60000), "web"),
      Doc(5L, window(200), new Timestamp(T0 + 61000), "web"))
    assert(pass(crash = false).isEmpty, "recovery pass must succeed")
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L),
      "doc 4 (near-dup of survivor 1) must still be gated — state survived redelivery")
    val state = CorpusIngest.loadGateState(spark, s"$dir/state")
    assert(state.get.docs.select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 5L),
      "survivor state must converge to exactly the gate survivors")
  }
}
