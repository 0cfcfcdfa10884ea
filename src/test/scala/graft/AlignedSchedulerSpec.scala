package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.LiveIngest

/** Driver-side aligned scheduler (SURVEY.md §2.9 T1) under a frozen,
  * injected clock: runs fire ONLY at :00/:15/:30/:45 wall-clock
  * boundaries, and each interval is gated exactly per the reference's
  * `should_collect_interval` (crypto_collector.py:719–739) — including
  * the 6h minute-not-checked quirk. Pure logic, no Spark session.
  */
class AlignedSchedulerSpec extends AnyFunSuite {
  private val T0 = 1609459200000L // 2021-01-01 00:00:00 UTC (a midnight)
  private val Min = 60000L

  test("fires only at 15m boundaries; per-interval gating matches the reference") {
    var now = T0 + 7 * Min + 123 // 00:07:00.123 → first boundary is 00:15
    val launches = mutable.Buffer[(String, Long)]()
    LiveIngest.runAligned(
      cycles = 8,
      intervals = Seq("15m", "1h", "4h", "6h", "1d", "42x"),
      launch = (iv, b) => launches += ((iv, b)),
      clock = () => now,
      sleep = ms => now += ms)

    val boundaries = launches.map(_._2).distinct.sorted
    assert(boundaries == (1 to 8).map(i => T0 + i * 15 * Min),
      "exactly the eight boundaries 00:15 … 02:00, in order")
    assert(boundaries.forall(_ % (15 * Min) == 0))

    val byInterval = launches.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // 15m: every boundary
    assert(byInterval("15m") == boundaries)
    // 1h: minute-0 boundaries only (01:00, 02:00)
    assert(byInterval("1h") == Seq(T0 + 60 * Min, T0 + 120 * Min))
    // 4h: hour%4==0 AND minute==0 — no such boundary in this window
    assert(!byInterval.contains("4h"))
    // 6h reference quirk: hour%6==0, minute NOT checked → all hour-0
    // boundaries (00:15, 00:30, 00:45) fire; hours 1–2 don't
    assert(byInterval("6h") == Seq(T0 + 15 * Min, T0 + 30 * Min, T0 + 45 * Min))
    // 1d: 00:00 only — absent here
    assert(!byInterval.contains("1d"))
    // unknown interval: warn-and-skip, never launched
    assert(!byInterval.contains("42x"))
  }

  test("a cycle landing exactly on a boundary schedules the NEXT one, never twice") {
    var now = T0 // exactly midnight — itself a boundary
    val fired = mutable.Buffer[Long]()
    LiveIngest.runAligned(
      cycles = 3, intervals = Seq("15m"),
      launch = (_, b) => fired += b,
      clock = () => now, // clock frozen per cycle: work takes 0 ms
      sleep = ms => now += ms)
    assert(fired.toSeq == Seq(T0, T0 + 15 * Min, T0 + 30 * Min))
  }
}
