package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{Encoders, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import graft.streaming.{RunningStats, StreamJoin}
import graft.streaming.RunningStats.In
import graft.TransformWithStateSpec._

/** `transformWithState` semantics q207's order-independent oracle cannot
  * see: the exact cross-batch running sequence, event-time TIMERS
  * (inactivity detection — fire iff the watermark passes the key's
  * last-event + gap, stale timers suppressed), and ListState
  * persistence. MemoryStream makes batch boundaries deterministic;
  * every run uses the RocksDB provider the API requires.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A =
    StreamJoin.withConfs(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "4")(body)

  test("running profile: ValueState crosses micro-batches and checkpoint restarts") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[In]
    val out = Files.createTempDirectory("graft_tws").toString
    def run(): Unit = withRocksDb {
      val q = RunningStats.profile(mem.toDS()).toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(In("a", 5L), In("a", 3L), In("b", 1L))
    run()
    mem.addData(In("a", 2L), In("c", 7L))
    run() // fresh query, state restored from the checkpoint
    val got = spark.read.parquet(s"$out/rows")
      .as[RunningStats.Emit].collect().toSet
    assert(got == Set(
      RunningStats.Emit("a", 1L, 2L, 8L),
      RunningStats.Emit("b", 1L, 1L, 1L),
      RunningStats.Emit("a", 2L, 3L, 10L), // running totals, not batch-local
      RunningStats.Emit("c", 1L, 1L, 7L)), got.toString)
  }

  // ── event-time timers: per-key inactivity alerts ──────────────────────

  test("event-time timers: inactivity fires when the watermark passes; re-arming suppresses stale timers") {
    implicit val sc = spark.sqlContext
    val T0 = 1609459200000L // 2021-01-01 00:00:00
    val Gap = 10000L
    val mem = MemoryStream[TIn]
    val out = Files.createTempDirectory("graft_tws_timer").toString
    def run(): Unit = withRocksDb {
      implicit val eOut = Encoders.product[TOut]
      val q = mem.toDS().withWatermark("ts", "0 seconds")
        .groupByKey(_.k)(Encoders.STRING)
        .transformWithState(new QuietMonitor(Gap),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def quiet(): Set[(String, Long)] = spark.read.parquet(s"$out/rows")
      .as[TOut].collect().map(o => (o.k, o.quiet_at)).toSet

    mem.addData(TIn("a", new Timestamp(T0)), TIn("b", new Timestamp(T0)))
    run() // wm → T0; timers armed at T0+Gap, none passed
    assert(quiet().isEmpty, "nothing can be quiet before the watermark moves")
    mem.addData(TIn("a", new Timestamp(T0 + 30000L)))
    run() // wm → T0+30s: b's T0+10s fires (b IS quiet); a re-armed at
          // T0+40s and its STALE T0+10s timer must be suppressed — a was
          // active at T0+30s
    assert(quiet() == Set(("b", T0 + Gap)),
      s"only the key that actually went quiet may alert: ${quiet()}")
    mem.addData(TIn("c", new Timestamp(T0 + 60000L)))
    run() // wm → T0+60s: a's re-armed T0+40s fires
    assert(quiet() == Set(("b", T0 + Gap), ("a", T0 + 30000L + Gap)), quiet().toString)
  }

  // ── ListState: bounded per-key history ────────────────────────────────

  test("MapState: per-key sub-map updates merge across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[TIn]
    val out = Files.createTempDirectory("graft_tws_map").toString
    def run(): Unit = withRocksDb {
      implicit val eOut = Encoders.product[MOut]
      val q = mem.toDS().groupByKey(_.k)(Encoders.STRING)
        .transformWithState(new HourHistogram, TimeMode.None(), OutputMode.Append())
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val H = 3600000L
    mem.addData(TIn("a", new Timestamp(H * 5 + 1)), TIn("a", new Timestamp(H * 5 + 2)),
      TIn("a", new Timestamp(H * 7)))
    run()
    mem.addData(TIn("a", new Timestamp(H * 5 + 3)), TIn("b", new Timestamp(0L)))
    run()
    val last = spark.read.parquet(s"$out/rows").as[MOut].collect()
      .filter(_.k == "a").maxBy(_.n_total)
    // hour 5 counted across BOTH batches through the map state
    assert(last.n_total == 4L && last.hist.toMap == Map(5L -> 3L, 7L -> 1L),
      last.toString)
  }

  // ── ProcessingTime mode: TTL + wall-clock timers ──────────────────────
  // TTL REQUIRES TimeMode.ProcessingTime (validateTTLConfig throws for
  // any other mode), and in that mode the engine keeps constructing
  // batches forever by design (shouldRunAnotherBatch: the wall clock
  // advancing IS pending work — how timers fire without input), so
  // AvailableNow/processAllAvailable never terminate. These rows run ONE
  // continuous query and poll its sink — which proves the stronger
  // property: expiry happens with NO further input at all.

  /** Poll until `cond` holds, bounded; returns whether it ever held. */
  private def eventually(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < end) { Thread.sleep(200L); ok = cond }
    ok
  }

  test("state TTL: expired values read as absent; unexpired values survive (RocksDB)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[In]
    val out = Files.createTempDirectory("graft_tws_ttl").toString
    def rows(): Seq[(Long, Long)] =
      scala.util.Try(spark.read.parquet(s"$out/rows").as[TtlOut].collect())
        .getOrElse(Array.empty[TtlOut]).toSeq
        .filter(_.k == "a").map(o => (o.durable, o.volatileN)).sorted
    withRocksDb {
      implicit val eOut = Encoders.product[TtlOut]
      val q = mem.toDS().groupByKey(_.k)(Encoders.STRING)
        .transformWithState(new TtlCounter, TimeMode.ProcessingTime(),
          OutputMode.Append())
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      try {
        mem.addData(In("a", 1L))
        assert(eventually(30000L)(rows().size == 1), s"first batch: ${rows()}")
        Thread.sleep(3000L) // past the 1s TTL, far under the 60s one
        mem.addData(In("a", 1L))
        assert(eventually(30000L)(rows().size == 2), s"second batch: ${rows()}")
      } finally q.stop()
    }
    assert(rows() == Seq((1L, 1L), (2L, 1L)),
      "the 1s-TTL counter must expire across the 3s gap while the " +
        s"60s-TTL counter accumulates: ${rows()}")
  }

  test("processing-time timers fire from the wall clock alone — no further input required") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[In]
    val out = Files.createTempDirectory("graft_tws_proc").toString
    def fired(): Set[String] =
      scala.util.Try(spark.read.parquet(s"$out/rows").as[TOut].collect())
        .getOrElse(Array.empty[TOut]).map(_.k).toSet
    withRocksDb {
      implicit val eOut = Encoders.product[TOut]
      val q = mem.toDS().groupByKey(_.k)(Encoders.STRING)
        .transformWithState(new PingMonitor(1000L), TimeMode.ProcessingTime(),
          OutputMode.Append())
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      try {
        mem.addData(In("a", 1L)) // arms a's +1s timer; nothing else arrives
        assert(eventually(30000L)(fired().contains("a")),
          s"a's timer must fire from the clock alone: ${fired()}")
      } finally q.stop()
    }
  }

  test("ListState accumulates across batches and survives restart") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[In]
    val out = Files.createTempDirectory("graft_tws_list").toString
    def run(): Unit = withRocksDb {
      implicit val eOut = Encoders.product[LOut]
      val q = mem.toDS().groupByKey(_.k)(Encoders.STRING)
        .transformWithState(new LastValues, TimeMode.None(), OutputMode.Append())
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$out/rows").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(In("a", 1L), In("a", 2L))
    run()
    mem.addData(In("a", 3L))
    run()
    val byLen = spark.read.parquet(s"$out/rows").as[LOut].collect()
      .map(o => o.vals.toList).sortBy(_.length)
    assert(byLen.exists(_ == List(1L, 2L, 3L)),
      s"the second batch must see the first batch's list: ${byLen.toList}")
  }
}

/** Top-level fixtures: Spark encoders cannot be generated for classes
  * nested inside the suite (no access to the defining scope), and the
  * processors ship to executors, so neither may capture the suite.
  */
object TransformWithStateSpec {
  case class TIn(k: String, ts: Timestamp)
  case class TOut(k: String, quiet_at: Long)

  /** Emits (key, last+gap) once the WATERMARK passes the key's
    * last-event time + gap; a new event re-arms the timer and the stale
    * one is suppressed by re-checking state at expiry (the standard
    * lazy-cancel idiom — cheaper than deleteTimer bookkeeping).
    */
  class QuietMonitor(gapMs: Long)
      extends StatefulProcessor[String, TIn, TOut] {
    @transient private var last: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[TIn],
                                 tv: TimerValues): Iterator[TOut] = {
      val mx = rows.map(_.ts.getTime).max
      val m = math.max(if (last.exists()) last.get() else Long.MinValue, mx)
      last.update(m)
      getHandle.registerTimer(m + gapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[TOut] =
      if (last.exists() && info.getExpiryTimeInMs == last.get() + gapMs)
        Iterator(TOut(key, info.getExpiryTimeInMs))
      else Iterator.empty // stale timer of a key that stayed active
  }

  case class MOut(k: String, n_total: Long, hist: Seq[(Long, Long)])

  /** MapState: per-key hour-of-event histogram — sub-map entries update
    * individually (never a whole-map rewrite), the access pattern
    * MapState exists for.
    */
  class HourHistogram extends StatefulProcessor[String, TIn, MOut] {
    @transient private var hist: MapState[Long, Long] = _
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hist = getHandle.getMapState[Long, Long]("hist",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[TIn],
                                 tv: TimerValues): Iterator[MOut] = {
      var total = if (n.exists()) n.get() else 0L
      rows.foreach { r =>
        val h = r.ts.getTime / 3600000L
        hist.updateValue(h, (if (hist.containsKey(h)) hist.getValue(h) else 0L) + 1L)
        total += 1L
      }
      n.update(total)
      Iterator(MOut(key, total, hist.iterator().toSeq.sortBy(_._1)))
    }
  }

  case class TtlOut(k: String, durable: Long, volatileN: Long)

  /** Two counters on the same key with different TTLs: the 60s one must
    * survive a multi-second batch gap, the 1s one must expire across it
    * and restart — state TTL as wall-clock cleanup with no explicit
    * timer bookkeeping (the cache/session-affinity state shape).
    */
  class TtlCounter extends StatefulProcessor[String, In, TtlOut] {
    @transient private var durable: ValueState[Long] = _
    @transient private var volatileC: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      durable = getHandle.getValueState[Long]("durable", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofSeconds(60)))
      volatileC = getHandle.getValueState[Long]("volatile", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofSeconds(1)))
    }
    override def handleInputRows(key: String, rows: Iterator[In],
                                 tv: TimerValues): Iterator[TtlOut] = {
      val n = rows.size.toLong
      val d = (if (durable.exists()) durable.get() else 0L) + n
      val v = (if (volatileC.exists()) volatileC.get() else 0L) + n
      durable.update(d); volatileC.update(v)
      Iterator(TtlOut(key, d, v))
    }
  }

  /** Arms a processing-time timer per input and emits on expiry — the
    * wall-clock-deadline shape (heartbeat/SLA alerts), firing on a later
    * micro-batch with NO input required for the expiring key.
    */
  class PingMonitor(delayMs: Long) extends StatefulProcessor[String, In, TOut] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
    override def handleInputRows(key: String, rows: Iterator[In],
                                 tv: TimerValues): Iterator[TOut] = {
      rows.size // drain
      getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + delayMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[TOut] =
      Iterator(TOut(key, info.getExpiryTimeInMs))
  }

  case class LOut(k: String, vals: Seq[Long])

  class LastValues extends StatefulProcessor[String, In, LOut] {
    @transient private var hist: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[Long]("hist", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[In],
                                 tv: TimerValues): Iterator[LOut] = {
      rows.foreach(r => hist.appendValue(r.v))
      Iterator(LOut(key, hist.get().toSeq))
    }
  }
}
