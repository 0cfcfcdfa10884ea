package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native streaming session windows — Spark's `session_window`
  * aggregate over the per-user event stream: the stateful operator
  * keeps one OPEN window per (user, session) and MERGES windows when a
  * bridging event's [ts, ts+gap) span overlaps two of them; append
  * mode emits a session once the watermark reaches its end
  * (last event + gap). The batch q18 sessionizer computes gap islands
  * with a window chain; this is the same relation maintained
  * incrementally — q172 hash-checks the equivalence (and the emission
  * rule) against a relational oracle, SessionWindowSpec pins the merge
  * and boundary semantics the equivalence relies on.
  *
  * Scale: one shuffle on user_id into the session state store; state is
  * per OPEN session — bounded by active keys × the gap+delay horizon,
  * watermark-evicted — never stream length.
  */
object SessionWindows {

  /** Per-user session aggregate. `events` must carry (user_id, ts) and
    * may be streaming or batch. Emits [start, end) bounds in exact µs
    * and the event count. Windows merge whenever an event's [ts, ts+gap)
    * span TOUCHES an open window, so an event at exactly gap distance
    * still extends the session (the same ≤-gap island rule as batch
    * q18 — SessionWindowSpec pins the boundary).
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
              else events
    src.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"))
  }
}
