package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** `transformWithState` processors — Spark 4's arbitrary-state API
  * (SPARK-46815), the successor of `mapGroupsWithState` the streaming
  * tier already exercises in [[StatefulOps]]: typed state handles
  * (Value/List/Map), per-state TTL, and first-class event-time timers,
  * running on the RocksDB state store. q207 replays [[Profile]] over
  * the events table as a real four-micro-batch streaming query; the
  * timer/list-state semantics live in TransformWithStateSpec (timers
  * key off watermark progression, which a controlled MemoryStream
  * makes deterministic — a relational oracle cannot see batch
  * boundaries, so those stay spec-pinned, the q172/q188 division).
  *
  * Scale: state is one tuple per live key (key-bounded, never stream
  * length); each micro-batch shuffles only its own rows on the key.
  */
object RunningStats {

  /** Input row: composite key, non-negative quantized value. */
  final case class In(k: String, v: Long)

  /** One emission per (key, micro-batch the key appeared in): the
    * running totals AFTER folding that batch. `run_n`/`run_v` are
    * monotone (v ≥ 0 by contract), so per-key maxima are the final
    * totals and the emission count is the batches-seen count — the
    * order-independent summary q207's oracle checks.
    */
  final case class Emit(k: String, batch_seq: Long, run_n: Long, run_v: Long)

  /** Running (count, sum) per key in a ValueState, one emission per
    * batch the key appears in. TTL none: the profile is permanent
    * state by design (TTL is processing-time-based and therefore
    * untestable deterministically; the API surface is exercised by
    * passing the explicit NONE config).
    */
  class Profile extends StatefulProcessor[String, In, Emit] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("run",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
                                 tv: TimerValues): Iterator[Emit] = {
      val (n0, v0, b0) = if (st.exists()) st.get() else (0L, 0L, 0L)
      var n = n0; var v = v0
      rows.foreach { r => n += 1; v += r.v }
      st.update((n, v, b0 + 1))
      Iterator(Emit(key, b0 + 1, n, v))
    }
  }

  /** Run [[Profile]] over a (possibly streaming) Dataset[In]. */
  def profile(ds: Dataset[In]): Dataset[Emit] = {
    implicit val eEmit = Encoders.product[Emit]
    ds.groupByKey(_.k)(Encoders.STRING)
      .transformWithState(new Profile, TimeMode.None(), OutputMode.Append())
  }
}
