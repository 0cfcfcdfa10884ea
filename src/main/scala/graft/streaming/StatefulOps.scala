package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2.9; builder prompt: `KeyValue
  * GroupedDataset.mapGroupsWithState`/`flatMapGroupsWithState` for state
  * Spark's built-in operators can't express).
  *
  * Two live operators over the candle stream:
  *  - [[gapMonitor]] — the streaming version of q21's batch gap detection:
  *    per-symbol state remembers the last seen aligned timestamp and each
  *    arriving candle emits one row per missing boundary in between. The
  *    reference can only observe gaps after the fact (its collector logs
  *    "No data collected in this cycle", crypto_collector.py:696–699);
  *    state here turns that into a first-class stream of gap records.
  *  - [[liveResample]] — watermarked tumbling-window OHLC roll-up
  *    (15m → 1h/1d) computed ON the live stream, so coarse intervals need
  *    no extra API traffic (the reference re-fetches every granularity).
  *
  * State size: one long per (symbol) key for the gap monitor — bounded by
  * symbol-universe cardinality, not stream length; the windowed roll-up's
  * state is bounded by the watermark horizon. Both survive restarts via
  * the query checkpoint.
  */
object StatefulOps {

  /** One candle tick as consumed by the gap monitor. */
  final case class Tick(symbol: String, ts: Long)

  /** A detected hole: `expectedTs` had no candle for `symbol`. */
  final case class Gap(symbol: String, expectedTs: Long)

  /** Gap-monitor state: last aligned timestamp seen per symbol. Public —
    * the state encoder's generated code must reach the accessor.
    */
  final case class LastSeen(ts: Long)

  /** Per-symbol missing-candle detector. Candles may arrive out of order
    * within a batch (multi-exchange fan-in); each batch's events sort
    * locally (bounded by batch size, not stream length). A gap closed by
    * a late backfill in a LATER batch is not retracted — the gap stream
    * is an alerting signal, and the lake merge is the source of truth.
    */
  def gapMonitor(ticks: Dataset[Tick], intervalMs: Long): Dataset[Gap] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[LastSeen, Gap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, events: Iterator[Tick], state: GroupState[LastSeen]) =>
          val sorted = events.map(_.ts).toArray.sorted
          var last = state.getOption.map(_.ts).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[Gap]
          sorted.foreach { ts =>
            if (last != Long.MinValue && ts > last + intervalMs) {
              var t = last + intervalMs
              while (t < ts) { out += Gap(symbol, t); t += intervalMs }
            }
            if (ts > last) last = ts
          }
          state.update(LastSeen(last))
          out.result().iterator
      }
  }

  /** Watermarked live OHLC roll-up: the batch [[graft.operators.Resample]]
    * aggregation applied to a stream. Append mode — a window emits
    * exactly once, when the watermark passes its end.
    */
  def liveResample(candles: DataFrame, target: String,
                   watermarkDelay: String = "30 minutes"): DataFrame =
    graft.operators.Resample.resample(
      candles.withWatermark("timestamp", watermarkDelay), target)
}
