package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the last Structured Streaming join shape the
  * engine's streaming tier lacked (the candle path joins stream→static
  * dims; [[StatefulOps]] keeps per-key state): two UNBOUNDED sides,
  * matched on an equi key plus an event-time range, with watermarks
  * bounding the join state.
  *
  * Semantics (Spark's stream-stream inner join): a row is buffered in
  * the join state store until the GLOBAL watermark (min over both
  * sides) passes the latest event time it could still match —
  * here `click.ts + lag` — then evicted; an input arriving behind its
  * side's watermark is dropped before the join. For event streams
  * delivered in event-time order inside the watermark horizon the
  * result is EXACTLY the batch interval join (the equivalence q169
  * replays file-source streams through and hash-checks); genuinely
  * late data is the documented divergence, pinned in StreamJoinSpec.
  *
  * Scale: both sides shuffle once on the equi key (user_id) into the
  * keyed state store; per-key state is bounded by arrival rate × the
  * (lag + watermark) horizon — never stream length. The range
  * predicate is evaluated as a residual inside the matched key bucket,
  * so no cross-key state or broadcast exists anywhere.
  */
object StreamJoin {

  /** Run `body` with session confs temporarily overridden, restoring
    * prior values (or unsetting) after. For micro-batch replays only:
    * stateful operators bake `spark.sql.shuffle.partitions` into the
    * checkpoint at stream START, so a replay against a fresh checkpoint
    * may legitimately choose a state-partition count sized to its
    * keyspace instead of inheriting the relational default (32 here).
    * On a real cluster the deployment sets this once per stream for
    * the same reason — state-store instance count is a per-stream
    * capacity decision, not a session-wide one.
    */
  def withConfs[T](spark: org.apache.spark.sql.SparkSession,
                   confs: (String, String)*)(body: => T): T = {
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Inner-join purchase events to the click events they follow within
    * `lagHours`, per user. Both inputs must carry (user_id, event_id,
    * ts); they may be streaming or batch DataFrames — the same plan
    * serves the streaming deployment and its batch-oracle replay.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      lagHours: Int = 6,
                      watermarkDelay: String = "1 hour"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermarkDelay)
             else clicks)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = (if (purchases.isStreaming) purchases.withWatermark("ts", watermarkDelay)
             else purchases)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $lagHours HOURS"))
      // integer seconds via exact µs math (double seconds would round)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").as("lag_sec"))
  }
}
