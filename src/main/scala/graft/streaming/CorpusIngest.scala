package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest — the training-data pipeline's live front
  * door: documents arrive as a stream, exact duplicates are dropped in
  * flight, and low-quality rows are gated out before they ever land.
  * The batch tiers (q34 exact dedup, q31 quality gate, q78 curation)
  * then see a pre-cleaned lake instead of re-scrubbing the firehose.
  *
  * Semantics: unlike the candle path ([[LiveIngest]], where a re-fetch
  * is a CORRECTION and the sink merge must keep the last writer),
  * corpus ingest wants FIRST-wins — two documents with identical text
  * are interchangeable, so `dropDuplicatesWithinWatermark` keeping the
  * first occurrence is exactly the right operator, and its state store
  * (one 16-byte md5 key per distinct doc inside the watermark horizon)
  * is bounded by arrival rate × horizon, never corpus size. A
  * duplicate arriving AFTER the horizon passes the stream gate and is
  * caught by the batch q34/q78 tiers — the stream stage is a cheap
  * high-recall prefilter, the lake dedup is the exactness guarantee.
  *
  * Scale: both stages are narrow maps except the dedup, which shuffles
  * on the md5 key — the same single-exchange shape as batch q34. The
  * quality gate ([[graft.operators.TextOps.qualityScored]]) is a pure
  * map and runs before the sink, so rejected rows never hit storage.
  */
object CorpusIngest {

  /** A document as it arrives on the wire. */
  final case class Doc(doc_id: Long, text: String,
                       event_time: java.sql.Timestamp, source: String)

  /** Fingerprint → watermark → first-wins dedup → quality gate.
    *
    * @param docs           streaming DataFrame with at least
    *                       (doc_id, text, event_time, source)
    * @param watermarkDelay how late a duplicate may arrive and still be
    *                       caught by stream-side state
    * @param minQuality     q31-score floor; rows below it are dropped
    */
  def dedupedQualityStream(docs: DataFrame, watermarkDelay: String = "1 hour",
                           minQuality: Double = 0.25): DataFrame = {
    import docs.sparkSession.implicits._
    val deduped = docs
      .withColumn("text_md5", md5($"text"))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_md5")
    graft.operators.TextOps.qualityScored(deduped)
      .filter($"quality" >= minQuality)
  }
}
