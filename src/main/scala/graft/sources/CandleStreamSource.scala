package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.normalize.Intervals

/** Streaming DataSource V2 source for live candle collection — the
  * reference's `live_collection` loop (crypto_collector.py:659–717)
  * as a real `MicroBatchStream`:
  *
  *  - OFFSETS are candle-aligned epoch-ms watermarks (the durable
  *    version of the reference's in-memory `last_collected_ts`, §2.9 T4):
  *    Spark checkpoints them, so restart resumes exactly where the last
  *    committed batch ended — no refetch-from-start.
  *  - `latestOffset` advances to the last COMPLETED interval boundary
  *    (floor(now/interval)·interval): the reference fetches only closed
  *    candles per cycle (T3's `[boundary − interval, boundary]` window).
  *  - Each micro-batch [start, end) is split into ≤300-candle input
  *    partitions (same chunk math as the batch connector, T7), fetched
  *    in parallel by executors.
  *
  * Options: `symbol`, `interval`, `exchange`, `startMs` (initial offset),
  * `nowMs` (test hook: frozen clock; defaults to wall clock),
  * `rateLimitMs`. The fetch seam is the same deterministic synthetic as
  * [[CandlePartitionReader]] — production swaps in HTTP.
  */
class CandleStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CandleSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CandleStreamTable(new CaseInsensitiveStringMap(properties))
}

class CandleStreamTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "candle_stream"
  override def schema(): StructType = CandleSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CandleSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CandleMicroBatchStream(options)
      }
    }
}

/** One tailed series: the reference's live loop covers the full
  * symbols × intervals × exchanges matrix in a single cycle
  * (crypto_collector.py:678–679); here each tuple is one offset entry.
  */
case class CandleSeries(symbol: String, interval: String, exchange: String) {
  def key: String = s"$symbol:$interval:$exchange"
}

/** Offset = per-series map of candle-aligned epoch-ms watermarks — the
  * durable `last_collected_ts[symbol][interval]` table (§2.9 T4), so ONE
  * streaming query tails the whole matrix and each series resumes
  * independently from the shared checkpoint. JSON is a flat sorted map
  * (`{"BTC-USDT:15m:coinbase":1609459200000,…}`); a legacy bare-long
  * checkpoint (the old single-series format) deserializes onto the sole
  * configured series.
  */
case class CandleOffset(offsets: Map[String, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}

class CandleMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  /** `series` = comma-separated `symbol:interval:exchange` triples; the
    * single-series options (`symbol`/`interval`/`exchange`) remain as the
    * one-tuple fallback.
    */
  private val series: Seq[CandleSeries] =
    Option(options.get("series")).filter(_.nonEmpty) match {
      case Some(spec) => spec.split(',').toSeq.map { s =>
        s.split(':') match {
          case Array(sym, iv, ex) => CandleSeries(sym.trim, iv.trim, ex.trim)
          case _ => throw new IllegalArgumentException(
            s"series entry must be symbol:interval:exchange, got '$s'")
        }
      }
      case None => Seq(CandleSeries(
        options.getOrDefault("symbol", "BTC-USDT"),
        options.getOrDefault("interval", "15m"),
        options.getOrDefault("exchange", "coinbase")))
    }
  // Offset keys round-trip through the flat JSON map, so every component
  // must stay inside the parser's alphabet: no ',' (entry separator), no
  // '"' (key quoting), no empty parts. Rejecting here turns a would-be
  // silent checkpoint corruption into a config error at query start.
  series.foreach { ser =>
    Seq(ser.symbol, ser.interval, ser.exchange).foreach { part =>
      require(part.nonEmpty && !part.exists(c => c == ',' || c == '"'),
        s"series component '$part' in '${ser.key}' must be non-empty and contain no ',' or '\"'")
    }
  }
  private val startMs = options.getOrDefault("startMs", "1609459200000").toLong
  private val rateMs = options.getOrDefault("rateLimitMs", "0").toLong

  private def nowMs: Long =
    Option(options.get("nowMs")).map(_.toLong)
      .getOrElse(System.currentTimeMillis())

  private def alignDown(ms: Long, interval: String): Long = {
    val step = Intervals.intervalMs(interval)
    (ms / step) * step
  }

  override def initialOffset(): Offset = CandleOffset(
    series.map(s => s.key -> alignDown(startMs, s.interval)).toMap)

  private def currentLatest: CandleOffset = CandleOffset(
    series.map(s => s.key -> alignDown(nowMs, s.interval)).toMap)

  /** `Trigger.AvailableNow` support: the end offset is pinned ONCE at
    * query start (the aligned scheduler's boundary snapshot), so the
    * catch-up run drains exactly what was closed then and terminates even
    * if the clock keeps advancing mid-run.
    */
  private var availableNowEnd: Option[CandleOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(currentLatest)
  override def reportLatestOffset(): Offset = currentLatest

  /** Admission-control variant (SupportsTriggerAvailableNow extends
    * SupportsAdmissionControl): no per-batch cap — a batch is already
    * bounded by closed-candle boundaries, and chunking splits it into
    * ≤300-candle input partitions.
    */
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  /** Last completed interval boundary per series — only closed candles
    * are visible (a 1d series advances once a day while its 15m sibling
    * advances every quarter hour).
    */
  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(currentLatest)

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (!t.startsWith("{")) {
      // legacy single-series checkpoint (bare epoch-ms long): only safe
      // to adopt when exactly one series is configured — with several,
      // assigning it to series.head would depend on option ORDER and
      // silently hand the saved watermark to whichever series happens to
      // be listed first (the others would rewind to startMs and
      // re-ingest). Fail loudly instead.
      if (series.size > 1) throw new IllegalStateException(
        s"legacy single-series offset '$t' cannot be resumed with ${series.size} " +
          "configured series; restart from a fresh checkpoint or run with the " +
          "original single series")
      CandleOffset(Map(series.head.key -> t.toLong))
    } else {
      val body = t.stripPrefix("{").stripSuffix("}").trim
      val entries =
        if (body.isEmpty) Map.empty[String, Long]
        else body.split(',').map { kv =>
          val Array(k, v) = kv.split(":(?=[^:]*$)", 2) // split on LAST colon
          k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
        }.toMap
      CandleOffset(entries)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CandleOffset].offsets
    val e = end.asInstanceOf[CandleOffset].offsets
    series.flatMap { ser =>
      val from = s.getOrElse(ser.key, alignDown(startMs, ser.interval))
      val to = e.getOrElse(ser.key, from)
      if (to <= from) Seq.empty
      else Intervals.chunkWindows(from, to, ser.interval).map { case (cs, ce) =>
        CandleInputPartition(ser.symbol, ser.interval, ser.exchange, cs, ce, rateMs): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new CandlePartitionReader(p.asInstanceOf[CandleInputPartition],
          Int.MaxValue, CandleSource.Schema)
    }

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}
