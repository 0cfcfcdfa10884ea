package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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

/** Offset = candle-aligned epoch millis (watermark semantics). */
case class CandleOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

class CandleMicroBatchStream(options: CaseInsensitiveStringMap) extends MicroBatchStream {
  private val symbol = options.getOrDefault("symbol", "BTC-USDT")
  private val interval = options.getOrDefault("interval", "15m")
  private val exchange = options.getOrDefault("exchange", "coinbase")
  private val stepMs = Intervals.intervalMs(interval)
  private val startMs = options.getOrDefault("startMs", "1609459200000").toLong
  private val rateMs = options.getOrDefault("rateLimitMs", "0").toLong

  private def nowMs: Long =
    Option(options.get("nowMs")).map(_.toLong)
      .getOrElse(System.currentTimeMillis())

  override def initialOffset(): Offset = CandleOffset(alignDown(startMs))

  /** Last completed interval boundary — only closed candles are visible. */
  override def latestOffset(): Offset = CandleOffset(alignDown(nowMs))

  private def alignDown(ms: Long): Long = (ms / stepMs) * stepMs

  override def deserializeOffset(json: String): Offset = CandleOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CandleOffset].ms
    val e = end.asInstanceOf[CandleOffset].ms
    if (e <= s) Array.empty
    else Intervals.chunkWindows(s, e, interval).map { case (cs, ce) =>
      CandleInputPartition(symbol, interval, exchange, cs, ce, rateMs): InputPartition
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
