package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.normalize.Intervals

/** DataSource V2 batch connector for exchange candle scans — the custom
  * "planner" work SURVEY.md §4 identifies (chunk-sized input partitions,
  * server-side limit pushdown, per-partition rate limiting). Register as
  * `spark.read.format("graft.sources.CandleSource")`.
  *
  * Options:
  *  - `symbol`, `interval`, `startMs`, `endMs` — scan window (reference
  *    backfill parameters, crypto_collector.py:626–657)
  *  - `exchange` — which venue the scan represents
  *  - `rateLimitMs` — per-request throttle inside each partition reader.
  *    When absent, the PER-EXCHANGE default table applies (reference:
  *    binanceus 0.5 s, every other venue 1.0 s —
  *    crypto_collector.py:403); the throttle fires once per partition,
  *    matching the reference's one-sleep-per-HTTP-request (each
  *    partition is one ≤300-candle request window). Pass "0" to disable.
  *
  * Partition planning mirrors the reference's chunk math (T7): one
  * `InputPartition` per ≤300-candle window via [[Intervals.chunkWindows]],
  * so a 1000-executor cluster fetches all windows concurrently — the
  * reference's sequential chunk loop parallelized by the scheduler
  * instead of hand-rolled asyncio.
  *
  * The fetch boundary is deterministic synthetic data in this zero-egress
  * environment (same candle shape the fixture tests use); a production
  * deployment swaps [[CandlePartitionReader.fetch]] for the HTTP call —
  * partition planning, pushdown, and throttling are unchanged.
  */
class CandleSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CandleSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CandleTable(new CaseInsensitiveStringMap(properties))
}

object CandleSource {
  /** Per-exchange request-throttle defaults (crypto_collector.py:403):
    * Binance.US documents a tighter weight budget → 0.5 s; all other
    * venues use the conservative 1.0 s.
    */
  def defaultRateLimitMs(exchange: String): Long =
    if (exchange.equalsIgnoreCase("binanceus")) 500L else 1000L

  val Schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType),
    StructField("symbol", StringType), StructField("exchange", StringType)))
}

class CandleTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "candles"
  override def schema(): StructType = CandleSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new CandleScanBuilder(opts)
}

/** Pushdown surface: limit (the reference's 300-candle request cap
  * pushed to the "server") and required-columns pruning.
  */
class CandleScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {
  private var limit: Int = Int.MaxValue
  private var required: StructType = CandleSource.Schema

  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): Scan = new CandleScan(options, limit, required)
}

class CandleScan(options: CaseInsensitiveStringMap, limit: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val l = if (limit == Int.MaxValue) "none" else String.valueOf(limit)
    s"CandleScan(pushedLimit=$l, readSchema=${required.fieldNames.mkString(",")})"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val symbol = options.getOrDefault("symbol", "BTC-USDT")
    val interval = options.getOrDefault("interval", "1h")
    val exchange = options.getOrDefault("exchange", "coinbase")
    // absent window options get the Kucoin default-window synthesis
    // (crypto_collector.py:334–340): end = now, start = end − 300
    // intervals. `nowMs` is the frozen-clock test hook.
    val nowMs = options.getOrDefault("nowMs",
      String.valueOf(System.currentTimeMillis())).toLong
    val endMs = Option(options.get("endMs")).map(_.toLong).getOrElse(nowMs)
    val startMs = Option(options.get("startMs")).map(_.toLong)
      .getOrElse(Intervals.defaultWindowStartMs(endMs, interval))
    val rateMs = Option(options.get("rateLimitMs")).map(_.toLong)
      .getOrElse(CandleSource.defaultRateLimitMs(exchange))
    Intervals.chunkWindows(startMs, endMs, interval).map { case (s, e) =>
      CandleInputPartition(symbol, interval, exchange, s, e, rateMs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CandleReaderFactory(limit, required)
}

case class CandleInputPartition(symbol: String, interval: String,
                                exchange: String, startMs: Long, endMs: Long,
                                rateLimitMs: Long) extends InputPartition

class CandleReaderFactory(limit: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CandlePartitionReader(partition.asInstanceOf[CandleInputPartition], limit, required)
}

/** Reads one chunk window. `fetch` is the production HTTP seam; here it
  * synthesizes deterministic candles (value = f(timestamp)). The pushed
  * limit caps rows per partition — exactly the reference's per-request
  * `limit` parameter (crypto_collector.py:82, 93–96).
  */
class CandlePartitionReader(p: CandleInputPartition, limit: Int, required: StructType)
    extends PartitionReader[InternalRow] {
  private val stepMs = Intervals.intervalMs(p.interval)
  private var emitted = 0
  private var tsMs = p.startMs - stepMs

  // one throttle per partition = one per chunked request, exactly the
  // reference's sleep-before-each-HTTP-call (crypto_collector.py:403);
  // per-CANDLE sleeping would overstate the throttle 300×
  if (p.rateLimitMs > 0) Thread.sleep(p.rateLimitMs)

  /** Deterministic fake of the exchange response for one candle. */
  private def fetch(ts: Long): Map[String, Any] = {
    val base = (ts / stepMs) % 997
    Map("timestamp" -> ts * 1000L, // micros
      "open" -> base.toDouble, "high" -> (base + 1.0), "low" -> (base - 1.0),
      "close" -> (base + 0.5), "volume" -> 42.0,
      "symbol" -> p.symbol, "exchange" -> p.exchange)
  }

  override def next(): Boolean = {
    tsMs += stepMs
    emitted += 1
    emitted <= limit && tsMs < p.endMs
  }

  override def get(): InternalRow = {
    val row = fetch(tsMs)
    InternalRow.fromSeq(required.fields.toSeq.map { f =>
      (f.name, row(f.name)) match {
        case (_, s: String) => UTF8String.fromString(s)
        case (_, v) => v
      }
    })
  }

  override def close(): Unit = ()
}
