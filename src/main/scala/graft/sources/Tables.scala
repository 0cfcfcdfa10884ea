package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver test tables (`TESTDATA.md`).
  *
  * Plain `spark.read.parquet` so Catalyst's vectorized Parquet scan,
  * predicate pushdown, and column pruning apply untouched. At 100 TB these
  * tables would be Hive-partitioned / bucketed; the reader stays identical —
  * partition pruning keys off the directory layout, not this code.
  */
object Tables {
  /** Inferred-schema memo, keyed by full path. Every `spark.read.parquet`
    * call pays a driver-side footer read for schema inference; a bench or
    * verify run resolves the same nine immutable test tables hundreds of
    * times, so the first resolution per path caches the inferred schema
    * and later reads supply it explicitly (identical StructType — the
    * memo stores exactly what inference produced, per path, so a
    * different sfDir can never see a stale schema). Pure plan-time
    * metadata: no data or results are cached.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val cached = schemaMemo.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaMemo.putIfAbsent(path, df.schema)
      df
    }
  }

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`:
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 otherwise
    * refuses to read (PARQUET_TYPE_ILLEGAL). [[Session.builder]] does.
    */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events` with `ts` restored to TimestampType (µs). With nanosAsLong
    * the nanos column arrives as LongType; `DIV 1000` is exact integer
    * math (a double-division round trip would lose precision past 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
