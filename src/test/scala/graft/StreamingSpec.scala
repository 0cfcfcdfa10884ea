package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.model.Candle
import graft.streaming.LiveIngest

/** Structured Streaming ingest tests (SURVEY.md §5.5): MemoryStream →
  * normalize → foreachBatch merge; late/duplicate injection must not
  * create duplicate keys in the lake.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L

  private def c(tsMs: Long, close: Double): Candle =
    Candle(new Timestamp(tsMs), 1, 2, 0.5, close, 10, "BTC-USDT", "coinbase")

  test("stream → merge lake: batches land, duplicates collapse keep-last") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Candle]
    val dir = Files.createTempDirectory("graft_stream").toString
    // data must be added BEFORE start: AvailableNow snapshots available
    // offsets at query start
    mem.addData(c(T0, 100.0), c(T0 + 900000, 101.0))
    val q = LiveIngest.start(spark, mem.toDF(), s"$dir/lake", s"$dir/ckpt",
      interval = "15m", trigger = Trigger.AvailableNow(),
      watermarkDelay = "10 minutes")
    q.awaitTermination()

    // second run: overlap T0 with corrected value + one new candle
    mem.addData(c(T0, 999.0), c(T0 + 1800000, 102.0))
    val q2 = LiveIngest.start(spark, mem.toDF(), s"$dir/lake", s"$dir/ckpt",
      interval = "15m", trigger = Trigger.AvailableNow(),
      watermarkDelay = "10 minutes")
    q2.awaitTermination()

    val out = spark.read.parquet(s"$dir/lake").orderBy("timestamp").collect()
    assert(out.length == 3, s"expected 3 rows, got ${out.length}")
    assert(out(0).getAs[Double]("close") == 999.0, "late overlap must win (keep-last)")
    assert(out(1).getAs[Double]("close") == 101.0)
    assert(out(2).getAs[Double]("close") == 102.0)
  }

  test("in-batch duplicate keys collapse to one row via the sink merge") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Candle]
    val dir = Files.createTempDirectory("graft_stream2").toString
    mem.addData(c(T0, 100.0), c(T0, 100.0), c(T0, 100.0))
    val q = LiveIngest.start(spark, mem.toDF(), s"$dir/lake", s"$dir/ckpt",
      interval = "15m", trigger = Trigger.AvailableNow(),
      watermarkDelay = "10 minutes")
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/lake").count() == 1)
  }
}
