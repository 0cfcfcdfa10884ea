package graft

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import graft.model.Candle

/** Typed Dataset[Candle] pipeline (SURVEY.md §1.3: case-class Encoders
  * where type safety helps): the canonical candle flows through typed
  * transformations without losing the relational plan underneath.
  */
class TypedDatasetSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L

  private def series: Dataset[Candle] =
    (0 until 96).map { i =>
      Candle(new Timestamp(T0 + i * 900000L), 100 + i, 102 + i, 98 + i,
        101 + i, 7.0, if (i % 2 == 0) "BTC-USDT" else "ETH-USDT", "coinbase")
    }.toDS()

  test("typed filter/map/groupByKey preserve Candle semantics") {
    val btc = series.filter(_.symbol == "BTC-USDT")
    assert(btc.count() == 48)
    val ranges = btc.map(c => c.high - c.low)
    assert(ranges.distinct().collect().toSeq == Seq(4.0))
    val byHour = series.groupByKey(c => (c.symbol, c.timestamp.getTime / 3600000))
      .mapGroups { (key: (String, Long), it: Iterator[Candle]) =>
        val sym = key._1
        val cs = it.toSeq.sortBy(_.timestamp.getTime)
        Candle(cs.head.timestamp, cs.head.open,
          cs.map(_.high).max, cs.map(_.low).min, cs.last.close,
          cs.map(_.volume).sum, sym, cs.head.exchange)
      }
    assert(byHour.count() == 48) // 24h × 2 symbols
    // typed result agrees with the relational Resample operator
    val rel = graft.operators.Resample.resample(series.toDF(), "1 hour")
    assert(rel.count() == 48)
  }

  test("round-trip through parquet keeps the schema and encoder") {
    val dir = java.nio.file.Files.createTempDirectory("graft_typed").toString
    series.write.mode("overwrite").parquet(s"$dir/c")
    val back = spark.read.parquet(s"$dir/c").as[Candle]
    // nullability flags legitimately widen through parquet; names+types hold
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      series.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 96)
  }
}
