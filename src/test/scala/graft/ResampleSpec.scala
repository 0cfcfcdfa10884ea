package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.model.Candle
import graft.operators.{Relational3, Resample}

/** Resampling property (SURVEY.md §5.3): resample(15m → 1h) must agree
  * with directly aggregating the hour, on generated candle series.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1609459200000L

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  // a day of contiguous 15m candles with generated closes
  private val seriesGen: Gen[List[Double]] =
    Gen.listOfN(96, Gen.choose(10.0, 1000.0))

  private def candles(closes: List[Double]): DataFrame =
    closes.zipWithIndex.map { case (c, i) =>
      Candle(new Timestamp(T0 + i * 900000L), c - 1, c + 2, c - 2, c, 5.0, "BTC-USDT", "x")
    }.toDF()

  test("15m → 1h resample equals direct hourly aggregation") {
    check(Prop.forAll(seriesGen) { closes =>
      val df = candles(closes)
      val got = Resample.resample(df, "1 hour")
        .select($"timestamp", $"open", $"high", $"low", $"close", $"volume", $"n_src")
        .as[(Timestamp, Double, Double, Double, Double, Double, Long)]
        .collect().sortBy(_._1.getTime)

      val want = closes.grouped(4).zipWithIndex.map { case (g, h) =>
        (T0 + h * 3600000L, g.head - 1, g.map(_ + 2).max, g.map(_ - 2).min, g.last, 20.0, 4L)
      }.toSeq

      got.length == want.length && got.zip(want).forall { case (g, w) =>
        g._1.getTime == w._1 && g._2 == w._2 && g._3 == w._3 &&
          g._4 == w._4 && g._5 == w._5 && math.abs(g._6 - w._6) < 1e-9 && g._7 == w._7
      }
    })
  }

  test("resample to 1 day covers the whole series in one candle") {
    val closes = (1 to 96).map(_.toDouble).toList
    val out = Resample.resample(candles(closes), "1 day").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Double]("open") == 0.0)    // first close 1.0 - 1
    assert(r.getAs[Double]("close") == 96.0)
    assert(r.getAs[Long]("n_src") == 96)
  }

  test("approx_count_distinct stays within its 1% error bound") {
    // q46's oracle-checked form folds the bound INTO the output (the
    // hll_within_5rsd audit flag); the spec asserts every group passes
    // and the exact side is sane
    val df = Relational3.q46ApproxDistinct(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0L)
      assert(r.getAs[Boolean]("hll_within_5rsd"),
        s"HLL estimate outside 5% of exact for ${r.getAs[String]("l_returnflag")}")
    }
  }
}
