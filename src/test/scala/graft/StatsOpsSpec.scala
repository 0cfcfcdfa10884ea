package graft

import graft.operators.StatsOps

/** q77 extended stats: the round-4 review found the un-reduced co-moment
  * n·Σxy − Σx·Σy exceeds int64 around 10⁵ rows/group (sf0.1), where a
  * non-ANSI decimal→long cast silently nulls the column while the sf0.01
  * oracle stays green. The reduced-by-n formulation must stay non-null
  * and finite AT sf0.1 — this spec runs there, not at the oracle sf.
  */
class StatsOpsSpec extends SparkSpec {

  test("q77 stats are non-null and finite at sf0.1 (int64 headroom)") {
    val rows = StatsOps.q77CorrStats(spark, "/root/testdata/sf0.1").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(!r.anyNull, s"null field in $r — co-moment overflow regressed")
      val corr = r.getAs[Double]("corr_qty_price")
      assert(!corr.isNaN && math.abs(corr) <= 1.0, s"corr out of range: $corr")
      for (c <- Seq("covar_pop", "regr_slope", "regr_intercept", "stddev_pop_price")) {
        val v = r.getAs[Double](c)
        assert(java.lang.Double.isFinite(v), s"$c not finite: $v")
      }
      assert(r.getAs[Double]("stddev_pop_price") > 0.0)
      assert(r.getAs[Long]("n") > 100000L, "sf0.1 groups should exceed 1e5 rows")
    }
  }

  test("q77 reduced co-moment matches a driver-side exact computation at sf0.001") {
    // Independent oracle in BigInt arithmetic over the same quantization.
    val d = sf
    val df = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    val groups = df.groupBy(_.getString(0))
    val expected = groups.map { case (k, rs) =>
      val xs = rs.map(r => BigInt(math.floor(r.getDouble(1) * 100).toLong))
      val ys = rs.map(r => BigInt(math.floor(r.getDouble(2) / 100).toLong))
      val n = BigInt(rs.length)
      val covnum = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
      // floor-division (BigInt / truncates; adjust when signs differ and non-exact)
      val q = covnum - (((covnum % n) + n) % n)
      k -> (q / n).toLong
    }
    val got = StatsOps.q77CorrStats(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cov_num_red")).toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
