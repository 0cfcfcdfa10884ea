package graft

import graft.operators.Drift
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift monitors: chi-square must vanish on identical distributions and
  * fire on a shifted one; the two-phase KS CDF must equal the naive
  * global-window formulation on random data and hit its analytic
  * endpoints (identical → 0, disjoint → 1).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def evDf(rows: Seq[(Double, Long, Long)]) =
    rows.toDF("value", "a", "b")

  test("KS = 0 on identical samples, 1 on disjoint supports") {
    val same = (1 to 50).flatMap(i => Seq((i.toDouble, 1L, 0L), (i.toDouble, 0L, 1L)))
    val ksSame = ks(evDf(same))
    assert(ksSame == 0.0, s"identical samples must give 0, got $ksSame")

    val disjoint = (1 to 30).map(i => (i.toDouble, 1L, 0L)) ++
      (100 to 130).map(i => (i.toDouble, 0L, 1L))
    assert(ks(evDf(disjoint)) == 1.0)
  }

  test("two-phase CDF equals the naive global window on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400) {
      val v = rnd.nextDouble() * 37.0
      if (rnd.nextBoolean()) (v, 1L, 0L) else (v, 0L, 1L)
    }
    val df = evDf(rows)
    val twoPhase = Drift.cdf2(df).orderBy($"value", $"ca", $"cb")
      .as[(Double, Long, Long)].collect().toSeq
    val w = Window.orderBy($"value")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.select($"value",
        sum($"a").over(w).as("ca"), sum($"b").over(w).as("cb"))
      .orderBy($"value", $"ca", $"cb")
      .as[(Double, Long, Long)].collect().toSeq
    assert(twoPhase == naive)
  }

  test("chi2 is 0 when every source matches the corpus; positive when shifted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // two sources with IDENTICAL length histograms, one shifted source
    val docs =
      (1 to 40).map(i => (i.toLong, "x", "en", "same_a", (i % 4) * 60L + 30L)) ++
      (41 to 80).map(i => (i.toLong, "x", "en", "same_b", (i % 4) * 60L + 30L)) ++
      (81 to 120).map(i => (i.toLong, "x", "en", "shifted", 540L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Drift.q96DriftChi2(spark, dir)
      .select($"source", $"chi2").as[(String, Double)].collect().toMap
    // the two matched sources have equal per-bucket shares of their own
    // buckets but the shifted source perturbs the corpus marginal, so
    // only exact-match-to-corpus gives 0 — assert ordering instead:
    assert(out("shifted") > out("same_a"), s"shifted must dominate: $out")
    assert(out("same_a") == out("same_b"), "identical sources must tie")
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Double = {
    val tot = df.agg(sum($"a").as("na"), sum($"b").as("nb"))
    Drift.cdf2(df).crossJoin(broadcast(tot))
      .select(abs($"ca".cast("double") / $"na" - $"cb".cast("double") / $"nb").as("d"))
      .agg(max($"d")).head.getDouble(0)
  }
}
