package graft

import graft.operators.{Mixing, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mixing/vocabulary tier: a hash-matching oracle agrees on VALUES,
  * so these pin the parts a co-broken oracle could still get wrong —
  * the integer sqrt against BigInt truth, the rare-token recount
  * against a from-scratch Scala implementation, and the bounded-heap
  * domain cap against the windowed row_number formulation it replaces.
  */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def bigSqrt(n: Long): Long =
    java.math.BigInteger.valueOf(n).sqrt().longValueExact()

  test("q85 isqrt column is the exact floor sqrt (BigInt truth, adversarial n)") {
    val hazards = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      (1L << 20) * (1L << 20) - 1, (1L << 20) * (1L << 20),
      999999999999L, 1000000000000L, 4503599627370495L)
    val rng = new scala.util.Random(42)
    val ns = hazards ++ Seq.fill(500)(math.abs(rng.nextLong()) % 4503599627370496L)
    val got = ns.toDF("n").select($"n", Mixing.isqrt($"n").as("r"))
      .as[(Long, Long)].collect()
    for ((n, r) <- got) {
      val truth = bigSqrt(n)
      assert(r == truth, s"isqrt($n) = $r, want $truth")
    }
  }

  test("q85 mixture: kept docs obey their source's rate; rates are the integer shares") {
    val rows = Mixing.q85MixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("bucket") < r.getAs[Long]("rate_pm"))
    val rates = rows.map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("w"), r.getAs[Long]("rate_pm"))).distinct
    // integer shares can only undershoot 1000, never overshoot
    assert(rates.map(_._3).sum <= 1000)
    // each rate is exactly (w * 1000) div Σw over the FULL source table
    // (recompute Σw from the corpus, not just from sources that kept docs)
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"source").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val totW = counts.values.map(bigSqrt).sum
    for ((src, w, pm) <- rates) {
      assert(w == bigSqrt(counts(src)))
      assert(pm == w * 1000 / totW)
    }
  }

  test("q86 rare-token ratio equals a from-scratch Scala recount") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val nDocs = toks.length
    val dfreq = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    val common = dfreq.collect { case (t, c) if c * 10 >= nDocs => t }.toSet
    val want = toks.map { case (id, ts) => id -> ts.count(t => !common(t)) }.toMap
    val got = Mixing.q86RareTokenRatio(spark, sf)
      .select($"doc_id", $"n_toks", $"n_rare", $"rare_ratio").collect()
    assert(got.length == nDocs)
    for (r <- got) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_rare") == want(id).toLong, s"doc $id")
      assert(r.getAs[Long]("n_rare") <= r.getAs[Long]("n_toks"))
      assert(r.getAs[Double]("rare_ratio") ==
        want(id).toDouble / r.getAs[Long]("n_toks"))
    }
    // the signal is live: the planted `dup` marker is rare, so some
    // docs must score above zero (an all-zero column would also "pass")
    assert(got.exists(_.getAs[Long]("n_rare") > 0))
  }

  test("q87 bounded-heap domain cap is bit-equal to the windowed row_number form") {
    val scored = TextOps.qualityScored(
      spark.read.parquet(s"$sf/documents.parquet").filter($"doc_id".isNotNull))
    val w = Window.partitionBy($"source").orderBy($"quality".desc, $"doc_id")
    val naive = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"source", $"rk", $"doc_id", $"quality")
      .as[(String, Long, Long, Double)].collect().toSet
    val got = Mixing.q87DomainCap(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == naive)
    assert(got.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("q128 split: exact duplicates never straddle splits; proportions are sane") {
    val dir = java.nio.file.Files.createTempDirectory("split").toString
    // 30 planted duplicate groups of 3 copies each (spread doc_ids so a
    // doc-keyed hash WOULD straddle), plus unique filler
    val dups = (0 until 30).flatMap { g =>
      Seq(g.toLong, 1000L + g, 2000L + g).map(id =>
        (id, s"duplicate group $g body text", "en", "s", 1L))
    }
    val uniq = (3000 until 3200).map(i =>
      (i.toLong, s"unique text number $i", "en", "s", 1L))
    (dups ++ uniq).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Mixing.q128LeakageSafeSplit(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_rep"),
        r.getAs[Long]("group_size"), r.getAs[String]("split")))
    assert(out.length == 290)
    // leakage-freedom: every group's members share one split
    out.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._4).distinct.length == 1, s"group straddles splits: $rs")
    }
    // dup groups keep their min doc_id as representative and size 3
    out.filter(_._1 < 3000).groupBy(_._2).foreach { case (rep, rs) =>
      assert(rs.length == 3 && rs.forall(_._3 == 3L) && rep == rs.map(_._1).min)
    }
    // all three splits materialize at plausible proportions
    val bySplit = out.groupBy(_._4).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit.toString)
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("q130 token budget: sqrt temperature up-weights small sources; shares are consistent") {
    val dir = java.nio.file.Files.createTempDirectory("budget").toString
    // big source: 100 docs x 100 tokens; small source: 4 docs x 25 tokens
    val big = (0 until 100).map(i =>
      (i.toLong, (1 to 100).map(k => s"b$k").mkString(" "), "en", "big", 1L))
    val small = (100 until 104).map(i =>
      (i.toLong, (1 to 25).map(k => s"s$k").mkString(" "), "en", "small", 1L))
    (big ++ small).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Mixing.q130TokenBudget(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (b, s2) = (out("big"), out("small"))
    assert(b.getAs[Long]("n_tokens") == 10000L && s2.getAs[Long]("n_tokens") == 100L)
    // w = isqrt: 100 and 10 → small source gets 1/10 the allocation of
    // big despite having 1/100 the tokens — i.e. 10x the epochs
    assert(b.getAs[Long]("w") == 100L && s2.getAs[Long]("w") == 10L)
    assert(s2.getAs[Long]("epochs_milli") > 10L * b.getAs[Long]("epochs_milli") / 2,
      s"small source must be up-weighted: ${s2.getAs[Long]("epochs_milli")} vs ${b.getAs[Long]("epochs_milli")}")
    // integer-share accounting: allocations sum to within |sources| of the budget
    val allocSum = out.values.map(_.getAs[Long]("alloc_tokens")).sum
    assert(allocSum <= 1000000L && allocSum >= 1000000L - 2,
      s"alloc total $allocSum vs budget 1000000")
    // epochs_milli is exactly the integer identity on its own columns
    for (r <- out.values)
      assert(r.getAs[Long]("epochs_milli") ==
        r.getAs[Long]("alloc_tokens") * 1000 / r.getAs[Long]("n_tokens"))
  }

  test("q120 priority sample: DLT invariants hold and the subset-sum estimate lands") {
    val rows = Mixing.q120PrioritySample(spark, sf).collect()
    assert(rows.length == 64, s"k = 64 sample, got ${rows.length}")
    val tau = rows.head.getAs[Long]("tau")
    for (r <- rows) {
      // every kept priority beats the threshold (it IS the (k+1)-th
      // largest), and the estimator is the DLT max(w, τ)
      assert(r.getAs[Long]("priority") >= tau)
      assert(r.getAs[Long]("est_weight") ==
        math.max(r.getAs[Long]("weight"), tau))
      assert(r.getAs[Long]("tau") == tau, "τ is a corpus constant")
    }
    // priority sampling's subset-sum estimator is near-unbiased with
    // relative SE ≈ 1/√(k−1) ≈ 12.5% for the TOTAL; 500 ‰ is a loose
    // deterministic bound (the draw is a fixed hash, not an RNG — this
    // asserts the estimator arithmetic, not a tail probability)
    val err = rows.head.getAs[Long]("err_permille")
    assert(err < 500, s"estimate off by $err permille — estimator arithmetic broken?")
    // determinism: same fixed-hash draw, same sample
    val again = Mixing.q120PrioritySample(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q120 stays exact when priorities exceed 2^53 (long-keyed heap)") {
    // Round-7 advice: priority = n_chars·P div h crosses 2^53 once
    // n_chars is large and h small; the old double-keyed heap could then
    // misorder and recover a rounded τ. Weights here push every priority
    // into the >2^53 regime; expected sample and τ are recomputed in
    // exact Long arithmetic from the query's own published hash family.
    val P = 1000000007L
    val a = 2654435761L % P
    val dir = java.nio.file.Files.createTempDirectory("dlt53").toString
    // engineer tiny h: pick doc_ids whose affine hash lands on h = t+1
    // (t = 0..69) via the modular inverse of a, so priority = w·P div h
    // sits above 2^53 for EVERY planted doc without w·P overflowing int64
    val aInv = BigInt(a).modInverse(BigInt(P)).toLong
    val docs = (0L until 70L).map { t =>
      val id = ((t - 97911L % P + P) % P) * BigInt(aInv) % P
      (id.toLong, 700000000L + t * 13L)
    }
    docs.toDF("doc_id", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expect = docs.map { case (id, w) =>
      val h = ((id % P) * a + 97911L) % P + 1L
      (id, w, (w * P) / h)
    }.sortBy { case (id, _, p) => (-p, id) }
    assert(expect.forall(_._3 > (1L << 53)), "test must exercise the >2^53 regime")
    val expTau = expect(64)._3
    val got = Mixing.q120PrioritySample(spark, dir)
      .select($"doc_id", $"priority", $"tau").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == expect.take(64).map(t => (t._1, t._3)),
      s"sample must be the exact top-64 by int64 priority")
    assert(got.forall(_._3 == expTau), s"τ must be the exact 65th priority $expTau")
  }

  test("q139 curriculum: phases monotone in quality, bounded 0..9, deciles populated, deterministic") {
    val rows = Mixing.q139CurriculumPhases(spark, sf)
      .select($"doc_id", $"quality", $"phase").as[(Long, Double, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 9L), "phase must be a decile index")
    // monotone: sorting by quality must sort phases (thresholds are a
    // single global cut list, so no quality inversion can cross phases)
    val byQ = rows.sortBy(_._2).map(_._3)
    assert(byQ == byQ.sorted, "phases must be monotone in quality")
    // the sf0.001 corpus has diverse qualities and the 512-sample covers
    // all 500 docs, so most deciles must actually be populated
    assert(rows.map(_._3).distinct.size >= 8,
      s"expected ≥8 populated deciles, got ${rows.map(_._3).distinct.sorted}")
    val again = Mixing.q139CurriculumPhases(spark, sf)
      .select($"doc_id", $"quality", $"phase").as[(Long, Double, Long)].collect().toSeq
    assert(rows.toSet == again.toSet, "phase assignment must be deterministic")
  }

  test("q151 k-anonymity: a singleton quasi-identifier group is at risk, a 5-group is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q151").toString
    (Seq((1L, "en", "web", 150L)) ++ (2L to 6L).map(i => (i, "en", "web", 250L)))
      .toDF("doc_id", "lang", "source", "n_chars")
      .selectExpr("doc_id", "'t' AS text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Mixing.q151KAnonymity(spark, dir)
      .select($"doc_id", $"k", $"at_risk").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got.head == ((1L, 1L, true)), got.mkString("; "))
    assert(got.tail.forall(r => r._2 == 5L && !r._3), got.mkString("; "))
  }

  test("q170 l-diversity: homogeneous group at risk, diverse safe, dominated at risk despite l ≥ 3") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q170").toString
    val t0 = 1704067200000L // 2024-01-01T00:00Z — hour_of_day 0
    var id = 0L
    def ev(userBase: Long, k: Int, n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
      (1 to n).map { i =>
        id += 1
        (id, new java.sql.Timestamp(t0 + i * 1000L), userBase + id % 10, "view",
          1.0, s"""{"k": $k}""")
      }
    // bucket 0: 4 events, all k=7 → l = 1 → homogeneity risk
    // bucket 1: k ∈ {1,2,3,4} balanced → l = 4, dom 250 ‰ → safe
    // bucket 2: 9×k5 + k6 + k7 → l = 3 but dom = 9000 div 11 = 818 ‰ → at risk
    (ev(0, 7, 4) ++
      ev(10, 1, 1) ++ ev(10, 2, 1) ++ ev(10, 3, 1) ++ ev(10, 4, 1) ++
      ev(20, 5, 9) ++ ev(20, 6, 1) ++ ev(20, 7, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Mixing.q170LDiversity(spark, dir)
      .select($"user_bucket", $"k", $"l", $"dom_permille", $"at_risk")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 4L, 1L, 1000L, true), (1L, 4L, 4L, 250L, false),
      (2L, 11L, 3L, 818L, true)), got.mkString("; "))
  }

  test("q153 training order: per-shard positions are a contiguous 0-based permutation; reruns identical") {
    import spark.implicits._
    val a = graft.operators.Mixing.q153TrainingOrder(spark, sf)
      .select($"doc_id", $"shard", $"pos_in_shard", $"shard_docs")
      .as[(Long, Long, Long, Long)].collect()
    for ((_, g) <- a.groupBy(_._2)) {
      val ps = g.map(_._3).sorted
      assert(ps.toSeq == (0L until g.length.toLong).toSeq,
        s"positions must tile 0..n-1 within the shard")
      assert(g.forall(_._4 == g.length.toLong))
    }
    // deterministic: a second run assigns the identical order
    val b = graft.operators.Mixing.q153TrainingOrder(spark, sf)
      .select($"doc_id", $"shard", $"pos_in_shard", $"shard_docs")
      .as[(Long, Long, Long, Long)].collect()
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
  }
}
