package graft

import graft.operators.Sketches

/** q113 Count–Min semantics the sf0.01 hash-match can't isolate: the
  * one-sided error guarantee, exactness in the collision-free case, and
  * a from-scratch recount of the whole 4×512 grid.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")

  private val M = 9007199254740881L
  private val P = 1000000007L
  private val A = Seq(3L, 5L, 7L, 11L)
  private val B = Seq(17L, 89L, 233L, 610L)

  private def hp(tok: String): Long =
    tok.map(_.toLong).foldLeft(0L)((acc, c) => (acc * 31 + c) % M) % P

  private def bucket(r: Int, h: Long): Long = ((A(r) * h + B(r)) % P) % 512

  test("q113 estimates match a from-scratch grid recount and never undercount") {
    // 26 token types with distinct counts 1..26 (token = letter repeated
    // 3x so poly hashes spread), one doc per instance batch
    val types = ('a' to 'z').map(c => s"$c$c$c")
    val corpus = docs(types.zipWithIndex.map { case (t, i) =>
      (i + 1).toLong -> Seq.fill(i + 1)(t).mkString(" ")
    }: _*)
    val got = Sketches.countMinHeavyHitters(corpus)
      .as[(String, Long, Long, Long)].collect().toSeq

    // from-scratch truth
    val counts = types.zipWithIndex.map { case (t, i) => t -> (i + 1).toLong }.toMap
    val grid = Array.fill(4)(collection.mutable.Map.empty[Long, Long].withDefaultValue(0L))
    for ((t, c) <- counts; r <- 0 until 4) grid(r)(bucket(r, hp(t))) += c
    def est(t: String): Long = (0 until 4).map(r => grid(r)(bucket(r, hp(t)))).min
    val top10 = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    val want = top10.map { case (t, c) => (t, c, est(t), est(t) - c) }
    assert(got == want, s"got $got\nwant $want")
    got.foreach { case (t, tc, e, over) =>
      assert(e >= tc && over == e - tc, s"CMS must never undercount: $t")
    }
  }

  test("q113 is exact when a token collides with nothing in some row") {
    // a single token type: its cells contain only its own count → est == true
    val corpus = docs(1L -> Seq.fill(7)("lonely").mkString(" "))
    val got = Sketches.countMinHeavyHitters(corpus)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("lonely", 7L, 7L, 0L)), s"got $got")
  }

  test("q116 KMV: exact below K, within the order-statistic error bound above it") {
    // planted lineitem: group X has 10k distinct keys (estimator path),
    // group S has 100 (< K = 256 → counted exactly)
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    val rows =
      (1L to 10000L).map(k => ("X", k)) ++
      (1L to 10000L).map(k => ("X", k)) ++ // duplicates must not matter
      (1L to 100L).map(k => ("S", k))
    rows.toDF("l_returnflag", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Sketches.q116KmvCardinality(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("S") == ((100L, 100L, 0L)),
      s"below-K group must be exact, got ${got("S")}")
    val (exactX, estX, errX) = got("X")
    assert(exactX == 10000L)
    // KMV relative-error std dev ≈ 1/√(K−2) ≈ 63‰ at K = 256; 4σ bound
    assert(errX <= 250L, s"estimate $estX strays ${errX}‰ from 10000")
  }

  test("q116 below-K branch is exact even when keys collide modulo P") {
    // Round-7 verdict item 6: two keys exactly P apart share one affine
    // hash (the map is a bijection only below the modulus), so n_hashes
    // undercounts — the below-K value must come from countDistinct, not
    // from the hash relation. Three distinct keys, two colliding mod P.
    val P = 1000000007L
    val dir = java.nio.file.Files.createTempDirectory("kmvP").toString
    Seq(("C", 5L), ("C", 5L + P), ("C", 9L))
      .toDF("l_returnflag", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Sketches.q116KmvCardinality(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("C") == ((3L, 3L, 0L)),
      s"colliding keys must still count exactly below K, got ${got("C")}")
  }

  test("Misra-Gries: k-bound, no overcount, N/(k+1) undercount, hitter survival — any merge tree") {
    // a stream with one true heavy hitter (30% mass), a mid tier, and a
    // long distinct tail, evaluated under three different merge shapes
    // (sequential, balanced, skewed) — the guarantees must hold for all
    val k = 7
    val mg = new graft.functions.MisraGries(k)
    val stream: Seq[String] =
      Seq.fill(300)("hot") ++
      (0 until 200).map(i => s"mid${i % 5}") ++
      (0 until 500).map(i => s"tail$i")
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def summarize(chunks: Seq[Seq[String]], mergeLeft: Boolean): Map[String, Long] = {
      val parts = chunks.map(c => c.foldLeft(mg.zero)(mg.reduce))
      if (mergeLeft) parts.reduceLeft(mg.merge) else parts.reduceRight(mg.merge)
    }
    val shapes = Seq(
      summarize(Seq(stream), mergeLeft = true),
      summarize(stream.grouped(100).toSeq, mergeLeft = true),
      summarize(stream.grouped(100).toSeq, mergeLeft = false),
      summarize(Seq(stream.take(950), stream.drop(950)), mergeLeft = true))
    for (sk <- shapes) {
      assert(sk.size <= k, s"summary exceeded k: ${sk.size}")
      for ((t, est) <- sk) {
        assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
        assert(exact(t) - est <= n / (k + 1),
          s"$t undercount ${exact(t) - est} breaks the N/(k+1)=${n / (k + 1)} bound")
      }
      // survival guarantee: 300 > 1000/8
      assert(sk.contains("hot"), s"true heavy hitter evicted: $sk")
    }
  }

  test("q135 audit booleans hold on a skew-partitioned corpus with a planted hitter") {
    val dir = java.nio.file.Files.createTempDirectory("mg135").toString
    // 400 of 1000 tokens are the hitter (threshold at N/32 ≈ 31): the
    // corpus is written across 16 partitions so the aggregate exercises
    // partial buffers and cross-partition merges
    val docs = (0 until 100).map { i =>
      val toks = Seq.fill(4)("hottok") ++ (0 until 6).map(j => s"u${i}_$j")
      (i.toLong, toks.mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source", "CAST(10 AS BIGINT) AS n_chars")
      .repartition(16)
      .write.parquet(s"$dir/documents.parquet")
    val got = Sketches.q135MisraGries(spark, dir)
      .as[(String, Long, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(("hottok", 400L, true, true)), s"got $got")
  }

  test("q129 quantile sketch: rank errors inside the sampling bound; estimates monotone; deterministic") {
    val rows = Sketches.q129QuantileSketch(spark, sf)
      .orderBy($"p").collect()
    assert(rows.length == 7)
    // uniform-sample quantile rank error: std ≈ √(p(1−p)/K)·1000 ≤
    // 1000/(2√512) ≈ 22‰; 150‰ is a ~6σ deterministic-draw bound
    for (r <- rows)
      assert(r.getAs[Long]("rank_err_permille") <= 150L,
        s"p=${r.getAs[Long]("p")} rank err ${r.getAs[Long]("rank_err_permille")}‰")
    val ests = rows.map(_.getAs[Double]("est"))
    assert(ests.zip(ests.tail).forall { case (x, y) => x <= y },
      "quantile estimates must be monotone in p")
    val again = Sketches.q129QuantileSketch(spark, sf).orderBy($"p").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q181 join-card estimate: exact fallback below K, sane estimate above (planted overlap)") {
    import spark.implicits._
    // SMALL: 100 ∪ 100 keys, |∩| = 50 — union 150 < K=256 → exact branch
    val d1 = java.nio.file.Files.createTempDirectory("q181a").toString
    (1L to 100L).toDF("o_orderkey").write.parquet(s"$d1/orders.parquet")
    (51L to 150L).toDF("l_orderkey").write.parquet(s"$d1/lineitem.parquet")
    val small = Sketches.q181JoinCardEstimate(spark, d1).collect().head
    assert(small.getAs[Long]("exact_common") == 50L)
    assert(small.getAs[Long]("est_common") == 50L, "below-K must be exact")
    assert(small.getAs[Long]("err_permille") == 0L)
    // LARGE: 4000 ∪ 4000, |∩| = 2000 (union 6000 ≥ K) — estimate branch;
    // KMV relative error ~1/√K ≈ 6%; 250‰ is a generous deterministic bound
    val d2 = java.nio.file.Files.createTempDirectory("q181b").toString
    (1L to 4000L).toDF("o_orderkey").write.parquet(s"$d2/orders.parquet")
    (2001L to 6000L).toDF("l_orderkey").write.parquet(s"$d2/lineitem.parquet")
    val big = Sketches.q181JoinCardEstimate(spark, d2).collect().head
    assert(big.getAs[Long]("exact_common") == 2000L)
    assert(big.getAs[Long]("err_permille") <= 250L,
      s"estimate too far off: $big")
  }

  test("q183 rolling sketch: below-K windows exact, above-K estimate bounded") {
    import spark.implicits._
    val day0us = 1700006400L * 1000000L // day-aligned epoch µs
    def ev(id: Long, day: Int, user: Long) =
      (id, new java.sql.Timestamp((day0us + day * 86400000000L) / 1000L + id),
        user, "view", 1.0, "{}")
    // days 0..9, day i has users 1..(3i+3) → ≤ 30 distinct < K=64:
    // every window takes the exact branch, so est == exact per day
    val small = (0 until 10).flatMap(day =>
      (1L to (3L * day + 3)).map(u => ev(day * 100L + u, day, u)))
    val d1 = java.nio.file.Files.createTempDirectory("q183a").toString
    small.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d1/events.parquet")
    val rows = Sketches.q183RollingDistinctSketch(spark, d1).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_users") == r.getAs[Long]("exact_users"), r.toString)
      assert(r.getAs[Long]("err_permille") == 0L)
    }
    // exact rolling union: day i window covers days max(0,i-6)..i whose
    // user sets are nested → exact = 3i+3
    assert(rows.sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("exact_users")).toSeq ==
      (0 until 10).map(i => 3L * i + 3))
    // one 500-user day → estimate branch; KMV err ~1/√64 ≈ 125‰
    val d2 = java.nio.file.Files.createTempDirectory("q183b").toString
    (1L to 500L).map(u => ev(u, 0, u))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d2/events.parquet")
    val big = Sketches.q183RollingDistinctSketch(spark, d2).collect().head
    assert(big.getAs[Long]("exact_users") == 500L)
    assert(big.getAs[Long]("err_permille") <= 375L, big.toString)
  }
}
