package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Operator unit tests: keep-last dedup, as-of join vs naive reference
  * implementation, shingles, MinHash/SimHash planted-duplicate recall,
  * ANN-LSH vs brute force, multimodal stub plumbing.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("KeepLast.dedup keeps exactly the greatest-order row per key") {
    val df = Seq(
      ("k1", 1L, "a"), ("k1", 3L, "b"), ("k1", 2L, "c"),
      ("k2", 5L, "d")).toDF("k", "ord", "v")
    val out = KeepLast.dedup(df, Seq($"k"), Seq($"ord"))
      .orderBy($"k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "b"), ("k2", "d")))
  }

  test("AsOfJoin matches a naive per-row scan on random-ish data") {
    val left = (1 to 50).map(i => (i.toLong, (i * 7 % 13).toLong, i * 100L))
      .toDF("l_id", "k", "t")
    val right = (1 to 80).map(j => (j.toLong, (j * 5 % 13).toLong, j * 61L, j * 1.5))
      .toDF("r_id", "rk", "rt", "payload")
    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt",
        payload = Seq("r_id", "payload"), tieBreak = "r_id")
      .select($"l_id", $"asof_r_id").as[(Long, Option[Long])]
      .collect().toMap

    val rightRows = right.as[(Long, Long, Long, Double)].collect()
    val leftRows = left.as[(Long, Long, Long)].collect()
    for ((lId, k, t) <- leftRows) {
      val want = rightRows.filter(r => r._2 == k && r._3 <= t)
        .sortBy(r => (r._3, r._1)).lastOption.map(_._1)
      assert(got(lId) == want, s"l_id=$lId k=$k t=$t")
    }
  }

  test("bucketed AsOfJoin equals the naive formulation (incl. empty-bucket gaps)") {
    // right rows cluster early (j*61 ≤ 4880) while lefts run to 15000:
    // with width 700 many left buckets contain no right rows at all, so
    // parity here exercises the carry-in across bucket gaps, the
    // no-match-at-all lefts, and same-instant ties (side ordering)
    val left = (1 to 150).map(i => (i.toLong, (i * 7 % 13).toLong, i * 100L))
      .toDF("l_id", "k", "t")
    val right = (1 to 80).map(j => (j.toLong, (j * 5 % 13).toLong, j * 61L, j * 1.5))
      .toDF("r_id", "rk", "rt", "payload")
    val naive = AsOfJoin.join(left, right, "k", "rk", "t", "rt",
        payload = Seq("r_id", "payload"), tieBreak = "r_id")
      .select($"l_id", $"asof_r_id").as[(Long, Option[Long])]
      .collect().toMap
    val bucketed = AsOfJoin.joinBucketed(left, right, "k", "rk", "t", "rt",
        payload = Seq("r_id", "payload"), tieBreak = "r_id", widthSeconds = 700L)
      .select($"l_id", $"asof_r_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(bucketed == naive)

    // single-scan self variant: same rows carved from one table by a
    // side predicate must reproduce the two-table result exactly
    val src = left.withColumn("side", lit("L"))
      .select($"l_id", $"k", $"t", $"side",
        lit(null).cast("long").as("r_id"), lit(null).cast("double").as("payload"))
      .unionByName(right.select(
        lit(null).cast("long").as("l_id"), $"rk".as("k"), $"rt".as("t"),
        lit("R").as("side"), $"r_id", $"payload"))
    val self = AsOfJoin.joinBucketedSelf(src, isLeft = $"side" === "L",
        key = "k", time = "t", leftCols = Seq("l_id", "k", "t"),
        payload = Seq("r_id", "payload"), tieBreak = "r_id", widthSeconds = 700L)
      .select($"l_id", $"asof_r_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(self == naive)
  }

  test("shingles produce w-grams; short docs yield empty") {
    val df = Seq("a b c d", "a b", "").toDF("text")
    val out = df.select(TextOps.shingles(TextOps.tokens($"text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    assert(out(2).isEmpty)
  }

  test("MinHash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = base.replace("token40", "changed") // ~95% shingle overlap
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val cand = MinHashLsh.candidates(MinHashLsh.signatures(docs), "doc_id")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), "planted near-dup must be a candidate")
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)),
      "unrelated doc must not pair")
  }

  test("SimHash: identical docs at hamming 0; near-dup within 3; unrelated far") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, (1 to 60).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val sigs = SimHash.signatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
  }

  test("AnnLsh buckets identical vectors together; cosine of self-dup = 1") {
    val v1 = Array.tabulate(16)(i => 0.1f * i - 0.5f)
    val v2 = v1.clone()
    val v3 = Array.tabulate(16)(i => -0.1f * i + 0.7f)
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val out = AnnLsh.ann(df, k = 3).select($"qid", $"cid", $"cos")
      .as[(Long, Long, Double)].collect()
    val pair = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(pair.isDefined, "identical vectors must share a bucket")
    assert(math.abs(pair.get._3 - 1.0) < 1e-12)
  }

  test("k-means codebook: k full centroids, deterministic, assignments improve on init") {
    val out = VectorOps.q55Kmeans(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 8 * 64, "8 centroids x 64 dims")
    assert(out.map(_._1).distinct.sorted.toSeq == (0L to 7L))
    // bit-identical across runs: the whole trajectory is xsum-based
    val again = VectorOps.q55Kmeans(spark, sf).as[(Long, Long, Double)].collect()
    assert(out.toSeq == again.toSeq)
    // trained centroids are means, not copies of the seed vectors
    val seeds = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 8)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .as[(Long, Int, Float)].collect()
      .map(r => (r._1, r._2.toLong) -> r._3.toDouble).toMap
    val moved = out.count { case (c, p, v) => math.abs(v - seeds((c, p))) > 1e-9 }
    assert(moved > out.length / 2, "Lloyd steps must move the centroids")
  }

  test("real WAV-header decode: RIFF walk parses, garbage/non-PCM -> null") {
    import org.apache.spark.sql.Row
    // 44.1 kHz stereo, 44100 samples → exactly 1000 ms
    val wav = Multimodal.syntheticWav(44100, 2, 44100L)
    assert(Multimodal.decodeWavHeader(wav) == Row(44100, 2, 16, 44100L, 1000L))
    // mono 8 kHz, 4000 samples → 500 ms
    assert(Multimodal.decodeWavHeader(Multimodal.syntheticWav(8000, 1, 4000L)) ==
      Row(8000, 1, 16, 4000L, 500L))
    // a chunk BEFORE fmt (e.g. LIST) must be skipped by the walk
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val shifted = wav.take(12) ++ list ++ wav.drop(12)
    val riffFixed = shifted.clone() // header tag positions unchanged at 0/8
    assert(Multimodal.decodeWavHeader(riffFixed) == Row(44100, 2, 16, 44100L, 1000L))
    // non-PCM (format code 3 = IEEE float) refuses
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Multimodal.decodeWavHeader(nonPcm) == null)
    // garbage, truncated, null
    assert(Multimodal.decodeWavHeader("RIFFxxxxJUNK".getBytes) == null)
    assert(Multimodal.decodeWavHeader(wav.take(20)) == null)
    assert(Multimodal.decodeWavHeader(null) == null)
    // corrupt chunk size near 2^31 must yield null, not wrap pos
    // negative and throw
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0,0,0,0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0x7f) ++ new Array[Byte](24)
    assert(Multimodal.decodeWavHeader(evil) == null)
    // fmt chunk DECLARING fewer than its 16 format bytes must refuse:
    // reading the fields would cross the chunk boundary into the next
    // chunk's bytes — a bogus-but-accepted decode, not a crash
    val shortFmt = wav.clone(); shortFmt(16) = 8; shortFmt(17) = 0
    assert(Multimodal.decodeWavHeader(shortFmt) == null)
  }

  test("q127 power iteration matches a from-scratch dense Long-arithmetic replay") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().map(_._2)
    val S = 65536L
    val g = Array.ofDim[Long](64, 64)
    for (v <- emb; i <- 0 until 64; j <- 0 until 64)
      g(i)(j) += math.floor(v(i).toDouble * v(j).toDouble * 1e6).toLong
    var x = Array.fill(64)(S)
    for (_ <- 1 to 3) {
      val y = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * x(j)).sum)
      val m = y.map(math.abs).max
      val q = math.max(m / S, 1L)
      x = y.map(yi => math.signum(yi) * (math.abs(yi) / q))
    }
    val y4 = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * x(j)).sum)
    val imax = (0 until 64).minBy(i => (-math.abs(x(i)), i))
    val lam = math.abs(y4(imax)) / math.max(math.abs(x(imax)), 1L)
    val out = graft.operators.VectorOps.q127PcaPower(spark, sf)
      .orderBy($"i").collect()
    assert(out.length == 64)
    for (r <- out) {
      val i = r.getAs[Long]("i").toInt
      assert(r.getAs[Long]("x") == x(i), s"component $i: ${r.getAs[Long]("x")} vs ${x(i)}")
      assert(r.getAs[Long]("lambda_fix") == lam)
    }
    assert(lam > 0L)
  }

  test("real AVI-header decode: RIFF/hdrl/avih walk parses, garbage -> null") {
    import org.apache.spark.sql.Row
    // 30 fps (33333 µs/frame), 300 frames, 640x360 → 9999 ms
    val avi = Multimodal.syntheticAvi(33333, 300, 640, 360)
    assert(Multimodal.decodeAviHeader(avi) ==
      Row(640, 360, 300L, 33333L, 30000L, 9999L))
    // 60 fps, single frame
    assert(Multimodal.decodeAviHeader(Multimodal.syntheticAvi(16667, 1, 1920, 1080)) ==
      Row(1920, 1080, 1L, 16667L, 59998L, 16L))
    // a top-level chunk BEFORE the hdrl LIST must be skipped
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val shifted = avi.take(12) ++ junk ++ avi.drop(12)
    assert(Multimodal.decodeAviHeader(shifted) ==
      Row(640, 360, 300L, 33333L, 30000L, 9999L))
    // garbage, WAV-not-AVI, truncated, null
    assert(Multimodal.decodeAviHeader("RIFFxxxxJUNKJUNKJUNKJUNK".getBytes) == null)
    assert(Multimodal.decodeAviHeader(Multimodal.syntheticWav(8000, 1, 100L)) == null)
    assert(Multimodal.decodeAviHeader(avi.take(30)) == null)
    assert(Multimodal.decodeAviHeader(null) == null)
    // avih DECLARING fewer than its 40 header bytes must refuse (the
    // fmt-chunk lesson: fields would read past the chunk boundary)
    val shortAvih = avi.clone(); shortAvih(28) = 8; shortAvih(29) = 0
    assert(Multimodal.decodeAviHeader(shortAvih) == null)
    // zero µs-per-frame (division guard) and zero frames refuse
    val zeroUspf = avi.clone()
    zeroUspf(32) = 0; zeroUspf(33) = 0; zeroUspf(34) = 0; zeroUspf(35) = 0
    assert(Multimodal.decodeAviHeader(zeroUspf) == null)
  }

  test("header decoders never throw on arbitrary bytes (fuzz)") {
    // blob columns at 100 TB WILL contain corrupt payloads; the decode
    // contract is null, never an executor-killing exception
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val b = new Array[Byte](rng.nextInt(200)); rng.nextBytes(b)
      Multimodal.decodeWavHeader(b)
      Multimodal.decodeImageHeader(b)
      Multimodal.decodeAviHeader(b)
      if (b.length >= 12) { // magic-prefixed random tails hit the deep paths
        System.arraycopy("RIFF0000WAVE".getBytes("US-ASCII"), 0, b, 0, 12)
        Multimodal.decodeWavHeader(b)
        System.arraycopy("RIFF0000AVI ".getBytes("US-ASCII"), 0, b, 0, 12)
        Multimodal.decodeAviHeader(b)
        val png = Multimodal.syntheticPng(1, 1)
        System.arraycopy(png, 0, b, 0, math.min(12, png.length))
        Multimodal.decodeImageHeader(b)
      }
    }
  }

  test("real image-header decode: PNG/JPEG/GIF parse, garbage -> null") {
    // planted headers, incl. one real-world-layout JPEG with leading APPn
    val png = Multimodal.syntheticPng(640, 480)
    val jpg = Multimodal.syntheticJpeg(1920, 1080)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x2c, 0x01, 0x18, 0x00, 0, 0, 0, 0) // 300 x 24 LE
    assert(Multimodal.decodeImageHeader(png) ==
      org.apache.spark.sql.Row(640, 480, 3, "png"))
    assert(Multimodal.decodeImageHeader(jpg) ==
      org.apache.spark.sql.Row(1920, 1080, 3, "jpeg"))
    assert(Multimodal.decodeImageHeader(gif) ==
      org.apache.spark.sql.Row(300, 24, 3, "gif"))
    // greyscale+alpha PNG: color type 4 -> 2 channels
    val grey = png.clone(); grey(25) = 4
    assert(Multimodal.decodeImageHeader(grey).getInt(2) == 2)
    // non-image bytes and truncated payloads must yield null, not throw
    assert(Multimodal.decodeImageHeader("hello world text".getBytes) == null)
    assert(Multimodal.decodeImageHeader(png.take(20)) == null)
    assert(Multimodal.decodeImageHeader(jpg.take(6)) == null)
    assert(Multimodal.decodeImageHeader(null) == null)

    // Spark-side plumbing: decode runs per-partition, schema intact
    val df = Seq((1L, png), (2L, jpg), (3L, "not an image".getBytes))
      .toDF("doc_id", "blob")
    val out = Multimodal.withImageMeta(df, "blob")
    assert(out.schema("image_meta").dataType == Multimodal.ImageMetaSchema)
    val rows = out.select($"doc_id", $"image_meta.width", $"image_meta.format")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getInt(1) == 640 && rows(0).getString(2) == "png")
    assert(rows(1).getInt(1) == 1920 && rows(1).getString(2) == "jpeg")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("resample OHLC agrees with a direct window computation") {
    val q = EventOps.q22ResampleOhlc(spark, sf)
    val events = graft.sources.Tables.events(spark, sf)
    // cross-check one group: global high/low/count for one (day, type)
    val g = q.filter($"day" === "2024-01-01" && $"event_type" === "click").collect()
    assert(g.length == 1)
    val ref = events.filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-01" &&
        $"event_type" === "click")
      .agg(max($"value"), min($"value"), count(lit(1))).collect()(0)
    assert(g(0).getAs[Double]("high") == ref.getDouble(0))
    assert(g(0).getAs[Double]("low") == ref.getDouble(1))
    assert(g(0).getAs[Long]("n") == ref.getLong(2))
  }

  test("q166 resize plan: small image passes through, extreme aspect clamps to 1, exact integer fit") {
    val dir = java.nio.file.Files.createTempDirectory("rsz").toString
    // width = 1 + n_chars % 1024, height = 1 + (7·doc_id) % 1024:
    // doc 2/n_chars 99 → 100×15 (inside the canvas, pass-through);
    // doc 1024/n_chars 1023 → 1024×1 (extreme aspect: out_h would
    // floor to 0 — must clamp to 1); doc 3/n_chars 447 → 448×22 →
    // fit 224×(22·224 div 448 = 11)
    Seq((2L, 99L), (1024L, 1023L), (3L, 447L))
      .toDF("doc_id", "n_chars")
      .selectExpr("doc_id", "'t' AS text", "'en' AS lang", "'s' AS source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Multimodal.q166ImageResizePlan(spark, dir)
      .select($"doc_id", $"out_w", $"out_h", $"pad_x", $"pad_y", $"out_bytes")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (2L, 100L, 15L, 124L, 209L, 4500L),
      (3L, 224L, 11L, 0L, 213L, 7392L),
      (1024L, 224L, 1L, 0L, 223L, 672L)), s"got $got")
  }

  test("q164 session-overlap join: exact overlap, emit-once across shared hours, non-overlap absent") {
    // user 1: one 2-hour session (events every 20 min); user 2: one
    // session min 30–90 inside it — the overlap spans an hour-bucket
    // boundary (two shared buckets), so the first-shared-hour dedup
    // must emit the pair exactly once with overlap_us = 60 min;
    // user 3 is hours away and must be absent.
    val base = 1700000000000000L // µs, aligned off-hour is fine
    def ev(id: Long, user: Long, offMin: Long) =
      (id, new Timestamp((base + offMin * 60000000L) / 1000L), user, "click", 1.0, "{}")
    val events = ((0L to 120L by 20L).zipWithIndex.map { case (m, i) => ev(i.toLong, 1L, m) } ++
      Seq(ev(100L, 2L, 30L), ev(101L, 2L, 55L), ev(102L, 2L, 80L), ev(103L, 2L, 90L)) ++
      Seq(ev(200L, 3L, 3000L), ev(201L, 3L, 3010L)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ovlp").toString
    events.write.parquet(s"$dir/events.parquet")
    val out = Relational2.q164SessionOverlapJoin(spark, dir).collect()
    assert(out.length == 1, s"expected exactly one pair, got ${out.mkString("; ")}")
    val r = out.head
    assert(r.getAs[Long]("user_a") == 1L && r.getAs[Long]("user_b") == 2L)
    assert(r.getAs[Long]("overlap_us") == 60L * 60000000L, r.toString)
  }

  test("q173 retention cohorts: hand-computed matrix, permille exact, repeat days collapse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q173").toString
    val day0 = 1704067200000L // day-aligned
    def e(id: Long, u: Long, day: Int, extraMs: Long = 0L) =
      (id, new java.sql.Timestamp(day0 + day * 86400000L + extraMs), u, "view", 1.0, "{}")
    // u1 cohort d0, active d0 (twice — must collapse), d1, d3;
    // u2 cohort d0, active d0 only; u3 cohort d2, active d2+d3
    Seq(e(1, 1, 0), e(2, 1, 0, 5000L), e(3, 1, 1), e(4, 1, 3),
      e(5, 2, 0), e(6, 3, 2), e(7, 3, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.EventOps.q173RetentionCohorts(spark, dir)
      .select($"cohort_day", $"day_offset", $"n_active", $"cohort_size", $"rate_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val d0 = day0 / 86400000L
    assert(got == Seq(
      (d0, 0L, 2L, 2L, 1000L), (d0, 1L, 1L, 2L, 500L), (d0, 3L, 1L, 2L, 500L),
      (d0 + 2, 0L, 1L, 1L, 1000L), (d0 + 2, 1L, 1L, 1L, 1000L)), got.mkString("; "))
  }

  test("q176 Markov transitions: hand-computed matrix, per-user chains, permille exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q176").toString
    val t0 = 1704067200000L
    def e(id: Long, u: Long, tpe: String) =
      (id, new java.sql.Timestamp(t0 + id * 1000L), u, tpe, 1.0, "{}")
    // user 1: A B A B  → A→B, B→A, A→B ; user 2: A A → A→A
    // matrix: A→A 1/3, A→B 2/3, B→A 1/1 (chains never cross users)
    Seq(e(1, 1, "A"), e(2, 1, "B"), e(3, 1, "A"), e(4, 1, "B"),
      e(5, 2, "A"), e(6, 2, "A"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.q176MarkovTransitions(spark, dir)
      .select($"from_type", $"to_type", $"n_transitions", $"from_total", $"p_permille")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "A", 1L, 3L, 333L), ("A", "B", 2L, 3L, 666L),
      ("B", "A", 1L, 1L, 1000L)), got.mkString("; "))
  }

  test("q174 incremental rollup: maintained deltas equal a one-shot recompute (redelivery inside)") {
    import spark.implicits._
    val got = DimOps.q174IncrementalRollup(spark, sf)
      .as[(String, java.sql.Timestamp, Long, Double)].collect().toSeq
    val want = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderpriority".isNotNull && $"o_orderdate".isNotNull &&
        $"o_totalprice".isNotNull)
      .groupBy($"o_orderpriority".as("priority"),
        date_trunc("MONTH", $"o_orderdate").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Exact.dsum($"o_totalprice").as("revenue"))
      .orderBy($"priority", $"mon")
      .as[(String, java.sql.Timestamp, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want,
      s"maintained != recomputed (${got.length} vs ${want.length} rows)")
  }

  test("q197 revenue concentration: whale lands alone in the 1% band with the right share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q197").toString
    val t = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    // 100 customers: one whale (1000.0), 99 minnows (10.0 each)
    val rows = (1L to 100L).map(c =>
      (c, c, "O", if (c == 1L) 1000.0 else 10.0, t, "1-URGENT"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = StatsOps.q197RevenueConcentration(spark, dir)
      .as[(String, Long, Double, Long)].collect().toSeq
    // total 1990: whale 1000 → 502‰; next 9 minnows 90 → 45‰; rest 900 → 452‰
    assert(got == Seq(("a_top1pct", 1L, 1000.0, 502L),
      ("b_top10pct", 9L, 90.0, 45L),
      ("c_rest", 90L, 900.0, 452L)), got.mkString("; "))
  }

  test("q196 last-touch attribution: latest in-window click credited, stale and clickless organic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q196").toString
    val h = 3600000000L // 1h in µs
    def e(id: Long, u: Long, tpe: String, tUs: Long, v: Double) =
      (id, new java.sql.Timestamp(tUs / 1000L), u, tpe, v, "{}")
    val t0 = 1700006400L * 1000000L // hod 0
    val rows = Seq(
      e(1, 1, "click", t0 + 2 * h, 0), // hod 2
      e(2, 1, "click", t0 + 3 * h, 0), // hod 3 — the LATEST before purchase
      e(3, 1, "purchase", t0 + 4 * h, 10.0), // → credited to hod 3
      e(4, 2, "click", t0 + 1 * h, 0),
      e(5, 2, "purchase", t0 + 9 * h, 7.0), // 8h after click → organic
      e(6, 3, "purchase", t0 + 5 * h, 5.0)) // no click at all → organic
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.q196LastTouchAttribution(spark, dir)
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("3", 1L, 10.0), ("organic", 2L, 12.0)), got.mkString("; "))
  }

  test("q193 weighted median: heavy weights pull the median past the unweighted one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q193").toString
    // prices 1,2,3 with unit weights 1,1,10: unweighted median 2,
    // weighted median 3 (cumw 1,2,12 vs half-total 6)
    Seq((1L, 1, 1.0, 1.0, "A"), (2L, 1, 2.0, 1.0, "A"), (3L, 1, 3.0, 10.0, "A"))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
        "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = StatsOps.q193WeightedMedian(spark, dir)
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("A", 3.0, 12L)), got.mkString("; "))
  }

  test("q194 table stats: one-scan profile matches direct aggregates") {
    import spark.implicits._
    val prof = DimOps.q194TableStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 5)
    val o = graft.sources.Tables.orders(spark, sf)
    assert(prof("o_orderstatus").getAs[Long]("ndv") == 3L)
    assert(prof("o_orderstatus").getAs[String]("min_val") == "F")
    assert(prof("o_orderkey").getAs[Long]("ndv") == o.count())
    assert(prof.values.forall(_.getAs[Long]("n_nulls") == 0L))
    assert(prof("o_custkey").getAs[String]("max_val").toLong ==
      o.agg(max($"o_custkey")).head.getLong(0))
  }

  test("q192 repair diff: flags exactly the corrupted keys' buckets, catches equal-count content change") {
    import spark.implicits._
    val flagged = DimOps.q192RepairDiff(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter($"l_orderkey".isNotNull)
    val lo = li.agg(min($"l_orderkey")).head.getLong(0)
    val hi = li.agg(max($"l_orderkey")).head.getLong(0)
    val second = li.filter($"l_orderkey" > lo).agg(min($"l_orderkey")).head.getLong(0)
    val expectBuckets = Set(lo % 64, second % 64, hi % 64)
    assert(flagged.nonEmpty)
    assert(flagged.map(_.getAs[Long]("bucket")).toSet == expectBuckets,
      s"must localize to the corrupted keys' buckets: ${flagged.mkString("; ")}")
    // the altered-rows bucket diverges with EQUAL counts — the case a
    // count-only comparison is blind to
    val hiRows = flagged.filter(_.getAs[Long]("bucket") == hi % 64)
    assert(hiRows.nonEmpty && hiRows.forall(r =>
      r.getAs[Long]("n_a") == r.getAs[Long]("n_b")), hiRows.mkString("; "))
  }

  test("q191 k-center coreset: seed = min id, radius non-increasing, selections distinct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q191").toString
    // 12 deterministic 2-d points, far corners present
    val pts = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0.5f, 0.5f)), (3L, Array(10f, 0f)),
      (4L, Array(10f, 10f)), (5L, Array(0f, 10f)), (6L, Array(5f, 5f)),
      (7L, Array(2f, 8f)), (8L, Array(8f, 2f)), (9L, Array(1f, 1f)),
      (10L, Array(9f, 9f)), (11L, Array(4f, 1f)), (12L, Array(6f, 9f)))
    pts.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.q191KCenterCoreset(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 8)
    assert(got.head == ((0L, 1L, 0.0)), s"seed must be the min id: ${got.head}")
    assert(got.map(_._2).distinct.length == 8, "selections must be distinct")
    // the k-center invariant: each round's max-min distance (coverage
    // radius) never grows
    val radii = got.tail.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b }, radii.mkString(","))
    // round 1 is the true farthest point from the seed (corner 10,10)
    assert(got(1)._2 == 4L && got(1)._3 == 200.0, got(1).toString)
  }

  test("q190 embedding drift: aligned label scores ~1000 permille, orthogonal-axis labels ~500") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q190").toString
    // label 0 on the x axis, label 1 on y, label 2 on the diagonal;
    // global mean = (2/3, 2/3): cos2(l0)=cos2(l1)=1/2, cos2(l2)=1
    val rows = Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(1.0f, 1.0f), 2), (6L, Array(1.0f, 1.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.q190EmbeddingDrift(spark, dir)
      .select($"label", $"cos2_permille")
      .as[(Int, Long)].collect().toMap
    // floor quantization can shave one permille off the exact rationals
    assert(got(0) >= 499 && got(0) <= 500, got.toString)
    assert(got(1) >= 499 && got(1) <= 500, got.toString)
    assert(got(2) >= 999 && got(2) <= 1000, got.toString)
  }

  test("q189 temporal dim join: items attribute to the version in force at ship time, boundary to the newer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q189").toString
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 00:00:00")
    // cust 1: priority A from 1995-01-01, B from 1996-01-01 (order 2)
    Seq((1L, 1L, "O", 10.0, ts("1995-01-01"), "A"),
      (2L, 1L, "O", 10.0, ts("1996-01-01"), "B"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // items on order 1: ship inside window A, AT the boundary (→ B,
    // valid_from ≤ t < valid_to), and after (→ B)
    Seq((1L, 1, ts("1995-06-01"), 100.0),
      (1L, 2, ts("1996-01-01"), 10.0),
      (1L, 3, ts("1997-03-01"), 1.0))
      .toDF("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = DimOps.q189TemporalDimJoin(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", 1L, 100.0), ("B", 2L, 11.0)), got.mkString("; "))
  }

  test("q187 session paths: gap split, in-session order, 8-step truncation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q187").toString
    val t0 = 1700000000000L
    def e(id: Long, u: Long, offsetSec: Long, tpe: String) =
      (id, new java.sql.Timestamp(t0 + offsetSec * 1000L), u, tpe, 1.0, "{}")
    // user 1: A,B then a 35-min gap, then C → sessions "A>B" and "C";
    // a 30-min gap EXACTLY does not split (strict > rule)
    // user 2: ten events in one session → truncated to first 8
    val rows = Seq(e(1, 1, 0, "A"), e(2, 1, 60, "B"), e(3, 1, 60 + 35 * 60, "C"),
      e(4, 1, 60 + 35 * 60 + 1800, "D")) ++ // exactly 30 min later: same session
      (0 until 10).map(i => e(10 + i, 2, i.toLong, s"T$i"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.q187SessionPaths(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A>B" -> 1L, "C>D" -> 1L,
      "T0>T1>T2>T3>T4>T5>T6>T7" -> 1L), got.toString)
  }

  test("q184 join-view maintenance: assembled deltas equal the one-shot join (redelivery inside)") {
    import spark.implicits._
    val got = DimOps.q184JoinViewMaintenance(spark, sf)
      .as[(Long, Long, String, Double)].collect().toSeq
    val want = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderkey".isNotNull && $"o_custkey".isNotNull &&
        $"o_totalprice".isNotNull && $"o_orderdate".isNotNull)
      .join(graft.sources.Tables.customer(spark, sf)
        .filter($"c_custkey".isNotNull && $"c_mktsegment".isNotNull),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment", $"o_totalprice")
      .orderBy($"o_orderkey")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(got.nonEmpty && got == want,
      s"view != one-shot join (${got.length} vs ${want.length})")
  }

  test("q185 rank normalize: uniform values balance deciles exactly, ties share a permille") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q185").toString
    // type 'u': values 0..99 (distinct) → each decile EXACTLY 10 rows,
    // edges 0 and 1000; type 't': 5 copies of one value + 5 larger —
    // ties rank together (all five at pm 0)
    val rows = (0 until 100).map(i => (i.toLong, "u", i.toDouble)) ++
      (0 until 5).map(i => (200L + i, "t", 1.0)) ++
      (0 until 5).map(i => (300L + i, "t", 2.0 + i))
    rows.map { case (id, tpe, v) =>
      (id, new java.sql.Timestamp(1700000000000L + id), 1L, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = StatsOps.q185RankNormalize(spark, dir).collect()
    // pm = (rank−1)·1000 div 99 spans [0, 1000] INCLUSIVE (percent_rank
    // convention): deciles 0–8 hold exactly 10 rows, decile 9 holds 9,
    // and the series maximum alone lands in bucket 10 (pm = 1000)
    val u = got.filter(_.getString(0) == "u")
    assert(u.length == 11, u.mkString("; "))
    assert(u.map(_.getAs[Long]("n_rows")).sum == 100L)
    assert(u.filter(_.getAs[Long]("decile") <= 8).forall(_.getAs[Long]("n_rows") == 10L))
    assert(u.find(_.getAs[Long]("decile") == 10L).get.getAs[Long]("min_pm") == 1000L)
    assert(u.map(_.getAs[Long]("min_pm")).min == 0L)
    val t = got.filter(_.getString(0) == "t")
    // 5 ties at rank 1 → pm 0 → decile 0 holds exactly the 5 tied rows
    assert(t.find(_.getAs[Long]("decile") == 0L).get.getAs[Long]("n_rows") == 5L)
    assert(t.find(_.getAs[Long]("decile") == 0L).get.getAs[Long]("max_pm") == 0L)
  }

  test("q182 CDC tombstones: delete retires across batches, later upsert resurrects") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q182").toString
    def o(key: Long, cust: Long, status: String, year: Int) =
      (key, cust, status, 1.0,
        java.sql.Timestamp.valueOf(s"$year-06-01 00:00:00"), "1-URGENT")
    // cust 1: upsert 1995, DELETE 1997          → absent
    // cust 2: DELETE 1995, upsert 1999          → present (resurrected)
    // cust 3: upsert 1995 only                  → present
    // cust 4: upsert 2001, DELETE 2001 later key → absent (same-batch order)
    Seq(o(1, 1, "O", 1995), o(2, 1, "F", 1997),
      o(3, 2, "F", 1995), o(4, 2, "O", 1999),
      o(5, 3, "O", 1995),
      o(6, 4, "O", 2001), o(7, 4, "F", 2001))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = DimOps.q182CdcTombstones(spark, dir)
      .select($"custkey", $"last_order").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 4L), (3L, 5L)), got.mkString("; "))
  }

  test("q179 skew audit: hand-computed hot key, skew permille, salt factor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q179").toString
    // l_suppkey: 40 rows of key 7, 60 unique keys → 61 keys, max 40
    val rows = (1 to 40).map(i => (i.toLong, i.toLong, 7L)) ++
      (41 to 100).map(i => (i.toLong, i.toLong, 100L + i))
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = DimOps.q179SkewAudit(spark, dir)
      .filter($"key_col" === "l_suppkey").collect().head
    assert(got.getAs[Long]("n_rows") == 100L)
    assert(got.getAs[Long]("n_keys") == 61L)
    assert(got.getAs[Long]("max_rows") == 40L)
    assert(got.getAs[Long]("hot_key") == 7L)
    assert(got.getAs[Long]("skew_permille") == 40L * 61 * 1000 / 100)
    assert(got.getAs[Long]("salt_factor") == (40L * 32 + 99) / 100) // = 13
    // uniform column: salt 1, skew ≈ 1000
    val uni = DimOps.q179SkewAudit(spark, dir)
      .filter($"key_col" === "l_orderkey").collect().head
    assert(uni.getAs[Long]("salt_factor") == 1L)
    assert(uni.getAs[Long]("skew_permille") == 1000L)
  }

  test("q178 digest: order/partitioning-invariant, value-sensitive, kernel == HOF fold") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    // kernel parity with the portable HOF fold (and its DuckDB twin)
    val strs = Seq("", "a", "A|1|x", "order|123|456|R|O|170000000").toDF("s")
    val mismatch = strs.filter($"s" =!= "") // HOF init differs from list_reduce on ''
      .select(call_function("poly_hash", $"s").as("k"),
        PortableMinHash.polyHash($"s").as("h"))
      .filter($"k" =!= $"h").count()
    assert(mismatch == 0L)
    assert(graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(call_function("poly_hash",
          concat_ws("|", $"k", $"v")).as("h"))
        .agg((sum($"h".cast("decimal(38,0)")) %
          lit(graft.functions.PolyHash.M)).cast("long"), expr("bit_xor(h)"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val rows = (1 to 500).map(i => (i.toLong, s"v$i"))
    val a = digest(rows.toDF("k", "v"))
    val b = digest(util.Random.shuffle(rows).toDF("k", "v").repartition(7))
    assert(a == b, "digest must be order- and partitioning-invariant")
    val c = digest(rows.updated(250, (251L, "vX")).toDF("k", "v"))
    assert(a != c, "a single changed row must move the digest")
  }

  test("q198 schema evolution replay: batch-1 rows read back NULL in the evolved column") {
    val got = DimOps.q198SchemaEvolutionReplay(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    val want = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderstatus".isNotNull && $"o_orderkey".isNotNull &&
        $"o_totalprice".isNotNull && $"o_orderdate".isNotNull &&
        $"o_orderpriority".isNotNull)
      .select($"o_orderstatus".as("status"), $"o_totalprice",
        $"o_orderpriority".as("prio"), year($"o_orderdate").as("yr"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_orders"),
        count(when($"yr" >= 1997, 1)).as("n_evolved"),
        countDistinct(when($"yr" >= 1997, $"prio")).as("n_prios"),
        graft.functions.Exact.dsum($"o_totalprice").as("revenue"))
      .orderBy($"status")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want,
      s"evolved lake read-back diverges: $got vs $want")
    // non-vacuous: both shapes must be present in the replay
    assert(want.exists(r => r._3 > 0 && r._3 < r._2),
      "fixture must deliver both pre- and post-evolution rows per status")
  }

  test("q199 erase-merge interleave: erased history gone, post-erasure events remain") {
    val dir = java.nio.file.Files.createTempDirectory("q199").toString
    val t0 = 1704067200000L
    def e(id: Long, u: Long, tpe: String, dtMs: Long) =
      (id, new Timestamp(t0 + dtMs), u, tpe, 1.0, "{}")
    // waves by event_id parity (even = wave 1, odd = wave 2)
    // user 1: FIRST wave-1 event is error → full wave-1 history erased;
    //         its wave-2 click (id 1) arrives AFTER the erasure and stays
    // user 2: first wave-1 event is view → nothing erased
    Seq(e(0, 1, "error", 0), e(2, 1, "view", 2000),
      e(1, 1, "click", 1000),
      e(4, 2, "view", 0), e(6, 2, "error", 5000), e(3, 2, "click", 3000))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = DimOps.q199EraseMergeInterleave(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 2L, 2L), ("error", 1L, 1L), ("view", 1L, 1L)),
      got.mkString("; "))
  }

  test("q200 3-dim z-order audit: kernel matches its arithmetic expansion; layouts are coherent") {
    graft.plans.GraftExtensions.register(spark)
    // bit b of dim i lands at 3b+i: (1,2,4) → 1 | 2^4 | 2^8 = 273
    val z = spark.range(1)
      .selectExpr("z_interleave_n(1L, 2L, 4L) AS z",
        "z_interleave_n(cast(null as bigint), 1L, 1L) AS zn").head()
    assert(z.getLong(0) == 273L, s"z_interleave_n(1,2,4) = ${z.getLong(0)}")
    assert(z.isNullAt(1), "null dim must yield null")
    val rows = DimOps.q200ZorderNdimSkipping(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("time", "zorder2", "zorder3"))
    val totals = rows.values.map(_.getAs[Long]("total_rows")).toSet
    assert(totals.size == 1, s"layouts must cover identical rows: $totals")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("files_hit") <= r.getAs[Long]("n_files"))
      assert(r.getAs[Long]("rows_in_hit_files") <= r.getAs[Long]("total_rows"))
    }
    // the 3-dim curve must actually prune the 3-dim box (non-vacuous)
    val z3 = rows("zorder3")
    assert(z3.getAs[Long]("rows_in_hit_files") < z3.getAs[Long]("total_rows"),
      "zorder3 pruned nothing — audit is vacuous")
  }
}
