package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.operators.{MinHashLsh, SimHash, VectorOps}

/** Skew stress rehearsal (round-6 verdict item 6): the "100 TB posture"
  * claims — collect_capped / maxBucket / maxCell / bounded heaps bound
  * per-task work no matter how degenerate one key gets — exercised as
  * MEASURED behavior on a planted-skew corpus ~10× the sf0.1 document
  * volume: 45 000 IDENTICAL boilerplate docs (one degenerate MinHash
  * band bucket per band, one degenerate SimHash value in every 16-bit
  * chunk) + 5 000 unique docs carrying 25 planted near-dup pairs.
  *
  * What quadratic failure would look like: the boilerplate clique alone
  * yields C(45k, 2) ≈ 10⁹ candidate pairs — hours of work and an OOM on
  * the pairing task. The caps must (a) finish, (b) emit a candidate set
  * bounded by the cap arithmetic, (c) never give one task more than a
  * LINEAR share of the corpus (partial aggregation caps each map-side
  * buffer, so even the hot groups shuffle ≤ cap × n_maps rows), and
  * (d) still find every planted pair among the healthy tier — the cap
  * may only drop pathological buckets, not recall on disjoint normal
  * docs.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  /** Max records any single task read from a shuffle during `body`. */
  private def maxTaskShuffleRead(body: => Unit): Long = {
    val max = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null && e.taskMetrics.shuffleReadMetrics != null)
          max.accumulateAndGet(e.taskMetrics.shuffleReadMetrics.recordsRead, Math.max(_, _))
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(1500) /* drain the async listener bus */ }
    finally spark.sparkContext.removeSparkListener(listener)
    max.get()
  }

  private val hot = (1 to 15).map(i => s"boiler$i").mkString(" ")

  /** 45k identical + 5k unique docs; unique docs pair up (2i, 2i+1):
    * the first 25 pairs are IDENTICAL (J = 1), the rest differ in one
    * trailing token of 15 (shingle J ≈ 0.63) — 2500 planted near-dup
    * pairs total, all above the 16×2 banding's 0.25 midpoint.
    */
  private def skewDocs = {
    val n = 50000
    spark.range(n).select($"id".as("doc_id"),
      when($"id" < 45000, lit(hot))
        .otherwise(concat_ws(" ",
          (1 to 14).map(i => concat(lit(s"u${i}_"), floor($"id" / 2).cast("long").cast("string"))) :+
            when($"id" % 2 === 0, lit("even")).otherwise(
              when($"id" < 45050, lit("even")).otherwise(lit("odd"))): _*))
      .as("text"))
  }

  test("MinHash banding: degenerate 45k-doc band buckets are capped away; planted pairs survive", SlowTag) {
    val docs = skewDocs
    var candCount = 0L
    var planted = 0L
    val maxRead = maxTaskShuffleRead {
      val cand = MinHashLsh.candidates(MinHashLsh.signatures(docs), "doc_id")
        .localCheckpoint()
      candCount = cand.count()
      planted = cand.filter($"a" >= 45000L && $"b" === $"a" + 1 && ($"a" % 2) === 0)
        .count()
    }
    // uncapped, the boilerplate clique alone is ~1e9 pairs; capped, the
    // candidate set is bounded by healthy-tier pairing
    assert(candCount < 50000, s"candidate set should be cap-bounded, got $candCount")
    assert(planted == 2500L, s"all 2500 planted near-dup pairs must survive the cap, got $planted")
    // per-task shuffle input stays LINEAR in the corpus (partial
    // aggregation caps map-side buffers at maxBucket+1 per group; a
    // quadratic task would read tens of millions)
    assert(maxRead < 2000000L,
      s"one task read $maxRead shuffled records — per-task input is no longer corpus-linear")
  }

  test("SimHash chunk blocking: one degenerate 16-bit chunk value cannot go quadratic", SlowTag) {
    val docs = skewDocs
    var found = 0L
    var plantedExact = 0L
    val maxRead = maxTaskShuffleRead {
      val pairs = SimHash.foundPairs(spark, {
        // foundPairs reads documents(s, d); write the skew corpus as a
        // lake the source can read
        val dir = java.nio.file.Files.createTempDirectory("skew_sim").toString
        docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
        dir
      }).localCheckpoint()
      found = pairs.count()
      plantedExact = pairs.filter($"doc_a" >= 45000L).count()
    }
    // the 45k identical docs share ALL four chunks — every one of those
    // buckets is over maxBucket and must drop; near-dup pairs among the
    // unique tier (identical first 14 tokens → Hamming ≤ 3) survive
    assert(found < 50000, s"found pairs should be cap-bounded, got $found")
    assert(plantedExact >= 25L, s"planted near-identical pairs must be found, got $plantedExact")
    assert(maxRead < 2000000L,
      s"one task read $maxRead shuffled records — chunk cap failed to bound the pairing")
  }

  test("embedding near-dup: a hot cell over maxCell is excluded, not exploded", SlowTag) {
    // 20k vectors, ALL in one cell → |cell| ≫ maxCell → the exact-verify
    // tier sees zero candidates instead of C(20k,2) ≈ 2·10⁸ dot products
    val vecs = spark.range(20000).select($"id".as("vec_id"), lit(0).as("label"),
      array((0 until 8).map(i => ($"id" % (i + 7)).cast("float")): _*).as("embedding"))
    var pairs = -1L
    val maxRead = maxTaskShuffleRead {
      pairs = VectorOps.embeddingNearDup(vecs, threshold = 0.35, maxCell = 1000).count()
    }
    assert(pairs == 0L, s"the over-cap cell must be excluded entirely, got $pairs pairs")
    assert(maxRead < 100000L,
      s"one task read $maxRead shuffled records — the hot cell leaked past the cap")
  }

  test("knn graph: 20k identical embeddings collapse to ONE bucket; the cap bounds the quadratic stage", SlowTag) {
    // every vector projects identically → one SRP bucket holds the
    // whole corpus. Unbounded, the pair join is C(20k,2) ≈ 2·10⁸
    // scored pairs; the deterministic per-bucket cap must hold the
    // candidate stage to 64·63 directed pairs and the output to the 64
    // capped members, and no task may read a quadratic shuffle.
    val dir = java.nio.file.Files.createTempDirectory("knnskew").toString
    spark.range(20000).select($"id".as("vec_id"), lit(0).as("label"),
        array((0 until 64).map(i => lit(0.1f * (i % 7) - 0.2f)): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    var out: Array[org.apache.spark.sql.Row] = null
    val maxRead = maxTaskShuffleRead {
      out = graft.operators.PortableAnn.q121KnnGraph(spark, dir).collect()
    }
    val qids = out.map(_.getAs[Long]("qid")).distinct
    assert(qids.length == 64, s"exactly the 64 capped members may appear, got ${qids.length}")
    assert(qids.forall(_ < 64), "deterministic cap keeps the smallest vec_ids")
    assert(out.length == 64 * 3, s"top-3 per capped member, got ${out.length}")
    assert(out.forall(_.getAs[Double]("cos") > 0.999999), "identical vectors: cos ~ 1")
    assert(maxRead < 100000L,
      s"one task read $maxRead shuffled records — the bucket cap leaked")
  }

  test("prefix-filter all-pairs: a 45k-doc identical-text clique is cap-bounded; unique-tier dups survive", SlowTag) {
    // the boilerplate clique shares EVERY shingle hash, so its prefix
    // buckets all hold 45k docs — far over the 100 cap — and must drop
    // (uncapped: C(45k,2) ≈ 10⁹ verify pairs); every planted unique-tier
    // pair must still come through the capped buckets: the trailing
    // differing token touches only ONE of the 13 3-shingles, so even the
    // non-identical pairs sit at J = 12/14 ≈ 0.857 ≥ τ = 0.8
    val docs = skewDocs
    graft.plans.GraftExtensions.register(spark)
    val perDoc = docs
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
    var pairs: Array[(Long, Long)] = null
    val maxRead = maxTaskShuffleRead {
      pairs = graft.operators.TextOps.prefixJaccardPairs(perDoc, "doc_id", 0.8)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    }
    val planted = pairs.count { case (a, b) => a >= 45000 && b == a + 1 && a % 2 == 0 }
    assert(planted == 2500, s"all 2500 planted near-dup pairs must survive the cap, got $planted")
    assert(pairs.forall { case (a, b) => a >= 45000 && b >= 45000 },
      "no boilerplate-clique pair may leak past the bucket cap")
    assert(maxRead < 2000000L,
      s"one task read $maxRead shuffled records — prefix buckets went quadratic")
  }

  test("prefix-filter OverCapExact: over-cap buckets keep recall exact via the distributed tier") {
    // 200 identical docs + 30 planted near-dup pairs in the unique
    // tier. Every clique prefix bucket holds 200 members, over the 100
    // cap: under the default Drop policy the clique pairs silently
    // vanish (the 45k-clique test above); under OverCapExact — the
    // recall-exact callers' contract (q134, q37's ground truth, q150)
    // — ALL C(200,2) = 19 900 clique pairs must come through the
    // distributed over-cap tier, de-duplicated against the capped
    // tier, alongside every under-cap pair.
    graft.plans.GraftExtensions.register(spark)
    val clique = spark.range(200).select($"id".as("doc_id"),
      lit((1 to 20).map(i => s"cl_$i").mkString(" ")).as("text"))
    // pairs (1000+2k, 1001+2k): 40 shared tokens + 1 differing tail
    // token → 39 3-shingles each, the last 3 differ: J = 36/42 ≈
    // 0.857 ≥ 0.8, prefix buckets of size 2 (group-unique tokens)
    val uniq = spark.range(1000, 1060).select($"id".as("doc_id"),
      concat(
        concat_ws(" ", (1 to 40).map(i =>
          concat(lit(s"u${i}_"), floor(($"id" - lit(1000)) / 2).cast("long").cast("string"))): _*),
        lit(" tail_"), $"id".cast("string")).as("text"))
    val perDoc = clique.unionAll(uniq)
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
    val pairs = graft.operators.TextOps.prefixJaccardPairs(perDoc, "doc_id", 0.8,
        overCap = graft.operators.TextOps.OverCapExact)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val cliquePairs = pairs.count { case (a, b) => a < 200 && b < 200 }
    val uniqPairs = pairs.filter { case (a, b) => a >= 1000 && b >= 1000 }
    assert(cliquePairs == 200 * 199 / 2,
      s"exact tier must recover all 19900 over-cap clique pairs, got $cliquePairs")
    assert(uniqPairs.length == 30 &&
        uniqPairs.forall { case (a, b) => b == a + 1 && a % 2 == 0 },
      s"all 30 under-cap planted pairs must survive, got ${uniqPairs.length}")
    assert(pairs.length == 200 * 199 / 2 + 30,
      s"no duplicate or spurious pairs across tiers, got ${pairs.length}")
  }

  test("prefix-filter broadcast gate: an over-budget pair set takes the shuffle path, results identical", SlowTag) {
    // 8 cliques × 60 identical docs: every bucket is UNDER the cap (60
    // ≤ 100) so recall stays exact, but the pair set (8 × C(60,2) =
    // 14 160 decorated pairs) is over a 1-byte broadcast budget — the
    // gate must decline the hints and the verify joins run as real
    // shuffle joins (AQE's runtime broadcast conversion disabled here
    // so the shuffle path actually executes) with the IDENTICAL result
    // the broadcast path produces.
    graft.plans.GraftExtensions.register(spark)
    val docs = spark.range(480).select($"id".as("doc_id"),
      concat_ws(" ", (1 to 20).map(i =>
        concat(lit(s"w${i}_"), ($"id" % 8).cast("string"))): _*).as("text"))
    def perDoc = docs
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
    def run(budget: Long) =
      graft.operators.TextOps.prefixJaccardPairs(perDoc, "doc_id", 0.8,
        overCap = graft.operators.TextOps.OverCapExact, maxBroadcastBytes = budget)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect().sorted
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "-1")
    val shuffled =
      try run(budget = 1L)
      finally prev match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    val broadcasted = run(budget = 64L << 20)
    assert(shuffled.length == 8 * 60 * 59 / 2,
      s"expected all clique pairs, got ${shuffled.length}")
    assert(shuffled.forall { case (a, b, j) => j == 1.0 && a % 8 == b % 8 },
      "pairs must be clique-internal identical docs")
    assert(shuffled.sameElements(broadcasted),
      "shuffle and broadcast paths must produce the identical pair set")
  }

  test("bounded top-k heap: one group absorbing 500k rows keeps K entries", SlowTag) {
    graft.plans.GraftExtensions.register(spark)
    val topk = graft.functions.TopK(16)
    val r = spark.range(500000).select(lit("g").as("k"), $"id")
      .groupBy($"k").agg(topk($"id".cast("double"), $"id").as("heap"))
      .select(size($"heap").as("n")).as[Int].head()
    assert(r == 16, s"heap must stay at K=16 entries under a 500k-row group, got $r")
  }
}
