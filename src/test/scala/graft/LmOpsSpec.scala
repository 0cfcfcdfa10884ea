package graft

import graft.operators.LmOps

/** The LM-diagnostic tier: the hash-matching oracle agrees on VALUES at
  * sf0.01, so these pin the semantics a co-broken oracle could still get
  * wrong — the quantized surprisal against a from-scratch BigInt
  * recount, the head/tail backoff boundary, and the planted-duplicate
  * behaviour of the shingle-duplication diagnostic.
  */
class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")

  test("q104 surprisal matches a from-scratch BigInt recount (head + backoff)") {
    // 'a' dominates (head, low surprisal); with n > 4096 total tokens the
    // singleton 'zebra' falls below the 1/4096 head-mass bar → backoff 12
    val corpus = docs(
      1L -> ("a " * 5000).trim,
      2L -> "a zebra",
      3L -> "a a a a b b")
    val gotByDoc = LmOps.unigramSurprisal(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_surprisal"), r.getAs[Long]("mean_milli"))).toMap

    // from-scratch truth
    val toks = Map(
      1L -> Seq.fill(5000)("a"),
      2L -> Seq("a", "zebra"),
      3L -> Seq("a", "a", "a", "a", "b", "b"))
    val counts = toks.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = counts.values.sum
    def s(tok: String): Long = {
      val cnt = counts(tok)
      if (cnt * 4096L >= n) BigInt(n / cnt).bitLength - 1L else 12L
    }
    for ((id, ts) <- toks) {
      val sumS = ts.map(s).sum
      val exp = (ts.size.toLong, sumS, sumS * 1000 / ts.size)
      assert(gotByDoc(id) == exp, s"doc $id: got ${gotByDoc(id)}, want $exp")
    }
    // the singleton token really takes the backoff cap, not a head score
    assert(s("zebra") == 12L)
    assert(gotByDoc(2L)._2 == s("a") + 12L)
  }

  test("q104 flag_rare fires for rare-vocabulary docs and not for head-only docs") {
    // one dominant token + one doc written entirely in singletons; n > 4096
    // so the singletons take the full 12-bit backoff (mean 12000 milli-bits)
    val corpus = docs(
      1L -> ("common " * 5000).trim,
      2L -> "qq ww ee rr tt yy uu ii oo pp")
    val got = LmOps.unigramSurprisal(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("flag_rare")).toMap
    assert(!got(1L), "head-only doc must not be flagged")
    assert(got(2L), "all-singleton doc must be flagged (mean = 12000 milli-bits)")
  }

  test("q105 planted duplicate shingles are found; unique docs score zero") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over",
      2L -> "intro text the quick brown fox again",  // shares 'the quick brown' + 'quick brown fox'
      3L -> "completely different words here now")
    val got = LmOps.dupShingleFraction(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"))).toMap
    assert(got(1L)._2 == 2, s"doc 1 shares exactly 2 shingles, got ${got(1L)}")
    assert(got(2L)._2 == 2, s"doc 2 shares exactly 2 shingles, got ${got(2L)}")
    assert(got(3L)._2 == 0, s"doc 3 is unique, got ${got(3L)}")
    assert(got(1L)._1 == 4 && got(3L)._1 == 3)
  }

  test("q105 hot shingle: df is a combinable aggregate, not an unsplittable window") {
    // one boilerplate shingle planted in 90% of docs — the skew shape
    // that motivated replacing `count over (partition by shingle)`:
    // a window partition cannot split, a shuffle join under AQE can,
    // and the aggregate side collapses the hot key map-side.
    val corpus = docs((1L to 100L).map { i =>
      if (i <= 90) i -> s"aa bb cc u$i v$i" else i -> s"x$i y$i z$i w$i q$i"
    }: _*)
    val res = LmOps.dupShingleFraction(corpus)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l => l.contains("Window") && l.contains("shingle")),
      "shingle df must not run through a shingle-partitioned window")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"df aggregate must map-side combine the hot shingle:\n${plan.take(800)}")
    val got = res.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"))).toMap
    // hot docs: shingles "aa bb cc","bb cc u_i","cc u_i v_i" → exactly
    // the first is duplicated; unique docs share nothing
    assert((1L to 90L).forall(i => got(i) == (3L, 1L)),
      s"hot docs must count exactly the planted shingle, got ${got(1L)}")
    assert((91L to 100L).forall(i => got(i)._2 == 0L))
  }

  test("q105 short docs (<3 tokens) produce no row; within-doc repeats don't count") {
    val corpus = docs(
      1L -> "too short",
      2L -> "x y z x y z x y z") // repeats its own shingles only
    val got = LmOps.dupShingleFraction(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup")).toMap
    assert(!got.contains(1L), "2-token doc has no shingles")
    assert(got(2L) == 0, "self-repeated shingles are distinct-per-doc, df=1")
  }

  private def docsSrc(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")

  test("q106 pair counts keep multiplicity; ordering and ties are deterministic") {
    val corpus = docs(
      1L -> "a b a b a",
      2L -> "c d")
    val got = LmOps.bpePairStats(corpus)
      .as[(String, Long)].collect().toSeq
    // 'a b' and 'b a' both occur twice — tie breaks on the pair string
    assert(got == Seq("a b" -> 2L, "b a" -> 2L, "c d" -> 1L), s"got $got")
  }

  test("q106 pairs never cross document boundaries") {
    val corpus = docs(1L -> "x y", 2L -> "z w")
    val pairs = LmOps.bpePairStats(corpus).as[(String, Long)].collect().map(_._1).toSet
    assert(pairs == Set("x y", "z w"), s"cross-doc pair leaked: $pairs")
  }

  test("q107 divergence matches a from-scratch recount; specialized source scores higher") {
    // source B's vocabulary is exclusive (globally rare, locally common);
    // source A speaks the corpus-dominant token
    val corpus = docsSrc(
      (1L, ("a " * 40).trim, "A"),
      (2L, ("a " * 40).trim, "A"),
      (3L, "bzz bzz bzz bzz qux qux", "B"))
    val got = LmOps.sourceDivergence(corpus)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("div_bits"), r.getAs[Double]("div_milli"))).toMap

    // from-scratch truth with the same head/backoff scheme
    val toks = Map("A" -> (Seq.fill(80)("a")), "B" -> Seq("bzz", "bzz", "bzz", "bzz", "qux", "qux"))
    val corpusCnt = toks.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = corpusCnt.values.sum
    def bits(x: Long): Long = BigInt(x).bitLength - 1L
    def sCorp(t: String): Long =
      if (corpusCnt(t) * 4096L >= n) bits(n / corpusCnt(t)) else 12L
    for ((src, ts) <- toks) {
      val ns = ts.size.toLong
      val local = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      def sLoc(t: String): Long = if (local(t) * 4096L >= ns) bits(ns / local(t)) else 12L
      val divBits = local.map { case (t, c) => c * (sCorp(t) - sLoc(t)) }.sum
      val exp = (ns, divBits, divBits * 1000.0 / ns)
      assert(got(src) == exp, s"source $src: got ${got(src)}, want $exp")
    }
    assert(got("B")._3 > got("A")._3, "exclusive-vocab source must diverge more")
  }

  test("q111 postings keep the 20 smallest doc ids, complete lists below the cap") {
    // token 'common' in 25 docs (df 25 → postings truncate to ids 1..20);
    // token 'solo' only in doc 7 (df 1, complete)
    val corpus = docs((1L to 25L).map(i =>
      i -> (if (i == 7L) "common solo" else "common")): _*)
    val got = LmOps.invertedIndex(corpus)
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(
      ("common", 25L, (1L to 20L).mkString(",")),
      ("solo", 1L, "7")), s"got $got")
  }

  test("q112 entropy: one-token source scores 0, uniform two-token source 1 bit") {
    val corpus = docsSrc(
      (1L, "a a a a", "mono"),
      (2L, "x y x y", "duo"))
    val got = LmOps.vocabEntropy(corpus)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab_size"),
          r.getAs[Long]("ttr_milli"), r.getAs[Long]("entropy_milli"))).toMap
    // mono: N=4, cnt=4 → floor(log2 1)=0 bits; duo: cnt=2 each → 1 bit/token
    assert(got("mono") == (4L, 1L, 250L, 0L), s"got ${got("mono")}")
    assert(got("duo") == (4L, 2L, 500L, 1000L), s"got ${got("duo")}")
  }

  test("q104–q107 run end-to-end on the sf0.001 tables") {
    assert(LmOps.q104UnigramSurprisal(spark, sf).count() > 0)
    assert(LmOps.q105DupShingleFraction(spark, sf).count() > 0)
    assert(LmOps.q106BpePairStats(spark, sf).count() > 0)
    assert(LmOps.q107SourceDivergence(spark, sf).count() > 0)
  }

  test("q124 BPE merge step reproduces hand-computed greedy merges (incl. same-symbol chains)") {
    import org.apache.spark.sql.functions._
    def toSyms(words: (String, Long)*) =
      words.toSeq.toDF("word", "freq")
        .select($"word", $"freq", posexplode(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as(Seq("i0", "sym")))
        .select($"word", $"freq", ($"i0" + 1).cast("long").as("pos"), $"sym")
    def apply(df: org.apache.spark.sql.DataFrame, l: String, r: String) =
      LmOps.bpeMergeStep(df, l, r)
        .orderBy($"word", $"pos")
        .select($"word", $"sym").as[(String, String)].collect()
        .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).toSeq }
    // same-symbol chains: greedy takes 1st/3rd pairs
    val m1 = apply(toSyms("aaaa" -> 1L, "aaa" -> 1L, "baab" -> 1L), "a", "a")
    assert(m1("aaaa") == Seq("aa", "aa"))
    assert(m1("aaa") == Seq("aa", "a"))
    assert(m1("baab") == Seq("b", "aa", "b"))
    // distinct pair: all non-overlapping occurrences merge
    val m2 = apply(toSyms("abab" -> 1L, "aab" -> 1L, "ba" -> 1L), "a", "b")
    assert(m2("abab") == Seq("ab", "ab"))
    assert(m2("aab") == Seq("a", "ab"))
    assert(m2("ba") == Seq("b", "a"))
    // training end-to-end: pair counts weight by word frequency, and
    // tokens_after shrinks monotonically
    val out = LmOps.q124BpeTrain(spark, sf).collect()
    assert(out.length == 3)
    val after = out.map(_.getAs[Long]("tokens_after"))
    assert(after.zip(after.tail).forall { case (x, y) => y < x },
      s"BPE must shrink the token count per merge: ${after.toSeq}")
    assert(out.map(_.getAs[Long]("pair_count")).forall(_ > 0))
  }

  test("q125 positional coverage: interval union over planted shared spans is exact") {
    val dir = java.nio.file.Files.createTempDirectory("dupspan").toString
    // A and B share the 5-token span c1..c5 -> duplicated grams at
    // A-positions 2,3,4 whose union covers exactly 5 positions of A's 8.
    // D and E share two SEPARATED 3-gram spans (gap > 2) -> 3 + 3 = 6.
    // C shares nothing -> 0.
    Seq(
      (1L, "x1 x2 c1 c2 c3 c4 c5 y1", "en", "s", 1L),
      (2L, "z1 c1 c2 c3 c4 c5 z2 z3", "en", "s", 1L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8", "en", "s", 1L),
      (4L, "p1 p2 p3 m1 m2 m3 m4 q1 q2 q3", "en", "s", 1L),
      (5L, "p1 p2 p3 n1 n2 n3 n4 q1 q2 q3", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LmOps.q125DupSpanCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_positions"))).toMap
    assert(out(1L) == (8L, 5L), s"contiguous span union: ${out(1L)}")
    assert(out(2L) == (8L, 5L))
    assert(out(3L) == (8L, 0L))
    assert(out(4L) == (10L, 6L), s"two separated spans: ${out(4L)}")
    assert(out(5L) == (10L, 6L))
  }

  test("q123 DSIR: a planted target-vocabulary doc outranks off-distribution docs") {
    import org.apache.spark.sql.functions._
    // target source speaks vocabulary A; raw bulk speaks vocabulary B;
    // one probe doc in a third source speaks pure A and one speaks pure
    // B — DSIR importance must rank the A-speaker above the B-speaker,
    // and the A-speaker must be kept (top-k) while B is not
    val vocabA = (1 to 20).map(i => s"alpha$i")
    val vocabB = (1 to 20).map(i => s"beta$i")
    def sent(v: Seq[String], seed: Int) =
      (0 until 40).map(k => v((seed * 7 + k) % v.size)).mkString(" ")
    val docs = (
      (1 to 10).map(i => (i.toLong, sent(vocabA, i), "en", "src0", 1L)) ++
      (11 to 60).map(i => (i.toLong, sent(vocabB, i), "en", "bulk", 1L)) ++
      Seq((100L, sent(vocabA, 3), "en", "probe", 1L),
          (101L, sent(vocabB, 3), "en", "probe", 1L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = LmOps.dsirImportance(docs, "src0").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("mean_milli"), r.getAs[Boolean]("keep"))).toMap
    assert(out(100L)._1 > out(101L)._1,
      s"target-vocab probe must outrank: ${out(100L)} vs ${out(101L)}")
    assert(out(100L)._2, "target-vocab probe must be kept (top-k)")
    // kept set is exactly the top-128 by (mean_milli desc, doc_id)
    val ranked = out.toSeq.sortBy { case (id, (m, _)) => (-m, id) }.map(_._1)
    val expectKeep = ranked.take(128).toSet
    assert(out.forall { case (id, (_, k)) => k == expectKeep(id) })
  }

  test("q133 BPE encode: hand-computed token economy after a 2-merge early stop") {
    // corpus "aaaa aaaa aa b": merge 1 = (a,a) (weighted count 7),
    // merge 2 = (aa,aa) (count 2), then NO pair remains (aaaa→[aaaa],
    // aa→[aa], b→[b]) — training stops early and encode uses the final
    // vocab: aaaa = 1 token, aa = 1, b = 1.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe133").toString
    Seq((1L, "aaaa aaaa aa b"), (2L, "b aa"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.LmOps.q133BpeEncode(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 4L, 11L, 4L, 4000L / 11L),
      (2L, 2L, 3L, 2L, 2000L / 3L)), s"got $got")
  }

  test("q137 bigram surprisal: fixed phrase scores 0 bits; tail contexts take the 12-bit backoff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bg137").toString
    // doc 1: one token repeated 5000x — every transition is forced
    // (cnt2 ~ cnt1 → 0 bits, boilerplate flag). The 5000 occurrences
    // also push total mass past F so singleton contexts fall in the
    // TAIL: doc 2's transition out of rare r1 takes the flat backoff,
    // while doc 3's transition out of head-context x to a singleton
    // continuation earns floor(log2(5000/1)) = 12 bits CONDITIONALLY.
    Seq((1L, Seq.fill(5000)("x").mkString(" ")),
        (2L, "r1 r2"),
        (3L, "x r3"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.LmOps.q137BigramSurprisal(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 4999L, 0L, 0L, true),       // forced transitions: 0 bits
      (2L, 1L, 12L, 12000L, false),    // tail context backoff
      (3L, 1L, 12L, 12000L, false)),   // head context, rare continuation
      s"got $got")
  }

  test("q138 doc entropy: repetition scores 0 and flags; uniform singletons score log2(n); short docs exempt") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ent138").toString
    Seq((1L, Seq.fill(20)("a").mkString(" ")),            // pure repetition
        (2L, (1 to 16).map(i => s"u$i").mkString(" ")),   // all singletons
        (3L, "b b b"))                                    // short, exempt
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.LmOps.q138DocEntropy(spark, dir)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 20L, 1L, 0L, 50L, true),          // H = 0, 20 tokens → flagged
      (2L, 16L, 16L, 4000L, 1000L, false),   // 16 singletons → exactly 4 bits
      (3L, 3L, 1L, 0L, 333L, false)),        // repetitive but < 10 tokens
      s"got $got")
  }

  test("q124 BPE training on a pair-free corpus returns empty instead of throwing") {
    // Round-7 advice: all-single-character words have no adjacent symbol
    // pair, so there is nothing to merge — the engines must agree on the
    // empty result (the oracle's CTE chain yields 0 rows on this input).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe0").toString
    Seq((1L, "a b c"), (2L, "c a"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LmOps.q124BpeTrain(spark, dir).collect()
    assert(out.isEmpty, s"expected 0 merges on a pair-free corpus, got ${out.length}")
  }

  test("q161 PMI lift: planted collocation tops the list, support cut, exact values") {
    // N = 60 tokens; counts: new 6, york 6, of 20, the 20, rare 4, pair 4.
    // "new york" co-occurs exclusively (c12 = 6) → lift 6·60·1000/36 = 10000;
    // "of"/"the" are near-independent fillers; "rare pair" (c12 = 4) falls
    // under the support-5 cut; "york new" (c12 = 4) likewise.
    val corpus = docs(
      1L -> "new york new york new york",
      2L -> "new york new york new york",
      3L -> ("of the " * 10).trim,
      4L -> ("of of the the " * 5).trim,
      5L -> "rare pair rare pair rare pair rare pair")
    val got = LmOps.pmiCollocations(corpus)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("new", "york", 6L, 6L, 6L, 10000L),
      ("of", "the", 15L, 20L, 20L, 2250L),
      ("the", "of", 13L, 20L, 20L, 1950L),
      ("of", "of", 5L, 20L, 20L, 750L),
      ("the", "the", 5L, 20L, 20L, 750L)), s"got $got")
  }
}
