package graft

import graft.operators.Retrieval

/** q114 hybrid-retrieval semantics beyond the sf0.01 hash-match: a
  * planted duplicate of the query doc must win both retrievers and the
  * fusion; a lexically-disjoint doc enters through the semantic list
  * alone with the missing-list rank penalty.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("q114: planted duplicate tops both lists; disjoint doc takes the penalty rank") {
    val dir = java.nio.file.Files.createTempDirectory("ret114").toString
    Seq(
      (0L, "alpha beta gamma"),  // the query doc
      (7L, "alpha beta gamma"),  // exact duplicate → lex rank 1
      (3L, "alpha beta zzz"),    // partial overlap → lex rank 2
      (5L, "yyy xxx"))           // disjoint → absent from the lex list
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (7L, Seq(2.0f, 0.0f, 0.0f, 0.0f), 0), // same direction → cos 1
      (3L, Seq(0.5f, 0.5f, 0.0f, 0.0f), 0), // cos ≈ 0.707
      (5L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0)) // orthogonal → cos 0
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val got = Retrieval.q114HybridRetrieval(spark, dir)
      .select($"doc_id", $"lex_overlap", $"lex_rank", $"sem_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (7L, 3L, 1L, 1L),
      (3L, 2L, 2L, 2L),
      (5L, 0L, 1000L, 3L)), s"got $got")

    // rrf really orders the fusion: dup > partial > semantic-only
    val rrf = Retrieval.q114HybridRetrieval(spark, dir)
      .select($"doc_id", $"rrf").as[(Long, Double)].collect().toSeq
    assert(rrf.map(_._1) == Seq(7L, 3L, 5L))
    assert(rrf.head._2 == 1.0 / 61 + 1.0 / 61, s"dup rrf: ${rrf.head}")
  }

  test("q114 variable-width corpus: norms cover ALL positions, not just the query's") {
    // Round-7 advice: the old shape summed a corpus vector's n2 over
    // positions surviving the join with the query vector's pos set, so a
    // vector LONGER than the query had its norm silently deflated (and
    // its cosine inflated). Norms are now aggregated before that join;
    // this case plants exactly the corpus the old shape got wrong.
    val dir = java.nio.file.Files.createTempDirectory("ret114w").toString
    Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta"),
      (2L, "alpha zzz"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),                // query: width 2
      (1L, Seq(1.0f, 0.0f, 3.0f, 4.0f), 0),    // width 4: tail mass 25
      (2L, Seq(1.0f, 0.0f), 0))                // width 2, same direction
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val cos = Retrieval.q114HybridRetrieval(spark, dir)
      .select($"doc_id", $"cos").as[(Long, Double)].collect().toMap
    // full norm of vec 1 is sqrt(1+9+16) = sqrt(26); the dot with the
    // query covers the overlapping positions (tail treated as implicit
    // zeros of the shorter vector) = 1. Deflated-norm bug would yield 1.0.
    assert(math.abs(cos(1L) - 1.0 / math.sqrt(26.0)) < 1e-9,
      s"vec 1 cosine must use its FULL norm: ${cos(1L)}")
    assert(math.abs(cos(2L) - 1.0) < 1e-9, s"aligned equal-width vec: ${cos(2L)}")
  }

  test("q144 context assembly: greedy-by-rank admission stops exactly at the token budget") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ctx144").toString
    // rank 1 (exact dup, 3 tokens) fits; rank 2 is a 300-token document
    // that blows the 256 budget — it and everything after must carry
    // selected = false while still appearing with exact running totals
    val longText = "alpha beta " + (1 to 298).map(i => s"pad$i").mkString(" ")
    Seq(
      (0L, "alpha beta gamma"),
      (7L, "alpha beta gamma"),
      (3L, longText),
      (5L, "yyy xxx"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (7L, Seq(2.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Seq(0.5f, 0.5f, 0.0f, 0.0f), 0),
      (5L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Retrieval.q144ContextAssembly(spark, dir)
      .select($"rank", $"doc_id", $"n_tokens", $"cum_tokens", $"selected")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 7L, 3L, 3L, true),
      (2L, 3L, 300L, 303L, false),
      (3L, 5L, 2L, 305L, false)), s"got $got")
  }


  test("q148 MMR: the redundant twin of the first pick is demoted below a diverse doc") {
    val dir = java.nio.file.Files.createTempDirectory("mmr148").toString
    Seq((0L, "q"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // query along e1; docs 1 and 2 are scalar multiples (cos(1,2) = 1,
    // rel 0.85 each); doc 3 is moderately relevant (rel 0.6) but nearly
    // orthogonal to doc 1 (cos ~ 0.28); docs 4/5 orthogonal fillers.
    // Pure relevance ranks 1, 2, 3 - MMR must rank 1, 3, 2: the twin
    // carries max_sim = 1 (score 0.7*0.85 - 0.3 = 0.295) and loses to
    // the diverse doc (0.7*0.6 - 0.3*0.28 = 0.336).
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.85f, 0.5268f, 0.0f, 0.0f), 0),
      (2L, Seq(1.70f, 1.0536f, 0.0f, 0.0f), 0),
      (3L, Seq(0.6f, -0.44f, 0.668f, 0.0f), 0),
      (4L, Seq(0.0f, 0.0f, 0.0f, 1.0f), 0),
      (5L, Seq(0.0f, 0.0f, 0.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Retrieval.q148MmrRerank(spark, dir)
      .select($"mmr_rank", $"doc_id", $"max_sim")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L, 4L, 5L), got.mkString("; "))
    // the twin carries its identical-similarity penalty visibly
    assert(math.abs(got(2)._3 - 1.0) < 1e-9, s"twin max_sim: ${got(2)}")
    assert(got(0)._3 == 0.0)
  }

  test("q131 BM25: a doc sharing the query's rare term outranks stopword-only docs") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    // doc 0 = query: common stopwords + one rare term. Doc 1 carries the
    // rare term; docs 2..60 carry only the stopwords (so the rare term's
    // df = 1). BM25 must put doc 1 first by a positive rare-term margin,
    // and saturation must hold: doc 61 repeating the rare term 10x may
    // rank above doc 1 but by far less than 10x the margin.
    val stop = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, s"$stop xylophone", "en", "s", 1L),
      (1L, s"$stop xylophone", "en", "s", 1L),
      (61L, s"$stop ${Seq.fill(10)("xylophone").mkString(" ")}", "en", "s", 1L)) ++
      (2L to 60L).map(i => (i, stop, "en", "s", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Retrieval.q131Bm25(spark, dir).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm25_micro")).toMap
    val top = out.head.getAs[Long]("doc_id")
    assert(Set(1L, 61L)(top), s"a rare-term doc must rank first, got $top")
    val stopOnly = byId.filterKeys(k => k >= 2L && k <= 60L).values
    assert(byId(1L) > stopOnly.max,
      s"rare-term doc must beat every stopword-only doc: ${byId(1L)} vs ${stopOnly.max}")
    // tf saturation: 10 repeats must not yield 10x the single-occurrence
    // rare-term advantage
    val adv1 = byId(1L) - stopOnly.max
    val adv10 = byId(61L) - stopOnly.max
    assert(adv10 < 5 * adv1, s"saturation failed: adv(10x)=$adv10 vs adv(1x)=$adv1")
  }
}
