package graft

import graft.operators.Curation

/** Sanity for the curation-adjacent operators: the PII detectors must
  * actually FIRE on the planted PII (a hash-matching oracle would also
  * agree on a silently-broken regex that matches nothing), and
  * decontamination must only report training docs, never the eval set.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("q83 finds and redacts the planted email/ip/phone in every doc") {
    val rows = Curation.q83PiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_emails") >= 1L)
      assert(r.getAs[Long]("n_ips") >= 1L)
      assert(r.getAs[Long]("n_phones") >= 1L)
      val t = r.getAs[String]("redacted_text")
      assert(t.contains("<EMAIL>") && t.contains("<IP>") && t.contains("<PHONE>"))
      assert(!t.contains("@example.com") && !t.contains("555-867-5309"))
    }
  }

  test("q145 cuts a planted shared span from exactly the non-canonical copies") {
    // doc 1 owns the span (min doc_id) and keeps it verbatim; doc 2
    // embeds it mid-text and loses exactly the 5 span tokens; doc 3
    // shares only the first 3-gram and loses those 3 tokens. Boundary
    // grams straddling planted/unique tokens (e.g. "x2 alpha beta")
    // are df = 1 and must not trigger removal.
    val dir = java.nio.file.Files.createTempDirectory("q145").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "x1 x2 alpha beta gamma delta epsilon y1"),
      (3L, "alpha beta gamma z9"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Curation.q145DupSpanRemoval(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got sameElements Array(
      (1L, 5L, 0L, "alpha beta gamma delta epsilon"),
      (2L, 8L, 5L, "x1 x2 y1"),
      (3L, 4L, 3L, "z9")), got.mkString("; "))
  }


  test("q149 classifier: feature count = distinct unigrams + bigrams; keep tracks the threshold") {
    val dir = java.nio.file.Files.createTempDirectory("q149").toString
    Seq((1L, "a b a"), (2L, "zz"), (3L, "a b a"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Curation.q149QualityClassifier(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // "a b a": distinct unigrams {a, b} + distinct bigrams {"a b", "b a"} = 4
    assert(got(0)._2 == 4L, got.mkString("; "))
    assert(got(1)._2 == 1L) // "zz": one unigram, no bigram
    // identical text => identical score (deterministic model)
    assert(got(0).copy(_1 = 3L) == got(2))
    for (r <- got) assert(r._5 == (r._4 >= 1000000L), r.toString)
  }

  test("q150 cross-source matrix: a doc duplicated across sources lands in the right cell") {
    val dir = java.nio.file.Files.createTempDirectory("q150").toString
    Seq((1L, "alpha beta gamma delta", "A"), (2L, "alpha beta gamma delta", "B"),
        (3L, "alpha beta gamma delta", "A"), (4L, "unrelated text entirely here", "B"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.q150CrossSourceDups(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    // pairs (1,2): A->B, (1,3): A->A, (2,3): B->A, all exact dups
    assert(got == Seq(("A", "A", 1L, 1L), ("A", "B", 1L, 1L), ("B", "A", 1L, 1L)),
      got.mkString("; "))
  }

  test("q81 chunks tile every doc: full coverage, stride 48, size cap 64") {
    val rows = graft.operators.CorpusOps.q81DocChunks(spark, sf)
      .select($"doc_id", $"chunk_idx", $"n_tokens", $"n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for ((_, cs) <- rows) {
      val sorted = cs.sortBy(_._2)
      val n = sorted.head._3
      // chunk k covers [48k, min(48k+64, n)) — so the last chunk must
      // reach the end of the doc and every chunk is 1..64 tokens
      assert(sorted.zipWithIndex.forall { case ((_, k, _, _), i) => k == i })
      assert(sorted.forall { case (_, k, _, len) =>
        len == math.min(64L, n - k * 48L) && len >= 1L })
      val last = sorted.last
      assert(last._2 * 48L + last._4 == n, "chunks must cover the full doc")
    }
  }

  test("q82 packing offsets are contiguous per stream") {
    val rows = graft.operators.CorpusOps.q82SequencePack(spark, sf)
      .select($"lang", $"doc_id", $"t", $"offset", $"bin_first")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    for ((_, ds) <- rows) {
      val sorted = ds.sortBy(_._2)
      var expect = 0L
      for ((_, _, t, off, binFirst) <- sorted) {
        assert(off == expect, "offsets must be the exact running sum")
        assert(binFirst == off / 512L)
        expect += t
      }
    }
  }

  test("q84 reports only training docs with positive overlap") {
    val rows = Curation.q84Decontaminate(spark, sf).collect()
    assert(rows.nonEmpty, "synthetic corpus should have some shingle overlap")
    for (r <- rows) {
      assert(r.getAs[Long]("doc_id") % 97 != 0, "eval docs must not be reported")
      assert(r.getAs[Long]("eval_doc") % 97 == 0)
      assert(r.getAs[Long]("n_shared") >= 1L)
    }
  }

  test("q141 keeps the highest-QUALITY copy, not the smallest id; ties break to the smaller id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canon141").toString
    // core: 40 tokens with 8 stopwords → quality 0.4; the LONGER
    // near-dup (doc 11, 60 tokens, stop ratio kept ≥ 0.2) scores 0.6 —
    // so the min-id doc is NOT the best copy and a min-id keep rule
    // would delete the highest-quality text
    val core = (1 to 32).map(i => s"w$i").grouped(4)
      .flatMap(g => g :+ "the").mkString(" ")               // 40 toks, 8 "the"
    val extra = (33 to 48).map(i => s"w$i").grouped(4)
      .flatMap(g => g :+ "the").mkString(" ")               // +20 toks, +4 "the"
    Seq(
      (10L, core),
      (11L, s"$core $extra"),
      (12L, core.replace("w32", "zz")),
      (20L, ("the quick brown fox " * 10).trim),
      (21L, ("the quick brown fox " * 10).trim))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Curation.q141CanonicalSelection(spark, dir)
      .select($"doc_id", $"kept_doc", $"keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet.intersect(Set(10L, 11L, 12L)) == Set(10L, 11L, 12L),
      s"near-dup triple must cluster together, got ${got.keySet}")
    assert(got(11L) == ((11L, true)), s"highest-quality copy must be kept: $got")
    assert(got(10L) == ((11L, false)) && got(12L) == ((11L, false)),
      s"lower-quality copies deleted in favor of 11: $got")
    // identical pair: equal quality → smaller id wins deterministically
    assert(got(20L) == ((20L, true)) && got(21L) == ((20L, false)), s"$got")
  }

  test("q140 span plan: non-overlapping, in-bounds, n div 20 spans, ~15% coverage, deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("span140").toString
    // doc lengths from just-under-threshold (19 → no spans) to 300
    Seq(19, 20, 45, 100, 299).zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(LENGTH(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.CorpusOps.q140SpanCorruption(spark, dir)
      .select($"doc_id", $"span_idx", $"start", $"span_len", $"masked_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val lens = Map(0L -> 19L, 1L -> 20L, 2L -> 45L, 3L -> 100L, 4L -> 299L)
    assert(!rows.exists(_._1 == 0L), "a 19-token doc has no span budget")
    for ((docId, spans) <- rows.groupBy(_._1)) {
      val n = lens(docId)
      assert(spans.length == (n / 20).toInt, s"doc $docId span count")
      val sorted = spans.sortBy(_._3)
      // within bounds and pairwise non-overlapping (gap ≥ span_len)
      assert(sorted.forall(s => s._3 >= 0 && s._3 + s._4 <= n), s"doc $docId bounds")
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => b._3 >= a._3 + a._4
        case _ => true
      }, s"doc $docId spans overlap")
      val permille = spans.head._5
      assert(spans.forall(_._5 == permille))
      assert(permille >= 100L && permille <= 150L,
        s"doc $docId coverage $permille outside the ~15% design band")
    }
    val again = graft.operators.CorpusOps.q140SpanCorruption(spark, dir)
      .select($"doc_id", $"span_idx", $"start", $"span_len", $"masked_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.toSet == again.toSet)
  }

  test("q180 calibration audit: bins partition the scored docs, edges land in bins 0 and 9") {
    import spark.implicits._
    val bins = graft.operators.Curation.q180CalibrationAudit(spark, sf).collect()
    assert(bins.forall(r => r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 9))
    val scored = graft.operators.Curation.q149QualityClassifier(spark, sf)
    val lab = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id".isNotNull && $"lang".isNotNull).select($"doc_id")
    val total = scored.join(lab, Seq("doc_id")).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == total,
      "bins must partition every scored+labeled doc exactly once")
    assert(bins.forall(r => r.getAs[Long]("pos_permille") >= 0 &&
      r.getAs[Long]("pos_permille") <= 1000))
    // fixed-width binning ⇒ per-bin mean scores strictly ordered by bin
    val means = bins.sortBy(_.getAs[Long]("bin")).map(_.getAs[Long]("mean_score_milli"))
    assert(means.zip(means.tail).forall { case (a, b) => a < b }, means.mkString(","))
    // min and max scores define the range, so both edge bins are non-empty
    val present = bins.map(_.getAs[Long]("bin")).toSet
    assert(present.contains(0L) && present.contains(9L))
  }
}
