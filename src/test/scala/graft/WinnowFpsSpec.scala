package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.GraftExtensions

/** `winnow_fps` kernel: value parity with a naive per-window reference,
  * the winnowing containment guarantee, normalization edges, and codegen
  * participation.
  */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  /** Straight-line reference: re-hash every gram from scratch, rescan
    * every window — no rolling update, no deque. */
  private def naive(s: String, k: Int, w: Int): Seq[Long] = {
    val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val cps = t.codePoints().toArray
      .map(cp => if (cp >= 'A' && cp <= 'Z') cp + 32 else cp)
    val grams = cps.length - k + 1
    if (grams - w + 1 < 1) return Seq.empty
    val hashes = (0 until grams).map(p =>
      (0 until k).foldLeft(0L)((h, j) => h * 31L + cps(p + j)))
    (0 until grams - w + 1).map(p => (p until p + w).map(hashes).min)
      .distinct.sorted
  }

  private def kernel(s: String, k: Int = 8, w: Int = 4): Seq[Long] =
    graft.functions.WinnowFps.compute(UTF8String.fromString(s), k, w)
      .toLongArray().toSeq

  test("rolling-hash + deque kernel matches the naive reference over the corpus") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(kernel(t) == naive(t, 8, 4), s"mismatch on doc: ${t.take(60)}…")
    }
  }

  test("normalization and short-doc edges") {
    // fold: case-insensitive selection
    assert(kernel("The Quick Brown Fox Jumps") == kernel("the quick brown fox jumps"))
    // 0x20 trim changes nothing beyond the edges
    assert(kernel("  abcdefghijklm  ") == kernel("abcdefghijklm"))
    // k + w − 1 − 1 chars → no complete window → empty
    assert(kernel("abcdefghij") == Seq.empty) // 10 chars < 8 + 4 − 1
    assert(kernel("abcdefghijk").nonEmpty)    // exactly 11 → one window
    assert(kernel("") == Seq.empty)
    // parameter variants agree with the reference too
    for ((k, w) <- Seq((2, 1), (4, 8), (5, 3))) {
      val t = "Winnowing selects one fingerprint per window of hashes."
      assert(kernel(t, k, w) == naive(t, k, w), s"(k=$k, w=$w)")
    }
  }

  test("winnowing guarantee: docs sharing a ≥ k+w−1 substring share a fingerprint") {
    val boiler = "this exact boilerplate sentence is long enough to guarantee a shared pick"
    val a = kernel(s"unique prefix alpha $boiler")
    val b = kernel(s"$boiler totally different suffix omega")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    // and unrelated strings (no common 11-char run) share none
    val c = kernel("zq1x2c3v4b5n6m7k8j9h0gfdsapoiuytrewq zxcvbnmasdfghjkl")
    assert(a.toSet.intersect(c.toSet).isEmpty)
  }

  test("near-dup sim counts COMMON fingerprints too (df-cap is blocking-only)") {
    // the sf0.1 regression: 60 docs share boilerplate, so every
    // boilerplate fingerprint has df > 50 and is excluded from
    // CANDIDATE blocking — but two identical docs must still report
    // sim 1.0, which requires counting those common fingerprints in
    // the verify stage (the conflated form reported sim < 0.4 and
    // dropped true duplicates as the corpus grew)
    val boiler = "every document in this synthetic corpus carries this very " +
      "long shared boilerplate preamble sentence before its own content"
    val dup = s"$boiler and this pair of documents is completely identical in every way"
    val docs =
      Seq((1L, dup), (2L, dup)) ++
        (3L to 62L).map(i => (i, s"$boiler unique tail number $i with words w${i}a w${i}b"))
    val out = graft.operators.TextOps
      .winnowNearDupPairs(docs.toDF("doc_id", "text"))
      .select($"doc_a", $"doc_b", $"sim")
      .as[(Long, Long, Double)].collect()
    val pair = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(pair.isDefined, s"identical pair must survive blocking: ${out.toSeq}")
    assert(pair.get._3 == 1.0, s"identical docs must verify at sim 1.0, got ${pair.get._3}")
  }

  test("incremental dedup pairs always touch the increment; corpus pairs are excluded") {
    // ids 3 & 7: identical OLD docs (corpus×corpus — must NOT appear);
    // id 10 (is_new: %10) duplicates old id 4 — must appear
    val boiler = "a long enough shared preamble so every document fingerprints " +
      "the same baseline region of text before its own distinct content"
    val oldDup = s"$boiler and these two old documents are identical to each other"
    val matched = s"$boiler and this document has a twin inside the new increment"
    val rows = Seq(
      (3L, oldDup), (7L, oldDup),
      (4L, matched), (10L, matched),
      (11L, s"$boiler with an unrelated singleton body nothing matches at all"))
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("web")).withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.q100DedupIncrement(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((4L, 10L)), s"new-vs-old dup must be found: $got")
    assert(!got.contains((3L, 7L)),
      s"corpus-internal pair must be excluded from the increment run: $got")
  }

  test("works via SQL and stays in whole-stage codegen") {
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").createOrReplaceTempView("wf_docs")
    val df = spark.sql(
      "SELECT doc_id, winnow_fps(text, 8, 4) AS fps FROM wf_docs")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
