package graft

import graft.operators.Multimodal

/** Blob-tier dedup (round-8 verdict gap 2): planted byte-identical
  * blobs under DIFFERENT doc_ids must collapse to one q146 group, and
  * q147's attribute fingerprint must group near-dups (same 64-px
  * bucket, different exact bytes) that byte-dedup keeps apart.
  *
  * The synthetic image payload is a function of (doc_id parity, w, h)
  * with w = 1 + n_chars % 1024 and h = 1 + (doc_id·7) % 1024, so ids
  * congruent mod 2048 (same parity, same h residue) with equal n_chars
  * produce byte-identical blobs — the planted collision.
  */
class BlobDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("blobdedup").toString
    // ids 0, 2048, 4096: even (PNG), h = 1; same n_chars=10 → w = 11
    //   → three byte-identical PNGs
    // ids 1, 2049: odd (JPEG), h = 8; same n_chars → two identical JPEGs
    // id 5: odd, h = 36 → unique JPEG
    // ids 6, 8: even, n_chars 10/20 → w 11/21 (same 64-bucket), h 43/57
    //   (same 64-bucket) → near-dups for q147, distinct bytes for q146
    Seq(0L, 2048L, 4096L, 1L, 2049L, 5L, 6L, 8L)
      .toDF("doc_id")
      .selectExpr("doc_id", "'t' AS text", "'en' AS lang", "'s' AS source",
        "CAST(CASE WHEN doc_id = 8 THEN 20 ELSE 10 END AS BIGINT) AS n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q146 collapses planted byte-identical blobs across doc_ids") {
    val got = Multimodal.q146BlobDedup(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // groups: PNG {0,2048,4096}, JPEG {1,2049}, JPEG {5}, PNG {6}, PNG {8}
    assert(got.map(r => (r._1, r._3)) sameElements
      Array((0L, 3L), (1L, 2L), (5L, 1L), (6L, 1L), (8L, 1L)),
      got.mkString("; "))
    // PNG payload 29 B, JPEG 41 B — length blocking carried through
    assert(got.collect { case (k, n, _) if k % 2 == 0 => n }.forall(_ == 29L))
  }

  test("q147 groups near-dup blobs (same 64-px bucket) that byte-dedup keeps apart") {
    val got = Multimodal.q147BlobAttrFingerprint(spark, dir)
      .select($"rep_doc", $"format", $"n_members", $"n_exact")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // png bucket (wb 0, hb 0): {0, 2048, 4096} identical + {6} + {8}
    //   → 5 members but only 3 exact byte variants — the near-dup signal
    val png = got.find(_._1 == 0L).get
    assert(png == ((0L, "png", 5L, 3L)), got.mkString("; "))
    // jpeg bucket (wb 0, hb 0): {1, 2049} identical + {5} (h = 36,
    // same 64-bucket) → 3 members, 2 exact variants
    val jpeg = got.find(_._1 == 1L).get
    assert(jpeg._3 == 3L && jpeg._4 == 2L, got.mkString("; "))
  }
}
