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

  test("q114 precondition: every shipped embedding shares one width (n2-after-join soundness)") {
    // q114 computes corpus norms over positions surviving the join with
    // the query vector's pos set — sound only under a corpus-wide fixed
    // embedding width. Pin that precondition against the real testdata
    // so a future variable-width corpus fails HERE, not as a silent
    // oracle divergence.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/embeddings.parquet").exists) {
        val widths = spark.read.parquet(s"$dir/embeddings.parquet")
          .selectExpr("size(embedding) AS w").distinct().as[Int].collect().toSeq
        assert(widths.size == 1, s"$sf embeddings have mixed widths: $widths")
      }
    }
  }
}
