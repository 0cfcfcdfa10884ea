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
}
