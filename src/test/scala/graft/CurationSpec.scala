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
