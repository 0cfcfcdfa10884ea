package graft

import org.apache.spark.sql.functions._
import graft.operators.SimHash
import graft.plans.GraftExtensions

/** `simhash_sig` codegen expression: signature parity with the
  * 64-vote-column aggregate formulation it replaces on the q37 hot path,
  * plus codegen participation.
  */
class SimHashSigSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("simhash_sig matches the 64-column aggregate formulation") {
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val fast = SimHash.signatures(docs, "doc_id", "text")
      .withColumnRenamed("sig", "fast")
    val ref = SimHash.signaturesViaAgg(docs, "doc_id", "text")
      .withColumnRenamed("sig", "ref")
    val joined = fast.join(ref, Seq("doc_id"))
    assert(joined.count() > 0)
    assert(joined.filter($"fast" =!= $"ref").count() == 0)
  }

  test("stays in whole-stage codegen") {
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", array(xxhash64($"text"), xxhash64($"doc_id")).as("hs"))
      .createOrReplaceTempView("sh_sig")
    val df = spark.sql("SELECT doc_id, simhash_sig(hs) AS sig FROM sh_sig")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
