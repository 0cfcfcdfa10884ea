package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnLsh
import graft.plans.GraftExtensions

/** `srp_bucket` codegen expression: bit-for-bit parity with the
  * interpreted lambda formulation it replaced (same xxhash64 seed chain,
  * same accumulation order), SQL registration, and codegen participation.
  */
class SrpBucketSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("srp_bucket matches the lambda formulation bit-for-bit") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    for (planes <- Seq(8, 16)) {
      val mismatches = emb
        .select($"vec_id",
          AnnLsh.bucket($"embedding", planes).as("fast"),
          AnnLsh.bucketLambda($"embedding", planes).as("ref"))
        .filter($"fast" =!= $"ref")
        .count()
      assert(mismatches == 0, s"planes=$planes: $mismatches buckets differ")
    }
  }

  test("buckets are within range and non-degenerate") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val b = emb.select(AnnLsh.bucket($"embedding", 8).as("b"))
    val stats = b.agg(min($"b"), max($"b"), countDistinct($"b")).head()
    assert(stats.getLong(0) >= 0L && stats.getLong(1) < 256L)
    assert(stats.getLong(2) > 1L, "all docs in one bucket = broken planes")
  }

  test("works via SQL and stays in whole-stage codegen") {
    graft.sources.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_srp")
    val df = spark.sql(
      "SELECT vec_id, srp_bucket(embedding, 8) AS b FROM emb_srp")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "srp_bucket should run inside WholeStageCodegen")
  }

  test("type check rejects non-float arrays and bad plane counts") {
    val err = intercept[Exception] {
      Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
        .select(expr("srp_bucket(v, 8)")).collect()
    }
    assert(err.getMessage.contains("srp_bucket") || err.getMessage.contains("DATATYPE"),
      err.getMessage)
  }
}
