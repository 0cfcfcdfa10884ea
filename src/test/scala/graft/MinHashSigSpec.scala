package graft

import org.apache.spark.sql.functions._
import graft.operators.{MinHashLsh, TextOps}
import graft.plans.GraftExtensions

/** `minhash_sig` codegen expression: element-for-element parity with the
  * K-min-aggregate formulation ([[MinHashLsh.signatures]]) it replaces on
  * the q36 hot path, plus SQL registration and codegen participation.
  */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("minhash_sig matches the aggregate formulation element-for-element") {
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val viaAgg = MinHashLsh.signatures(docs).withColumnRenamed("sig", "ref")
    val viaExpr = TextOps.explodedShingles(docs, Seq("doc_id"), "text", 3)
      .groupBy($"doc_id")
      .agg(collect_list(xxhash64($"shingle")).as("hs"))
      .select($"doc_id",
        call_function("minhash_sig", $"hs", lit(MinHashLsh.K)).as("fast"))
    val joined = viaExpr.join(viaAgg, Seq("doc_id"))
    assert(joined.count() > 0)
    val mismatches = joined.filter($"fast" =!= $"ref").count()
    assert(mismatches == 0, s"$mismatches signatures differ")
  }

  test("works via SQL and stays in whole-stage codegen") {
    // parquet-backed source: a local relation would be constant-folded
    // away (ConvertToLocalRelation evaluates the expression interpreted
    // at optimize time), which proves nothing about codegen
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", array(xxhash64($"text"), xxhash64($"doc_id"), lit(7L)).as("hs"))
      .createOrReplaceTempView("mh_sig")
    val df = spark.sql("SELECT doc_id, minhash_sig(hs, 4) AS sig FROM mh_sig")
    val rows = df.as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(_._2.length == 4))
    // deterministic: same inputs, same signature, on every run
    val again = spark.sql("SELECT doc_id, minhash_sig(hs, 4) AS sig FROM mh_sig")
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
    // `*(N)` is simpleString's whole-stage-codegen marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(400))
  }

  test("empty and null hash arrays yield null, in both eval modes") {
    // a k×Long.MaxValue signature for empty docs would band every empty
    // doc into one spurious candidate bucket for bare-SQL users
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        when($"doc_id" % 2 === 0, array().cast("array<bigint>"))
          .otherwise(lit(null).cast("array<bigint>")).as("hs"))
      .limit(10)
      .createOrReplaceTempView("mh_empty")
    // codegen path (parquet-backed) …
    val viaSql = spark.sql("SELECT minhash_sig(hs, 4) AS sig FROM mh_empty")
    assert(viaSql.filter($"sig".isNotNull).count() == 0)
    // … and interpreted path (ConvertToLocalRelation folds eval())
    val interp = Seq(Seq.empty[Long]).toDF("hs")
      .select(call_function("minhash_sig", $"hs", lit(4)).as("sig"))
    assert(interp.filter($"sig".isNotNull).count() == 0)
  }
}
