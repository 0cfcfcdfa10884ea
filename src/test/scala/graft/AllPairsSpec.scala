package graft

import org.apache.spark.sql.functions._

/** q134 / TextOps.prefixJaccardPairs — the prefix filter's EXACT-recall
  * claim, checked against brute-force all-pairs ground truth computed
  * with the identical per-doc hash relation and verify arithmetic: on a
  * dense deliberately-overlapping corpus (small token pool → many
  * borderline pairs around τ), the candidate-generation stage must lose
  * NOTHING and admit nothing the verify stage wouldn't reject.
  */
class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  private def overlapCorpus(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"allpairs$n").toString
    // 12 tokens per doc from a 17-token pool via affine id arithmetic:
    // shingle sets collide heavily and pair similarities spread across
    // the whole [0, 1] range, including just-above / just-below τ
    spark.range(n).select(
        $"id".as("doc_id"),
        concat_ws(" ",
          (0 until 12).map(j => concat(lit("t"), (($"id" * 7 + j * 3) % 17).cast("string"))): _*).as("text"),
        lit("en").as("lang"), lit("s").as("source"), lit(40L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q134 prefix-filtered pairs equal brute-force all-pairs at tau=0.7") {
    graft.plans.GraftExtensions.register(spark)
    val dir = overlapCorpus(120)
    val got = graft.operators.TextOps.q134AllPairsJoin(spark, dir)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    // ground truth: UNFILTERED cross join over the same kernel relation
    val perDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter(size($"hs") > 0)
    val brute = perDoc.select($"doc_id".as("doc_a"), $"hs".as("hs_a"))
      .crossJoin(perDoc.select($"doc_id".as("doc_b"), $"hs".as("hs_b")))
      .filter($"doc_a" < $"doc_b")
      .withColumn("common", call_function("sorted_intersect_count", $"hs_a", $"hs_b"))
      .withColumn("jaccard", $"common".cast("double") /
        (size($"hs_a") + size($"hs_b") - $"common"))
      .filter($"jaccard" >= 0.7)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "corpus must actually contain pairs at tau (vacuous otherwise)")
    assert(got == brute,
      s"prefix filter diverged from brute force: missing=${brute -- got}, extra=${got -- brute}")
  }

  test("prefix filter recall holds across thresholds on the same corpus") {
    graft.plans.GraftExtensions.register(spark)
    val dir = overlapCorpus(80)
    val perDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
    for (tau <- Seq(0.5, 0.8, 0.95)) {
      val got = graft.operators.TextOps.prefixJaccardPairs(perDoc, "doc_id", tau)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val brute = perDoc.select($"doc_id".as("doc_a"), $"hs".as("hs_a"))
        .crossJoin(perDoc.select($"doc_id".as("doc_b"), $"hs".as("hs_b")))
        .filter($"doc_a" < $"doc_b")
        .withColumn("c", call_function("sorted_intersect_count", $"hs_a", $"hs_b"))
        .filter($"c".cast("double") / (size($"hs_a") + size($"hs_b") - $"c") >= tau)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"tau=$tau: missing=${brute -- got}, extra=${got -- brute}")
    }
  }
}
