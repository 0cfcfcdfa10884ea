package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnLsh, VectorOps}

/** ANN quality check: the SRP-LSH bucketed search must recover a
  * meaningful fraction of the brute-force top-3 neighbours on the real
  * embeddings table (multi-probe same/Hamming-1-bucket recall).
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("LSH ANN recall vs brute-force top-3 on sf0.001 embeddings") {
    val brute = VectorOps.q41CosineTopk(spark, sf)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // 6 planes (64 buckets over 500 vectors) per the sizing rule — the
    // corpus is weakly clustered (best-neighbour cos ≈ 0.36)
    val annPairs = AnnLsh.ann(graft.sources.Tables.embeddings(spark, sf), k = 3, planes = 6)
      .filter($"qid" < 20)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = brute.count(annPairs.contains).toDouble / brute.size
    // SRP + Hamming-1 multi-probe is a coarse filter; recall is expected
    // to be modest but far above random (random pairs: ~3/500 ≈ 0.6%)
    assert(recall >= 0.1, f"recall $recall%.3f too low vs brute force")
  }

  test("ANN never reports a pair from different buckets and scores are exact") {
    val out = AnnLsh.ann(graft.sources.Tables.embeddings(spark, sf), k = 2)
      .select($"qid", $"cid", $"cos").collect()
    out.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001, s"cosine out of range: $c")
    }
  }
}
