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

  test("q74 PQ/ADC ranking approximates exact L2 with a compressed index") {
    // exact squared-L2 top-10 per query (qid < 3), self excluded
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val vecs = e.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val exact = (0L until 3L).map { q =>
      val qv = vecs(q)
      q -> vecs.toSeq.filter(_._1 != q).map { case (id, v) =>
        id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    }.toMap
    val adc = VectorOps.q74PqAdc(spark, sf)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(adc.keySet == Set(0L, 1L, 2L) && adc.values.forall(_.size == 10))
    // 8-byte codes vs 256-byte vectors: ADC is lossy by design, but the
    // top-10 overlap must beat random (10/500 = 2%) by a wide margin
    val recall = exact.map { case (q, ex) => adc(q).count(ex.contains).toDouble / ex.size }
    val mean = recall.sum / recall.size
    assert(mean >= 0.2, f"mean ADC@10 recall $mean%.2f too low vs exact L2")
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
