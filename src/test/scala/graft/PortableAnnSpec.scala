package graft

import graft.operators.PortableAnn

/** The portable SRP tier must behave like an ANN: identical vectors land
  * in the same bucket and re-rank at cosine 1; results are deterministic
  * across runs (exact integer bucket assignment — no float-boundary
  * flakiness).
  */
class PortableAnnSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => (((seed * 37 + i * 11) % 17) - 8).toFloat / 8f)

  test("identical vectors share a bucket and re-rank at cosine ~1") {
    val dir = java.nio.file.Files.createTempDirectory("pann").toString
    // vec 1 (a query: id < 5) duplicated as id 100
    val rows = Seq((1L, 0L, vec(1)), (100L, 0L, vec(1))) ++
      (2 to 40).map(i => (i + 200L, 0L, vec(i)))
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PortableAnn.q80AnnPortable(spark, dir).collect()
    val hit = out.find(r => r.getAs[Long]("qid") == 1L && r.getAs[Long]("cid") == 100L)
    assert(hit.isDefined, s"identical vector must be retrieved: ${out.mkString(",")}")
    assert(hit.get.getAs[Double]("cos") > 0.999999)
    assert(hit.get.getAs[Long]("rk") == 1L)
  }

  test("bucket assignment is deterministic across runs") {
    val a = PortableAnn.q80AnnPortable(spark, sf).collect().map(_.toString).toSeq
    val b = PortableAnn.q80AnnPortable(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
