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

  test("q121 knn graph: planted duplicate is a mutual rank-1 neighbor; ranks are well-formed") {
    val dir = java.nio.file.Files.createTempDirectory("pknn").toString
    val rows = Seq((1L, 0L, vec(1)), (100L, 0L, vec(1))) ++
      (2 to 40).map(i => (i + 200L, 0L, vec(i)))
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PortableAnn.q121KnnGraph(spark, dir).collect()
    // identical vectors share every projection sign, so both directions
    // of the duplicate edge must surface at rank 1, cos ~ 1
    for ((q, c) <- Seq((1L, 100L), (100L, 1L))) {
      val hit = out.find(r => r.getAs[Long]("qid") == q && r.getAs[Long]("cid") == c)
      assert(hit.isDefined, s"dup edge $q -> $c missing")
      assert(hit.get.getAs[Long]("rk") == 1L)
      assert(hit.get.getAs[Double]("cos") > 0.999999)
    }
    // well-formed graph: per-query ranks are 1..n without gaps, cosines
    // non-increasing in rank, no self-edges
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    assert(out.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("cid")))

    // planted contrastive structure for q126: qid 500 has an identical
    // same-label twin (501) and an identical different-label impostor
    // (502) — positive and hard negative must both surface at cos ~1,
    // margin ~0 (the impostor is exactly as close as the positive)
    val cdir = java.nio.file.Files.createTempDirectory("phn").toString
    (Seq((500L, 7L, vec(9)), (501L, 7L, vec(9)), (502L, 8L, vec(9))) ++
      (2 to 40).map(i => (i + 600L, (i % 2).toLong, vec(i))))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$cdir/embeddings.parquet")
    val hn = PortableAnn.q126HardNegatives(spark, cdir).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    val r500 = hn(500L)
    assert(r500.getAs[Long]("pos_id") == 501L && r500.getAs[Double]("pos_cos") > 0.999999)
    assert(r500.getAs[Long]("neg_id") == 502L && r500.getAs[Double]("neg_cos") > 0.999999)
    assert(math.abs(r500.getAs[Double]("margin")) < 1e-9)

    // q132 on a planted impure cluster: four identical vectors, three
    // labeled 1 and one mislabeled 9 — the outvoted node must flip to
    // the neighborhood majority, the consistent nodes must not
    val ldir = java.nio.file.Files.createTempDirectory("plp").toString
    (Seq((700L, 1L, vec(13)), (701L, 1L, vec(13)), (702L, 1L, vec(13)),
      (703L, 9L, vec(13))) ++
      (2 to 40).map(i => (i + 800L, 5L, vec(i))))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$ldir/embeddings.parquet")
    val lp = PortableAnn.q132LabelProp(spark, ldir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("label0"), r.getAs[Long]("label2"), r.getAs[Boolean]("changed"))).toMap
    assert(lp(703L) == ((9L, 1L, true)), s"mislabeled node must flip: ${lp(703L)}")
    for (id <- Seq(700L, 701L, 702L))
      assert(lp(id)._2 == 1L && !lp(id)._3, s"consistent node flipped: $id -> ${lp(id)}")

    // the codegen'd fxp_dot bucket equals the from-scratch arithmetic
    // (kernel-vs-reference parity on the real sf corpus)
    val got = PortableAnn.q121KnnGraph(spark, sf)
      .select($"qid", $"bucket").distinct()
      .as[(Long, Long)].collect().toMap
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    for ((qid, bucket) <- got.take(20)) {
      val e = emb(qid)
      val want = (0 until 8).map { j =>
        val dj = (0 until 64).map { i =>
          val p = ((((j * 64 + i).toLong * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5).toFloat
          math.floor(e(i).toDouble * p.toDouble * 1e10).toLong
        }.sum
        if (dj >= 0) 1L << j else 0L
      }.sum
      assert(bucket == want, s"bucket mismatch for $qid: got $bucket want $want")
    }
  }

  test("q163 ann recall audit: identical corpus twin of an eval scores MRR 1000 and counts in the overlap") {
    val dir = java.nio.file.Files.createTempDirectory("pra").toString
    // eval 0 (0 % 97 == 0) has an identical corpus twin (id 1): same
    // projections → same bucket, exact cosine 1 → exact top-1; the
    // index must therefore retrieve it at rank 1 → mrr_milli = 1000
    val rows = Seq((0L, 0L, vec(1)), (1L, 0L, vec(1))) ++
      (2 to 40).map(i => (i + 200L, 0L, vec(i)))
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PortableAnn.q163AnnRecallAudit(spark, dir).collect()
    assert(out.map(_.getAs[Long]("eval_id")).toSeq == Seq(0L), out.mkString(","))
    val e0 = out.head
    assert(e0.getAs[Long]("mrr_milli") == 1000L, e0.toString)
    assert(e0.getAs[Long]("overlap_at_10") >= 1L, e0.toString)
    assert(e0.getAs[Long]("n_cand") >= 1L, e0.toString)
    assert(e0.getAs[Long]("overlap_at_10") <= 10L)
  }
}
