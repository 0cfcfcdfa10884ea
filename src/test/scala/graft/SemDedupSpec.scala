package graft

import graft.operators.SemDedup

/** Planted-duplicate truth for the SemDeDup composition: near-identical
  * vectors must land in one component with the min id kept, and
  * orthogonal vectors must stay out of the output entirely.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // one-hot test corpus: vector i points along dimension i (cos = 0
  // between any two distinct ids), except 17/18/19 which are scaled
  // copies of vector 5 (cos = 1 with it and each other). Scales stay
  // ≥ 0.9: L2 k-means blocking is magnitude-sensitive (a 0.5-scale
  // copy sits closer to a small-norm centroid than to its own
  // direction's), which is exactly the recall caveat the operator's
  // docs call out — production normalizes embeddings first.
  private def oneHot(dim: Int, scale: Float): Array[Float] = {
    val a = new Array[Float](64); a(dim) = scale; a
  }
  private val vecs: Seq[(Long, Array[Float])] =
    (0 until 17).map(i => (i.toLong, oneHot(i, 1.0f + i * 0.01f))) ++
      Seq((17L, oneHot(5, 2.0f)), (18L, oneHot(5, 0.9f)), (19L, oneHot(5, 3.0f)))

  test("semDedup: copies form one component, min id kept, orthogonals absent") {
    val emb = vecs.toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(emb, k = 8, threshold = 0.35, maxCell = 1000)
      .collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId.keySet == Set(5L, 17L, 18L, 19L),
      s"expected exactly the copy family, got ${byId.keySet}")
    for ((_, r) <- byId) assert(r.getAs[Long]("rep_id") == 5L)
    assert(byId(5L).getAs[Boolean]("is_kept"))
    for (id <- Seq(17L, 18L, 19L)) assert(!byId(id).getAs[Boolean]("is_kept"))
    // blocking put the whole family in one k-means cell
    assert(out.map(_.getAs[Long]("cluster")).distinct.length == 1)
  }

  test("q88 on the test tables: one keeper per component, reps are component minima") {
    val out = SemDedup.q88SemDedup(spark, sf).collect()
    assert(out.nonEmpty)
    val byRep = out.groupBy(_.getAs[Long]("rep_id"))
    for ((rep, members) <- byRep) {
      assert(members.map(_.getAs[Long]("vec_id")).min == rep)
      assert(members.count(_.getAs[Boolean]("is_kept")) == 1)
      assert(members.find(_.getAs[Long]("vec_id") == rep).get.getAs[Boolean]("is_kept"))
      // a component never spans two k-means cells: pairs only form
      // inside a cell and the closure is over those pairs... unless two
      // cells are bridged by shared members — impossible, membership is
      // a function. Pin it.
      assert(members.map(_.getAs[Long]("cluster")).distinct.length == 1)
    }
  }
}
