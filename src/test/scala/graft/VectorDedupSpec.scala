package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Hot-cell guard for the embedding near-dup tier: a degenerate cell
  * (more members than `maxCell`) must be excluded from the exact-verify
  * pair join — the candidate space stays bounded by |cells|·maxCell²
  * instead of going quadratic on the hot cell — while normal cells
  * still verify exactly.
  */
class VectorDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat / 6f)

  test("fxp_dot kernel matches the interpreted HOF fold bit-for-bit") {
    graft.plans.GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .withColumn("other", org.apache.spark.sql.functions.reverse($"embedding"))
    val rows = df.select(
      call_function("fxp_dot", $"embedding", $"other").as("kernel"),
      aggregate(
        zip_with($"embedding", $"other", (x, y) =>
          floor(x.cast("double") * y.cast("double") * 1e10).cast("long")),
        lit(0L), (acc, t) => acc + t).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("planted degenerate cell is excluded; small cells still pair") {
    // cell 0: 60 members (over cap 10), containing an identical pair
    val hot = (0 until 60).map(i => (i.toLong, 0L,
      if (i == 1) vec(0) else vec(i)))
    // cell 1: 4 members, two of them identical (cos = 1.0)
    val cold = Seq(
      (100L, 1L, vec(100)), (101L, 1L, vec(100)),
      (102L, 1L, vec(7)), (103L, 1L, vec(55)))
    val emb = (hot ++ cold).toDF("vec_id", "label", "embedding")

    val out = VectorOps.embeddingNearDup(emb, threshold = 0.99, maxCell = 10)
      .collect()
    // the identical pair inside the hot cell must NOT surface
    assert(!out.exists(_.getAs[Long]("cell") == 0L),
      s"hot cell leaked through the cap: ${out.mkString(",")}")
    // the identical pair in the small cell must surface
    assert(out.exists(r => r.getAs[Long]("vec_a") == 100L &&
      r.getAs[Long]("vec_b") == 101L && r.getAs[Double]("cos") > 0.999))
  }

  test("cap above all cell sizes is a no-op (oracle-identical at shipped sf)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val capped = VectorOps.embeddingNearDup(emb, 0.35, maxCell = 1000)
      .collect().map(_.toString).toSet
    val uncapped = VectorOps.embeddingNearDup(emb, 0.35, maxCell = Int.MaxValue)
      .collect().map(_.toString).toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("q143: a tail-matched neighbor tops the full list but vanishes from the truncated one") {
    val dir = java.nio.file.Files.createTempDirectory("mrl143").toString
    // query = e1 in the 16-dim prefix + all-ones tail; vec 1 matches
    // ONLY in the tail (prefix orthogonal) → full rank 1, truncated
    // cosine 0; 15 fillers carry prefix mass so vec 1 falls outside the
    // truncated top-10 and the overlap@10 drops to the 9 shared fillers
    def v(prefix: Seq[Float], tail: Float): Seq[Float] =
      (prefix ++ Seq.fill(16 - prefix.length)(0.0f) ++ Seq.fill(48)(tail))
    val rows = Seq(
      (0L, v(Seq(1.0f), 1.0f), 0),
      (1L, v(Seq(0.0f, 1.0f), 1.0f), 0)) ++
      (3L to 17L).map(i => (i, v(Seq(0.5f, i.toFloat / 100), 0.05f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.q143MatryoshkaAudit(spark, dir)
      .select($"vec_id", $"rank_full", $"rank_trunc", $"overlap_at_10")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byVec = got.map(r => r._1 -> r).toMap
    assert(byVec(1L)._2 == 1L, s"tail-matched vec must top the FULL list: $got")
    assert(byVec(1L)._3 == 1000L, s"and be absent from the truncated top-10: $got")
    assert(got.forall(_._4 == 9L), s"overlap@10 must be the 9 shared fillers: $got")
  }

  test("q152 semantic decontamination: a planted copy of an eval vector tops the audit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q152").toString
    // eval ids are multiples of 97; train vec 5 duplicates eval vec 97
    // exactly (cos 1), every other train vec is orthogonal-ish noise
    val rows = (0L to 120L).map { id =>
      val v: Seq[Float] =
        if (id == 97L || id == 5L) Seq(1.0f, 2.0f, 3.0f, 4.0f)
        else Seq((id % 7).toFloat + 1f, (id % 3).toFloat, 0f, (id % 11).toFloat)
      (id, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.q152SemanticDecontamination(spark, dir)
      .select($"train_id", $"max_cos", $"nearest_eval")
      .as[(Long, Double, Long)].collect()
    assert(got.head._1 == 5L && got.head._3 == 97L, got.take(3).mkString("; "))
    assert(math.abs(got.head._2 - 1.0) < 1e-9, got.head.toString)
    assert(got.length == 20)
    assert(got.forall(r => r._1 % 97 != 0 && r._3 % 97 == 0))
  }

  test("q162 grid-density: adjacent dense cells merge, isolated dense cell is its own cluster, sparse cells are noise") {
    // 13 occupied cells, 70 points, mean occupancy 70/13 ≈ 5.4 → core
    // needs cnt ≥ 6. Cells (0,0) and (0,1) are dense (20 each) and
    // 8-adjacent → ONE cluster labeled by the smaller cell key; cell
    // (-4,-4) is dense but isolated → its own singleton-cell cluster;
    // ten 1-point cells → noise (−1).
    val dir = java.nio.file.Files.createTempDirectory("griddb").toString
    def pt(id: Long, x: Float, y: Float) =
      (id, Array(x, y) ++ Array.fill(6)(0f), 0)
    val rows =
      (0L until 20L).map(i => pt(i, 0.05f, 0.05f)) ++        // cell (0,0)
      (20L until 40L).map(i => pt(i, 0.05f, 0.15f)) ++       // cell (0,1)
      (40L until 60L).map(i => pt(i, -0.35f, -0.35f)) ++     // cell (-4,-4)
      (0 until 10).map(k => pt(60L + k, 2.0f + k, 2.0f + k)) // 10 noise cells
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.q162GridDensityClusters(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    def key(cx: Long, cy: Long): Long = (cx + 512) * 1024 + cy + 512
    assert((0L until 40L).forall(got(_) == key(0, 0)),
      "adjacent dense cells must merge under the smaller cell key")
    assert((40L until 60L).forall(got(_) == key(-4, -4)),
      "isolated dense cell must form its own cluster")
    assert((60L until 70L).forall(got(_) == -1L), "sparse cells must be noise")
  }
}
