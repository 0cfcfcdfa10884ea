package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** SemDeDup [Abbas et al. 2023, arXiv:2303.09540] — semantic
  * deduplication of an embedding corpus: cluster with k-means, then
  * inside each cluster find pairs above a cosine threshold and keep ONE
  * representative per connected group. The famous result: ~4% of
  * web-scale corpora are semantic duplicates exact/minhash dedup
  * misses. Composed entirely from this repo's oracle-checked tiers —
  * q55's Lloyd step (codebook), its assignment half (blocking), q54's
  * cell-blocked fixed-point pair verify, q59's connected components
  * (keep min vec_id per component).
  *
  * Scale shape is the sum of its parts: one Lloyd pass = broadcast
  * centroids + one agg shuffle; assignment = the same broadcast join;
  * the pair verify is bounded by Σ|cell|² with the [[VectorOps]]
  * hot-cell cap (at 100 TB, k is sized so cells stay ~10³ — the
  * SemDeDup paper itself runs k ≈ 10⁵ for exactly this reason); label
  * propagation rounds scale with component diameter, which a cosine
  * ball keeps tiny. Nothing is ever all-pairs.
  *
  * Every reduction is the fixed-point exact sum of the vector tiers, so
  * the DuckDB oracle replays the whole trajectory — Lloyd, assignment,
  * pair cosines, transitive closure — bit-for-bit.
  */
object SemDedup {

  def q88SemDedup(s: SparkSession, d: String): DataFrame =
    semDedup(embeddings(s, d).select(col("vec_id"), col("embedding")),
      k = 8, threshold = 0.35, maxCell = 1000)

  /** The reusable pipeline over any `(vec_id, embedding)` relation:
    * k-means blocking (init = first k ids, one Lloyd pass) → in-cell
    * cosine pairs → connected components → keep min id. Returns only
    * the members of near-dup components (singletons are trivially
    * kept and would dominate the output).
    *
    * Recall caveat: blocking is L2 k-means, which is MAGNITUDE-
    * sensitive — a short vector can land in a small-norm centroid's
    * cell away from its own direction's copies, and a cross-cell pair
    * is never verified. Pairs that do block together are exactly
    * verified, so precision is unaffected. Production embeddings are
    * L2-normalized before SemDeDup (the paper's setting), which makes
    * L2 assignment equivalent to cosine assignment and removes the
    * caveat.
    */
  def semDedup(vecs: DataFrame, k: Int, threshold: Double, maxCell: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val e = vecs
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"pos", $"v".cast("double").as("v"))
    val init = e.filter($"vec_id" < k)
      .select($"vec_id".as("c_id"), $"pos", $"v".as("cv"))
    // `assign` is BOUNDED (one (long, long) row per vector) and has 2+
    // consumers below — without truncation every consumer re-runs the
    // full Lloyd aggregation subtree (the q74/q76 checkpoint posture;
    // measured ~2× on q88). The codebook is NOT checkpointed: its only
    // consumer is the assignment below, so a checkpoint there bought
    // lineage truncation nobody reuses at the price of one extra driver
    // job — at this corpus size the query's cost is fixed per-job
    // overhead, and the assign checkpoint materializes Lloyd inline in
    // the same job.
    val cents = VectorOps.lloydStep(e, init)
    val assign = VectorOps.lloydAssign(e, cents).localCheckpoint()
    val emb = vecs
      .join(assign, Seq("vec_id"))
      .select($"vec_id", $"c_id".cast("int").as("label"), $"embedding")
    val pairs = VectorOps.embeddingNearDup(emb, threshold, maxCell)
    val comp = ConnectedComponents.labels(
      s, pairs.select($"vec_a", $"vec_b"), "vec_a", "vec_b")
    comp.select($"node".as("vec_id"), $"component".as("rep_id"))
      .join(assign, Seq("vec_id"))
      .select($"vec_id", $"c_id".as("cluster"), $"rep_id",
        ($"vec_id" === $"rep_id").as("is_kept"))
      .orderBy($"vec_id")
  }

  /** Oracle: q55's Lloyd CTE once (c1), its assign sub-CTE against c1
    * (c2_assign — c2 itself is never referenced, so DuckDB skips it),
    * then q54's pair cosines blocked by the assignment and q59's
    * recursive closure.
    */
  val q88Sql: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos, CAST(UNNEST(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |), c0 AS (
       |  SELECT vec_id AS c_id, pos, v AS cv FROM e WHERE vec_id < 8
       |), ${VectorOps.sqlLloydStep("e", "c0", "c1")},
       |${VectorOps.sqlLloydStep("e", "c1", "c2")},
       |asg AS (
       |  SELECT vec_id, c_id FROM c2_assign
       |), ok AS (
       |  SELECT c_id FROM asg GROUP BY c_id HAVING COUNT(*) <= 1000
       |), pe AS (
       |  SELECT e.vec_id, a.c_id, e.pos, e.v
       |  FROM e JOIN asg a USING (vec_id)
       |  WHERE a.c_id IN (SELECT c_id FROM ok)
       |), norms AS (
       |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
       |  FROM pe GROUP BY vec_id
       |), dots AS (
       |  SELECT a.c_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
       |  FROM pe a JOIN pe b ON a.pos = b.pos AND a.c_id = b.c_id AND a.vec_id < b.vec_id
       |  GROUP BY a.c_id, a.vec_id, b.vec_id
       |), pairs AS (
       |  SELECT d.vec_a, d.vec_b
       |  FROM dots d
       |  JOIN norms na ON d.vec_a = na.vec_id
       |  JOIN norms nb ON d.vec_b = nb.vec_id
       |  WHERE d.dot / (SQRT(na.n2) * SQRT(nb.n2)) >= 0.35
       |), sym AS (
       |  SELECT vec_a AS u, vec_b AS v FROM pairs
       |  UNION ALL SELECT vec_b AS u, vec_a AS v FROM pairs
       |), r(u, v) AS (
       |  SELECT u, u FROM sym
       |  UNION
       |  SELECT r.u, s2.v FROM r JOIN sym s2 ON r.v = s2.u
       |), comp AS (
       |  SELECT u AS vec_id, MIN(v) AS rep_id FROM r GROUP BY u
       |)
       |SELECT c.vec_id, a.c_id AS cluster, c.rep_id, c.vec_id = c.rep_id AS is_kept
       |FROM comp c JOIN asg a USING (vec_id)
       |ORDER BY c.vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_semdedup" -> (q88SemDedup _),
  )

  val oracles: Map[String, String] = Map(
    "q88_semdedup" -> q88Sql,
  )
}
