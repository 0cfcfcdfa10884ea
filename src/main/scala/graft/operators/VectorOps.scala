package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Similarity search over the `embeddings` table (`array<float>`, 64-dim).
  *
  * Cross-engine float determinism: a dot product summed in different orders
  * differs in the last bits, so every reduction here floors the per-element
  * double product at 1e-10 into an exact long and sums those
  * (order-independent, identical under any partitioning and in DuckDB —
  * see [[xsum]]). Element products themselves are identical everywhere:
  * float widens to double exactly and IEEE multiplication is
  * deterministic.
  *
  * Scale shape: brute-force top-k ([[q41CosineTopk]]) is the correctness
  * baseline — O(|Q|·n·d) with a small query set, exploded to (vec, pos)
  * pairs so it is one shuffle-join + one aggregation, no driver loops.
  * The 100 TB path is LSH bucketing ([[AnnLsh]]): sign-random-projection
  * signatures bound candidates per bucket, then exact re-rank inside the
  * bucket.
  */
object VectorOps {

  /** (vec_id, pos, v_double) exploded view — the join-friendly layout. */
  private[operators] def exploded(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    embeddings(s, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"pos", $"v".cast("double").as("v"))
  }

  /** Deterministic sum of a double expression: each term is floored at
    * 1e-10 into an exact long (floor has no rounding ties, unlike a
    * double→decimal cast — DuckDB truncates those where Spark rounds
    * HALF_UP), summed exactly, and divided back once. Quantization error
    * ≤ 1e-10 per term, identical in both engines and under any
    * partitioning.
    */
  private[operators] def xsum(c: Column): Column =
    sum(floor(c * 1e10)).cast("double") / 1e10

  /** Per-label centroid: elementwise mean per (label, pos). One shuffle on
    * (label, pos) — d·|labels| cells regardless of row count.
    */
  def q40Centroids(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    embeddings(s, d)
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((xsum($"v".cast("double")) / count(lit(1))).as("mean_v"),
        count(lit(1)).as("n"))
      .select($"label", $"pos".cast("long").as("pos"), $"mean_v", $"n")
      .orderBy($"label", $"pos")
  }

  val q40Sql: String =
    """SELECT label, pos, CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS mean_v, COUNT(*) AS n
      |FROM (SELECT label, UNNEST(embedding) AS v, UNNEST(RANGE(0, LEN(embedding))) AS pos FROM embeddings)
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  /** Brute-force cosine top-3 per query (vec_id < 20 as the query set),
    * self excluded. Dot products and norms via [[xsum]]; the
    * top-k pick is a per-query row_number window over (cos DESC, vec_id).
    */
  def q41CosineTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = exploded(s, d)
    val norms = e.groupBy($"vec_id").agg(xsum($"v" * $"v").as("n2"))
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"pos", $"v".as("qv"))
    // Explicit broadcast of the (tiny) exploded query set: its size is a
    // post-filter estimate Spark can't trust, and a fallback shuffle join
    // would key on `pos` — 64 distinct values, so ≤64 useful partitions
    // no matter the cluster size. Broadcasting keeps the corpus side
    // partition-parallel at any scale.
    val dots = broadcast(q).join(e.as("c"), Seq("pos"))
      .filter($"qid" =!= $"c.vec_id")
      .groupBy($"qid", $"c.vec_id".as("cid"))
      .agg(xsum($"qv" * $"c.v").as("dot"))
    val scored = dots
      .join(broadcast(norms.select($"vec_id".as("qid"), $"n2".as("qn2"))), Seq("qid"))
      .join(broadcast(norms.select($"vec_id".as("cid"), $"n2".as("cn2"))), Seq("cid"))
      .withColumn("cos", $"dot" / (sqrt($"qn2") * sqrt($"cn2")))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"qid", $"rk".cast("long").as("rk"), $"cid", $"cos")
      .orderBy($"qid", $"rk")
  }

  val q41Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos, CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2 FROM e GROUP BY vec_id
      |), dots AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS cid,
      |    CAST(SUM(CAST(FLOOR(q.v * c.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e q JOIN e c ON q.pos = c.pos AND q.vec_id < 20 AND q.vec_id <> c.vec_id
      |  GROUP BY q.vec_id, c.vec_id
      |), scored AS (
      |  SELECT d.qid, d.cid, d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) AS cos
      |  FROM dots d JOIN norms qn ON d.qid = qn.vec_id JOIN norms cn ON d.cid = cn.vec_id
      |)
      |SELECT qid, rk, cid, cos FROM (
      |  SELECT qid, cid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      |  FROM scored)
      |WHERE rk <= 3
      |ORDER BY qid, rk""".stripMargin

  /** Nearest centroid per vector (an IVF assignment step): broadcast the
    * tiny centroid table, deterministic dot against each, pick argmax.
    * Demonstrates the classify/partition stage of IVF-style ANN at scale:
    * centroids broadcast, one pass over the data, no all-pairs.
    */
  def q42NearestCentroid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, d)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"label", $"pos", $"v".cast("double").as("v"))
    val cents = e.groupBy($"label", $"pos")
      .agg((xsum($"v") / count(lit(1))).as("cv"))
      .select($"label".as("c_label"), $"pos", $"cv")
    val scored = e.join(broadcast(cents), Seq("pos"))
      .groupBy($"vec_id", $"label", $"c_label")
      .agg(xsum($"v" * $"cv").as("dot"))
    val w = Window.partitionBy($"vec_id").orderBy($"dot".desc, $"c_label")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"vec_id", $"label", $"c_label".as("nearest_label"), $"dot")
      .orderBy($"vec_id")
  }

  val q42Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, UNNEST(RANGE(0, LEN(embedding))) AS pos, CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), cents AS (
      |  SELECT label AS c_label, pos, CAST(SUM(CAST(FLOOR(v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS cv
      |  FROM e GROUP BY label, pos
      |), scored AS (
      |  SELECT e.vec_id, e.label, c.c_label, CAST(SUM(CAST(FLOOR(e.v * c.cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e JOIN cents c ON e.pos = c.pos
      |  GROUP BY e.vec_id, e.label, c.c_label
      |)
      |SELECT vec_id, label, c_label AS nearest_label, dot FROM (
      |  SELECT vec_id, label, c_label, dot, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c_label) AS rk
      |  FROM scored)
      |WHERE rk = 1
      |ORDER BY vec_id""".stripMargin

  /** Embedding-cosine near-dup (the vector tier of the dedup family):
    * pairs within the same coarse cell whose exact cosine clears the
    * threshold. The cell here is the `label` column — the IVF blocking
    * attribute this table ships with (q42 computes assignments when no
    * cell id exists). Exact verify runs only inside cells, so the pair
    * space is Σ|cell|², never n² — the same bounded-candidates discipline
    * as the text dedup tiers; at 100 TB cells come from a k-means
    * codebook sized so cells stay small. Threshold 0.35 keeps a real
    * survivor set on this synthetic corpus (no planted near-identical
    * vectors; max within-cell cosine ≈ 0.47).
    */
  def q54EmbeddingDedup(s: SparkSession, d: String): DataFrame =
    embeddingNearDup(
      embeddings(s, d).select(col("vec_id"), col("label"), col("embedding")),
      threshold = 0.35, maxCell = 1000)

  /** Cell-blocked near-dup over (vec_id, cell-label, embedding).
    *
    * `maxCell` is the structural hot-cell guard the text tiers already
    * carry (`collect_capped`/`maxBucket`): cells with more than `maxCell`
    * members are EXCLUDED from the exact-verify pair join, so the
    * candidate space is bounded by |cells|·maxCell² no matter how
    * degenerate one cell gets — without it a single hot cell makes the
    * verify quadratic. A cell over the cap means the blocking codebook
    * is undersized for the corpus (re-train with larger k / re-cluster
    * the hot cell), which is the correct response at 100 TB — not
    * burning |cell|² dot products. The cap is mirrored in the oracle
    * SQL, and at the shipped data scales (max cell 218 at sf0.1) it
    * never triggers, so results are unchanged.
    *
    * The pair join keys on the cell id alone, so its shuffle
    * parallelism equals the cell count — at 100 TB the codebook is
    * sized in the thousands-to-millions so this is moot; a deployment
    * with few fat cells would salt the probe side by a vec_id bucket
    * (the [[SaltedJoin]] pattern) to spread each cell over many tasks.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double, maxCell: Int): DataFrame = {
    import emb.sparkSession.implicits._
    graft.plans.GraftExtensions.register(emb.sparkSession)
    // scalar fixed-point dot over the array columns — the SAME per-
    // element floor-at-1e-10 exact sum as [[xsum]] (bit-identical, so
    // the oracle is unchanged) but computed per PAIR ROW instead of
    // exploding to 64 (pos) rows per vector: the pair join carries one
    // row per candidate pair, not 64, and the whole dots aggregation
    // stage disappears — shuffle volume drops d× (round-4 formulation
    // joined exploded views and aggregated ~15 M rows at sf0.1). The
    // fold itself is the codegen'd [[graft.functions.FxpDot]] kernel
    // (the HOF aggregate/zip_with form evaluated interpreted per
    // element and cost ~2× the whole query).
    def fxdot(a: Column, b: Column): Column =
      call_function("fxp_dot", a, b).cast("double") / 1e10
    val okCells = emb.groupBy($"label")
      .agg(count(lit(1)).as("cell_n"))
      .filter($"cell_n" <= maxCell)
      .select($"label")
    // The explicit label repartition is (a) the materialization point
    // both pair sides read via ReuseExchange — identical column sets,
    // so pruning can't diverge the branches — and (b) the exchange a
    // sort-merge join on the cell key would demand anyway, so at scale
    // it costs nothing extra. Locally it matters for a different
    // reason: a broadcast pair join over a single-split file would run
    // the whole quadratic verify in ONE task; partitioning by cell
    // spreads it across cells.
    val ok = emb.join(broadcast(okCells), Seq("label"))
      .withColumn("n2", fxdot($"embedding", $"embedding"))
      // explicit N (TextOps discipline): a coalesced-to-one exchange
      // would run the whole in-cell quadratic verify on a single task
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, $"label")
    val a = ok.select($"label", $"vec_id".as("vec_a"), $"embedding".as("ea"), $"n2".as("na"))
    val b = ok.select($"label", $"vec_id".as("vec_b"), $"embedding".as("eb"), $"n2".as("nb"))
    // The groupBy over the (already unique) pair key is an evaluation
    // barrier, not a reduction: HOF expressions are interpreted and
    // excluded from subexpression elimination, so a plain
    // withColumn+filter evaluated the 64-element dot TWICE per pair
    // (once in the filter over ALL pairs, again in the projection).
    // The partial aggregate evaluates it exactly once map-side and the
    // filter reads the materialized column; the exchange moves only
    // slim (keys, dot) rows, which are the bounded candidate set.
    a.join(b, Seq("label"))
      .filter($"vec_a" < $"vec_b")
      .groupBy($"label", $"vec_a", $"vec_b", $"na", $"nb")
      .agg(max(fxdot($"ea", $"eb")).as("dot"))
      .withColumn("cos", $"dot" / (sqrt($"na") * sqrt($"nb")))
      .filter($"cos" >= threshold)
      .select($"vec_a", $"vec_b", $"label".cast("long").as("cell"), $"cos")
      .orderBy($"vec_a", $"vec_b")
  }

  val q54Sql: String =
    """WITH ok AS (
      |  -- hot-cell guard mirror: cells over 1000 members are excluded
      |  -- from the exact-verify tier (never triggers at shipped sf)
      |  SELECT label FROM embeddings GROUP BY label HAVING COUNT(*) <= 1000
      |), e AS (
      |  SELECT vec_id, label, UNNEST(RANGE(0, LEN(embedding))) AS pos, CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |  WHERE label IN (SELECT label FROM ok)
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2 FROM e GROUP BY vec_id
      |), dots AS (
      |  SELECT a.label AS cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e a JOIN e b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
      |  GROUP BY a.label, a.vec_id, b.vec_id
      |)
      |SELECT vec_a, vec_b, cell, cos FROM (
      |  SELECT d.vec_a, d.vec_b, CAST(d.cell AS BIGINT) AS cell,
      |    d.dot / (SQRT(na.n2) * SQRT(nb.n2)) AS cos
      |  FROM dots d
      |  JOIN norms na ON d.vec_a = na.vec_id
      |  JOIN norms nb ON d.vec_b = nb.vec_id)
      |WHERE cos >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin

  /** One Lloyd iteration: assign every vector to its nearest centroid
    * (squared distance = |v|² − 2·v·c + |c|²; |v|² is constant per vector
    * so argmin needs only −2·dot + |c|²), then recompute centroids as
    * per-cell elementwise means. Centroids broadcast (k·d values);
    * everything else is one pass + one agg shuffle over the corpus —
    * Lloyd at 100 TB is exactly `iters` such passes. All reductions via
    * [[xsum]] and ties broken on centroid id, so the trajectory is
    * bit-identical in any engine and under any partitioning.
    */
  private[operators] def lloydStep(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.join(lloydAssign(e, cents), Seq("vec_id"))
      .groupBy($"c_id", $"pos")
      .agg((xsum($"v") / count(lit(1))).as("cv"))
  }

  /** The assignment half of [[lloydStep]], reusable on its own (q88's
    * SemDeDup blocking assigns against the final codebook): nearest
    * centroid per vector by −2·dot + |c|², ties on centroid id.
    */
  private[operators] def lloydAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val cn2 = cents.groupBy($"c_id").agg(xsum($"cv" * $"cv").as("cn2"))
    val scored = e.join(broadcast(cents), Seq("pos"))
      .groupBy($"vec_id", $"c_id")
      .agg(xsum($"v" * $"cv").as("dot"))
      .join(broadcast(cn2), Seq("c_id"))
      .withColumn("ndist", lit(-2.0) * $"dot" + $"cn2")
    val w = Window.partitionBy($"vec_id").orderBy($"ndist", $"c_id")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"vec_id", $"c_id")
  }

  /** K-means codebook builder for IVF (Lloyd's algorithm, fixed
    * iteration count — the loop is over ITERATIONS, driver-side and
    * data-independent; each step is fully distributed). Deterministic
    * seeding: the first k vectors by id are the initial centroids.
    * Two iterations here so the DuckDB oracle can mirror the exact
    * trajectory; production would run to movement-epsilon.
    */
  def q55Kmeans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 8
    val e = exploded(s, d)
    val init = e.filter($"vec_id" < k)
      .select($"vec_id".as("c_id"), $"pos", $"v".as("cv"))
    val after = (1 to 2).foldLeft(init)((c, _) => lloydStep(e, c))
    after
      .select($"c_id", $"pos".cast("long").as("pos"), $"cv")
      .orderBy($"c_id", $"pos")
  }

  private[operators] def sqlLloydStep(e: String, cents: String, out: String): String =
    s"""${out}_cn2 AS (
       |  SELECT c_id, CAST(SUM(CAST(FLOOR(cv * cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS cn2
       |  FROM $cents GROUP BY c_id
       |), ${out}_scored AS (
       |  SELECT e.vec_id, c.c_id,
       |    -2.0 * (CAST(SUM(CAST(FLOOR(e.v * c.cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10) AS m2dot
       |  FROM $e e JOIN $cents c ON e.pos = c.pos
       |  GROUP BY e.vec_id, c.c_id
       |), ${out}_assign AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT s.vec_id, s.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY s.m2dot + n.cn2, s.c_id) AS rk
       |    FROM ${out}_scored s JOIN ${out}_cn2 n ON s.c_id = n.c_id)
       |  WHERE rk = 1
       |), $out AS (
       |  SELECT a.c_id, e.pos,
       |    CAST(SUM(CAST(FLOOR(e.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS cv
       |  FROM $e e JOIN ${out}_assign a ON e.vec_id = a.vec_id
       |  GROUP BY a.c_id, e.pos
       |)""".stripMargin

  val q55Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos, CAST(UNNEST(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |), c0 AS (
       |  SELECT vec_id AS c_id, pos, v AS cv FROM e WHERE vec_id < 8
       |), ${sqlLloydStep("e", "c0", "c1")},
       |${sqlLloydStep("e", "c1", "c2")}
       |SELECT c_id, CAST(pos AS BIGINT) AS pos, cv FROM c2 ORDER BY c_id, pos""".stripMargin

  /** Scalar (int8) embedding quantization — the compression step an
    * ANN index runs before storing vectors (256-level per-dimension
    * min/max scaling; 4× smaller than float32, the standard precursor
    * to PQ). Shape: one exploded pass → 64-row per-dimension stats
    * aggregate (shrinks with dims, not rows) broadcast back → pure-map
    * quantize + reconstruction error → per-vector aggregate. Every
    * per-row arithmetic step is a fixed IEEE-double op sequence mirrored
    * exactly in the oracle (cross-engine float hazards come from
    * aggregation ORDER, never from identical scalar op chains); the
    * aggregates themselves are exact (long sum, max, count). Constant
    * dimensions (mx == mn) quantize to 0 — guarded, the unguarded
    * division would be NaN.
    */
  def q65Quantize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ex = embeddings(s, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .withColumn("vd", $"v".cast("double"))
    val stats = ex.groupBy($"pos").agg(min($"vd").as("mn"), max($"vd").as("mx"))
    ex.join(broadcast(stats), Seq("pos"))
      .withColumn("q",
        when($"mx" > $"mn",
          least(floor(($"vd" - $"mn") * 255.0 / ($"mx" - $"mn")), lit(255.0)))
          .otherwise(lit(0.0)).cast("long"))
      .withColumn("err", abs($"vd" - ($"mn" + $"q" * ($"mx" - $"mn") / 255.0)))
      .groupBy($"vec_id")
      .agg(sum($"q").as("sum_q"), max($"err").as("max_abs_err"),
        count(lit(1)).as("n_dims"))
      .orderBy($"vec_id")
  }

  val q65Sql: String =
    """WITH ex AS (
      |  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS vd,
      |         UNNEST(RANGE(0, LEN(embedding))) AS pos
      |  FROM embeddings
      |), st AS (
      |  SELECT pos, MIN(vd) AS mn, MAX(vd) AS mx FROM ex GROUP BY pos
      |), qz AS (
      |  SELECT vec_id, vd, mn, mx,
      |    CAST(CASE WHEN mx > mn
      |              THEN LEAST(FLOOR((vd - mn) * 255.0 / (mx - mn)), 255)
      |              ELSE 0 END AS BIGINT) AS q
      |  FROM ex JOIN st USING (pos)
      |)
      |SELECT vec_id, CAST(SUM(q) AS BIGINT) AS sum_q,
      |  MAX(ABS(vd - (mn + q * (mx - mn) / 255.0))) AS max_abs_err,
      |  COUNT(*) AS n_dims
      |FROM qz GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Product quantization + asymmetric-distance search [Jégou et al.,
    * PAMI 2011] — the compression-side scale path for similarity search
    * that completes the trio next to brute force (q41) and IVF/LSH
    * routing (q42/q43): 64-dim float vectors become M=8 one-byte codes
    * (one per 8-dim subspace, K=16 centroids each), and a query scores
    * the WHOLE corpus by summing 8 table lookups per vector instead of
    * 64 multiplies.
    *
    * Pipeline (every stage distributed, every float reduction through
    * [[xsum]]-style fixed-point so the oracle reproduces it bit-exactly):
    *   1. sub-codebooks: per subspace, first-K-by-id seeding + one Lloyd
    *      step (the per-subspace replica of q55, composite (sub, c_id)
    *      keys; iteration count fixed so the oracle can unroll it);
    *   2. encode: nearest sub-centroid per (vector, subspace) via the
    *      −2·dot + ‖c‖² form — a broadcast join against the ≤ M·K·8-row
    *      codebook, one aggregation keyed (vec_id, sub);
    *   3. ADC lookup table: ‖q_sub − c‖² per (query, sub, centroid),
    *      kept in fixed-point BIGINT (never divided back to double) so
    *      the 8-term ADC sum stays integer-exact;
    *   4. score+rank: codes ⨝ broadcast(LUT) → 8-row sum per
    *      (query, vector), top-10 per query.
    *
    * Scale posture: codebook and LUT are O(M·K) — always broadcast; the
    * codes relation is the n×M compact representation (the 32× memory
    * win that makes 100 TB of vectors scannable); encode and score are
    * each ONE shuffle keyed by vector. At 100 TB the codebook-training
    * stages (init assign + centroid update) run on a corpus SAMPLE —
    * k-means needs thousands of vectors per centroid, not billions —
    * while encode/score scan everything; here the corpus is small enough
    * to train on in full. The final per-query window ranks |Q|
    * partitions — for large query sets swap it for the q64 bounded-heap
    * TopK aggregate.
    */
  def q74PqAdc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kSub = 16
    val e = exploded(s, d).withColumn("sub", expr("pos DIV 8"))

    // one Lloyd step over per-subspace centroids (q55's step with
    // composite (sub, c_id) keys)
    def subAssign(cents: DataFrame): DataFrame = {
      val cn2 = cents.groupBy($"sub", $"c_id").agg(xsum($"cv" * $"cv").as("cn2"))
      e.join(broadcast(cents.select($"pos", $"c_id", $"cv")), Seq("pos"))
        .groupBy($"vec_id", $"sub", $"c_id")
        .agg(xsum($"v" * $"cv").as("dot"))
        .join(broadcast(cn2), Seq("sub", "c_id"))
        .withColumn("ndist", lit(-2.0) * $"dot" + $"cn2")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"vec_id", $"sub").orderBy($"ndist", $"c_id")))
        .filter($"rk" === 1).select($"vec_id", $"sub", $"c_id")
    }
    val init = e.filter($"vec_id" < kSub)
      .select($"sub", $"vec_id".as("c_id"), $"pos", $"v".as("cv"))
    // localCheckpoint the BOUNDED trained codebook (K×d rows at any
    // corpus scale — same policy as q76): its three consumers (codes'
    // assign join + cn2, the LUT build) would otherwise each re-derive
    // it through the full training subtree (~3 corpus passes per
    // re-derivation). The corpus-sized relations (e, codes) stay
    // unmaterialized.
    val cents1 = e.join(subAssign(init), Seq("vec_id", "sub"))
      .groupBy($"sub", $"c_id", $"pos")
      .agg((xsum($"v") / count(lit(1))).as("cv"))
      .localCheckpoint()

    val codes = subAssign(cents1)
    // ADC lookup table: fixed-point ||q_sub - c||^2, BIGINT end to end
    val lut = e.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"pos", $"v".as("qv"))
      .join(broadcast(cents1), Seq("pos"))
      .groupBy($"qid", $"sub", $"c_id")
      .agg(sum(floor(($"qv" - $"cv") * ($"qv" - $"cv") * 1e10)).as("lut_fxp"))
    codes.join(broadcast(lut), Seq("sub", "c_id"))
      .filter($"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id")
      .agg(sum($"lut_fxp").as("adc_fxp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"adc_fxp", $"vec_id")))
      .filter($"rk" <= 10)
      .select($"qid", $"rk".cast("long").as("rk"), $"vec_id", $"adc_fxp")
      .orderBy($"qid", $"rk")
  }

  val q74Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         UNNEST(RANGE(0, LEN(embedding))) // 8 AS sub,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), c0 AS (
      |  SELECT sub, vec_id AS c_id, pos, v AS cv FROM e WHERE vec_id < 16
      |), cn2_0 AS (
      |  SELECT sub, c_id, CAST(SUM(CAST(FLOOR(cv * cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS cn2
      |  FROM c0 GROUP BY sub, c_id
      |), sc0 AS (
      |  SELECT e.vec_id, e.sub, c.c_id,
      |    CAST(SUM(CAST(FLOOR(e.v * c.cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e JOIN c0 c ON e.pos = c.pos
      |  GROUP BY e.vec_id, e.sub, c.c_id
      |), a0 AS (
      |  SELECT vec_id, sub, c_id FROM (
      |    SELECT s.vec_id, s.sub, s.c_id,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
      |                         ORDER BY -2.0 * s.dot + n.cn2, s.c_id) AS rk
      |    FROM sc0 s JOIN cn2_0 n ON s.sub = n.sub AND s.c_id = n.c_id)
      |  WHERE rk = 1
      |), c1 AS (
      |  SELECT e.sub, a.c_id, e.pos,
      |    CAST(SUM(CAST(FLOOR(e.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS cv
      |  FROM e JOIN a0 a ON e.vec_id = a.vec_id AND e.sub = a.sub
      |  GROUP BY e.sub, a.c_id, e.pos
      |), cn2_1 AS (
      |  SELECT sub, c_id, CAST(SUM(CAST(FLOOR(cv * cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS cn2
      |  FROM c1 GROUP BY sub, c_id
      |), sc1 AS (
      |  SELECT e.vec_id, e.sub, c.c_id,
      |    CAST(SUM(CAST(FLOOR(e.v * c.cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e JOIN c1 c ON e.pos = c.pos
      |  GROUP BY e.vec_id, e.sub, c.c_id
      |), codes AS (
      |  SELECT vec_id, sub, c_id FROM (
      |    SELECT s.vec_id, s.sub, s.c_id,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
      |                         ORDER BY -2.0 * s.dot + n.cn2, s.c_id) AS rk
      |    FROM sc1 s JOIN cn2_1 n ON s.sub = n.sub AND s.c_id = n.c_id)
      |  WHERE rk = 1
      |), lut AS (
      |  SELECT q.vec_id AS qid, c.sub, c.c_id,
      |    CAST(SUM(CAST(FLOOR((q.v - c.cv) * (q.v - c.cv) * 1e10) AS BIGINT)) AS BIGINT) AS lut_fxp
      |  FROM e q JOIN c1 c ON q.pos = c.pos
      |  WHERE q.vec_id < 3
      |  GROUP BY q.vec_id, c.sub, c.c_id
      |), adc AS (
      |  SELECT l.qid, k.vec_id, CAST(SUM(l.lut_fxp) AS BIGINT) AS adc_fxp
      |  FROM codes k JOIN lut l ON k.sub = l.sub AND k.c_id = l.c_id
      |  WHERE k.vec_id <> l.qid
      |  GROUP BY l.qid, k.vec_id
      |)
      |SELECT qid, CAST(rk AS BIGINT) AS rk, vec_id, adc_fxp FROM (
      |  SELECT qid, vec_id, adc_fxp,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fxp, vec_id) AS rk
      |  FROM adc)
      |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** IVF probe search — the query-time half of the inverted-file index
    * (q42 is the build-time assignment; q55 trains the codebook; q74
    * compresses the lists). Each query routes to its `nprobe`=2 nearest
    * cells by centroid distance, then exact-scores ONLY those cells'
    * members (integer-exact L2² in fixed point — a BIGINT end to end, so
    * the oracle hash-matches bit-for-bit) and keeps the top-5.
    *
    * Scale shape: the codebook (cells×d) and per-query probe set
    * (|Q|·nprobe rows) are always broadcast, so the corpus side stays
    * partition-parallel; candidates are bounded by nprobe·|cell| — never
    * the full corpus, never all-pairs. At 100 TB the cell id is the
    * table's partition column, so the probe join becomes partition
    * pruning: unprobed inverted lists are never read off disk. Recall is
    * tunable via nprobe exactly as in FAISS-style IVF ANN.
    */
  def q76IvfSearch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nprobe = 2
    val e = embeddings(s, d)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"label", $"pos", $"v".cast("double").as("v"))
    // codebook: per-cell elementwise mean (the label column is this
    // table's IVF cell id; q55's Lloyd builds one where none exists).
    // localCheckpoint the BOUNDED derived relations — codebook
    // (cells×d rows) and query set (|Q|×d) — so the five consumers
    // below (cn2, both probe joins, both candidate joins) stop
    // re-deriving them from the corpus: without this the exploded view
    // was recomputed 4× (the round-4 advice item). The corpus-sized
    // view itself is never materialized — at 100 TB that would be the
    // bug, not the fix; its two remaining passes are the codebook
    // build and the candidate scan, plus a parquet-pruned read for
    // the tiny query set.
    val cents = e.groupBy($"label", $"pos")
      .agg((xsum($"v") / count(lit(1))).as("cv"))
      .select($"label".as("c_label"), $"pos", $"cv")
      .localCheckpoint()
    val cn2 = cents.groupBy($"c_label").agg(xsum($"cv" * $"cv").as("cn2"))
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"pos", $"v".as("qv"))
      .localCheckpoint()
    // route: nprobe nearest cells per query; ‖q‖² is constant per query
    // so argmin needs only −2·q·c + ‖c‖²
    val probes = qe.join(broadcast(cents), Seq("pos"))
      .groupBy($"qid", $"c_label")
      .agg(xsum($"qv" * $"cv").as("dot"))
      .join(broadcast(cn2), Seq("c_label"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy(lit(-2.0) * $"dot" + $"cn2", $"c_label")))
      .filter($"rk" <= nprobe)
      .select($"qid", $"c_label")
    // probe: exact integer L2² over ONLY the probed inverted lists
    e.join(broadcast(probes), $"label" === $"c_label")
      .filter($"vec_id" =!= $"qid")
      .join(broadcast(qe), Seq("qid", "pos"))
      .groupBy($"qid", $"vec_id", $"label")
      .agg(sum(floor(($"qv" - $"v") * ($"qv" - $"v") * 1e10).cast("long")).as("l2_fxp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"l2_fxp", $"vec_id")))
      .filter($"rk" <= 5)
      .select($"qid", $"rk".cast("long").as("rk"), $"vec_id",
        $"label".cast("long").as("cell"), $"l2_fxp")
      .orderBy($"qid", $"rk")
  }

  val q76Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), cents AS (
      |  SELECT label AS c_label, pos,
      |    CAST(SUM(CAST(FLOOR(v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS cv
      |  FROM e GROUP BY label, pos
      |), cn2 AS (
      |  SELECT c_label, CAST(SUM(CAST(FLOOR(cv * cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS cn2
      |  FROM cents GROUP BY c_label
      |), qe AS (
      |  SELECT vec_id AS qid, pos, v AS qv FROM e WHERE vec_id < 5
      |), probes AS (
      |  SELECT qid, c_label FROM (
      |    SELECT d.qid, d.c_label,
      |      ROW_NUMBER() OVER (PARTITION BY d.qid
      |                         ORDER BY -2.0 * d.dot + n.cn2, d.c_label) AS rk
      |    FROM (
      |      SELECT q.qid, c.c_label,
      |        CAST(SUM(CAST(FLOOR(q.qv * c.cv * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |      FROM qe q JOIN cents c ON q.pos = c.pos
      |      GROUP BY q.qid, c.c_label) d
      |    JOIN cn2 n ON d.c_label = n.c_label)
      |  WHERE rk <= 2
      |), cand AS (
      |  SELECT p.qid, e.vec_id, e.label,
      |    CAST(SUM(CAST(FLOOR((q.qv - e.v) * (q.qv - e.v) * 1e10) AS BIGINT)) AS BIGINT) AS l2_fxp
      |  FROM e JOIN probes p ON e.label = p.c_label AND e.vec_id <> p.qid
      |  JOIN qe q ON q.qid = p.qid AND q.pos = e.pos
      |  GROUP BY p.qid, e.vec_id, e.label
      |)
      |SELECT qid, CAST(rk AS BIGINT) AS rk, vec_id, CAST(cell AS BIGINT) AS cell, l2_fxp FROM (
      |  SELECT qid, vec_id, label AS cell, l2_fxp,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2_fxp, vec_id) AS rk
      |  FROM cand)
      |WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin

  /** q127 — the leading principal direction of the embedding corpus via
    * POWER ITERATION on the (un-centered) second-moment matrix — the
    * distributed-linear-algebra shape behind whitening, PCA filtering,
    * and embedding diagnostics (e.g. detecting a dominant "rogue"
    * direction). Three fixed iterations from the all-ones start, every
    * step exact int64 so the oracle replays the whole trajectory:
    *
    *  - Gram: G_fix(i,j) = Σ_v floor(vᵢ·vⱼ·10⁶) — one corpus pass as a
    *    DOUBLE EXPLODE over each row's own array (never the pos
    *    self-join form, which re-shuffles the exploded corpus on
    *    vec_id): scan → generate ×64 → generate ×64 → map-side partial
    *    agg, so the one shuffle carries 64² partials per map task, not
    *    corpus rows; at any corpus size G stays 4096 rows
    *    (localCheckpoint'd: bounded, four consumers).
    *  - Iterate: y = G·x in exact long sums (|y| ≤ 64·8·10⁹·2¹⁷ <
    *    2⁶³); renormalize to scale 2¹⁶ with SIGN·(|y| div (max|y| div
    *    2¹⁶)) — division on MAGNITUDES only, because Spark's `div`
    *    truncates toward zero while DuckDB's `//` floors, and they
    *    agree only on non-negatives.
    *  - λ estimate: component ratio |y*| div |x*| at the dominant
    *    coordinate (G is PSD so the signs agree) — in G's 10⁶
    *    fixed-point units.
    *
    * The x relation is 64 rows — always broadcast into the G join; the
    * only corpus-sized work is the single Gram pass.
    */
  def q127PcaPower(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val S = 65536L
    val g = embeddings(s, d)
      .select($"embedding", posexplode($"embedding").as(Seq("i", "vi")))
      .select($"i", $"vi", posexplode($"embedding").as(Seq("j", "vj")))
      .groupBy($"i".cast("long").as("i"), $"j".cast("long").as("j"))
      .agg(sum(floor($"vi".cast("double") * $"vj".cast("double") * 1e6)
        .cast("long")).as("g"))
      .localCheckpoint()
    def matvec(x: DataFrame): DataFrame =
      g.join(broadcast(x), Seq("j")).groupBy($"i").agg(sum($"g" * $"x").as("y"))
    var x: DataFrame = s.range(64).select($"id".as("j"), lit(S).as("x"))
    for (_ <- 1 to 3) {
      val y = matvec(x)
      val m = y.agg(max(abs($"y")).as("m"))
      x = y.crossJoin(broadcast(m))
        .select($"i".as("j"),
          expr(s"CAST(SIGN(y) AS BIGINT) * (abs(y) div greatest(m div $S, 1))").as("x"))
    }
    val lam = matvec(x)
      .join(broadcast(x.select($"j".as("i"), $"x")), Seq("i"))
      .orderBy(abs($"x").desc, $"i")
      .limit(1)
      .select(expr("abs(y) div greatest(abs(x), 1)").as("lambda_fix"))
    x.select($"j".as("i"), $"x")
      .crossJoin(broadcast(lam))
      .orderBy($"i")
  }

  val q127Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), g AS (
      |  SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e6) AS BIGINT)) AS BIGINT) AS g
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id
      |  GROUP BY 1, 2
      |), x0 AS (
      |  SELECT CAST(id AS BIGINT) AS j, CAST(65536 AS BIGINT) AS x
      |  FROM (SELECT UNNEST(RANGE(64)) AS id)
      |), y1 AS (
      |  SELECT g.i, CAST(SUM(g.g * x.x) AS BIGINT) AS y FROM g JOIN x0 x ON g.j = x.j GROUP BY g.i
      |), x1 AS (
      |  SELECT i AS j, CAST(SIGN(y) AS BIGINT) *
      |    (ABS(y) // GREATEST((SELECT MAX(ABS(y)) FROM y1) // 65536, 1)) AS x
      |  FROM y1
      |), y2 AS (
      |  SELECT g.i, CAST(SUM(g.g * x.x) AS BIGINT) AS y FROM g JOIN x1 x ON g.j = x.j GROUP BY g.i
      |), x2 AS (
      |  SELECT i AS j, CAST(SIGN(y) AS BIGINT) *
      |    (ABS(y) // GREATEST((SELECT MAX(ABS(y)) FROM y2) // 65536, 1)) AS x
      |  FROM y2
      |), y3 AS (
      |  SELECT g.i, CAST(SUM(g.g * x.x) AS BIGINT) AS y FROM g JOIN x2 x ON g.j = x.j GROUP BY g.i
      |), x3 AS (
      |  SELECT i AS j, CAST(SIGN(y) AS BIGINT) *
      |    (ABS(y) // GREATEST((SELECT MAX(ABS(y)) FROM y3) // 65536, 1)) AS x
      |  FROM y3
      |), y4 AS (
      |  SELECT g.i, CAST(SUM(g.g * x.x) AS BIGINT) AS y FROM g JOIN x3 x ON g.j = x.j GROUP BY g.i
      |), lam AS (
      |  SELECT CAST(ABS(y.y) // GREATEST(ABS(x.x), 1) AS BIGINT) AS lambda_fix
      |  FROM y4 y JOIN x3 x ON y.i = x.j
      |  ORDER BY ABS(x.x) DESC, y.i LIMIT 1
      |)
      |SELECT x3.j AS i, CAST(x3.x AS BIGINT) AS x, lam.lambda_fix
      |FROM x3 CROSS JOIN lam ORDER BY i""".stripMargin

  /** q143 — Matryoshka truncation audit [Kusupati et al. 2022, MRL —
    * the property modern embedding models are trained for and vector
    * stores exploit]: how much retrieval quality survives keeping only
    * the first 16 of 64 dimensions? The full-precision top-10 (q41's
    * exact fixed-point cosine, query = vec 0) is decorated with each
    * hit's rank under TRUNCATED cosine (rank 1000 when absent — q114's
    * missing-list convention) plus the overlap@10 — the measured
    * decision input for "can we serve ANN from the 4× cheaper prefix
    * and rerank with full vectors".
    *
    * Scale shape: two instances of the q41/q114 chain (norms + dots as
    * vec_id-keyed partial+final aggs, query vector broadcast, top-10
    * via TakeOrderedAndProject); the truncated arm scans 25% of the
    * exploded positions; everything after the two limits runs on
    * ≤ 10-row relations.
    */
  def q143MatryoshkaAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = exploded(s, d)
    def arm(ed: DataFrame, tag: String): DataFrame = {
      val norms = ed.groupBy($"vec_id").agg(xsum($"v" * $"v").as("n2"))
      val qv = ed.filter($"vec_id" === 0).select($"pos", $"v".as("qv"))
      val qn = norms.filter($"vec_id" === 0).select($"n2".as("qn2"))
      ed.join(broadcast(qv), Seq("pos"))
        .filter($"vec_id" =!= 0)
        .groupBy($"vec_id").agg(xsum($"qv" * $"v").as("dot"))
        .join(norms, Seq("vec_id")).crossJoin(broadcast(qn))
        .select($"vec_id", ($"dot" / (sqrt($"n2") * sqrt($"qn2"))).as(s"cos_$tag"))
        .orderBy(col(s"cos_$tag").desc, $"vec_id").limit(10)
    }
    val fullTop = arm(e, "full").withColumn("rank_full",
      row_number().over(BoundedWindow.ordered($"vec_id", $"cos_full".desc, $"vec_id")).cast("long"))
    val truncTop = arm(e.filter($"pos" < 16), "trunc").withColumn("rank_trunc",
      row_number().over(BoundedWindow.ordered($"vec_id", $"cos_trunc".desc, $"vec_id")).cast("long"))
    val joined = fullTop
      .join(truncTop.select($"vec_id", $"rank_trunc"), Seq("vec_id"), "left")
    val overlap = joined.agg(count($"rank_trunc").as("overlap_at_10"))
    joined.crossJoin(broadcast(overlap))
      .select($"vec_id", $"rank_full", $"cos_full",
        coalesce($"rank_trunc", lit(1000L)).as("rank_trunc"), $"overlap_at_10")
      .orderBy($"rank_full")
  }

  val q143Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY vec_id
      |), dots AS (
      |  SELECT c.vec_id, CAST(SUM(CAST(FLOOR(q.v * c.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e c JOIN e q ON q.vec_id = 0 AND q.pos = c.pos
      |  WHERE c.vec_id <> 0 GROUP BY c.vec_id
      |), fullr AS (
      |  SELECT vec_id,
      |    dot / (SQRT(n2) * SQRT((SELECT n2 FROM norms WHERE vec_id = 0))) AS cos_full
      |  FROM dots JOIN norms USING (vec_id)
      |  ORDER BY cos_full DESC, vec_id LIMIT 10
      |), fullrk AS (
      |  SELECT vec_id, cos_full,
      |    ROW_NUMBER() OVER (ORDER BY cos_full DESC, vec_id) AS rank_full
      |  FROM fullr
      |), et AS (SELECT * FROM e WHERE pos < 16
      |), tnorms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM et GROUP BY vec_id
      |), tdots AS (
      |  SELECT c.vec_id, CAST(SUM(CAST(FLOOR(q.v * c.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM et c JOIN et q ON q.vec_id = 0 AND q.pos = c.pos
      |  WHERE c.vec_id <> 0 GROUP BY c.vec_id
      |), truncr AS (
      |  SELECT vec_id,
      |    dot / (SQRT(n2) * SQRT((SELECT n2 FROM tnorms WHERE vec_id = 0))) AS cos_trunc
      |  FROM tdots JOIN tnorms USING (vec_id)
      |  ORDER BY cos_trunc DESC, vec_id LIMIT 10
      |), truncrk AS (
      |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_trunc DESC, vec_id) AS rank_trunc
      |  FROM truncr
      |)
      |SELECT f.vec_id, CAST(f.rank_full AS BIGINT) AS rank_full, f.cos_full,
      |  CAST(COALESCE(t.rank_trunc, 1000) AS BIGINT) AS rank_trunc,
      |  CAST((SELECT COUNT(*) FROM fullrk ff JOIN truncrk tt USING (vec_id)) AS BIGINT) AS overlap_at_10
      |FROM fullrk f LEFT JOIN truncrk t USING (vec_id)
      |ORDER BY f.rank_full""".stripMargin


  /** q152 — SEMANTIC decontamination: the embedding-level sibling of
    * q84's n-gram sweep (the Llama/GPT-4-style contamination audit —
    * paraphrased benchmark leakage that shares no shingles still sits
    * next to its eval doc in embedding space). Eval set = vec_id % 97
    * (q84's convention); the audit reports the TOP-20
    * most-contaminated train docs (by exact max cosine to any eval
    * vector, ties by id) — the worst-offenders list an audit actually
    * consumes, stable at any scale factor unlike a fixed threshold.
    *
    * Scale shape: the eval side is benchmark-sized and BROADCASTS into
    * the position join (the q41 discipline — a shuffle join would key
    * on 64 pos values and cap parallelism); per-train argmax is one
    * deterministic `max(struct)` aggregate over eval-normalized partial
    * cosines (eval norms fold in pre-aggregate — broadcast-sized; the
    * train norm divides AFTER the argmax on the train-sized relation,
    * valid because it is constant within the group). Exact fixed-point
    * dots throughout, so the top-20 cut is cross-engine stable.
    */
  def q152SemanticDecontamination(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = exploded(s, d)
    val norms = e.groupBy($"vec_id").agg(xsum($"v" * $"v").as("n2"))
    val ev = e.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("eval_id"), $"pos", $"v".as("evv"))
    val dots = broadcast(ev).join(e.as("c"), Seq("pos"))
      .filter($"c.vec_id" % 97 =!= 0)
      .groupBy($"c.vec_id".as("train_id"), $"eval_id")
      .agg(xsum($"evv" * $"c.v").as("dot"))
    val qs = dots
      .join(broadcast(norms.filter($"vec_id" % 97 === 0)
        .select($"vec_id".as("eval_id"), $"n2".as("en2"))), Seq("eval_id"))
      .withColumn("qcos", $"dot" / sqrt($"en2"))
    qs.groupBy($"train_id")
      .agg(max(struct($"qcos", (-$"eval_id").as("nid"))).as("m"))
      .join(norms.select($"vec_id".as("train_id"), $"n2".as("tn2")), Seq("train_id"))
      .select($"train_id", ($"m.qcos" / sqrt($"tn2")).as("max_cos"),
        (-$"m.nid").as("nearest_eval"))
      .orderBy($"max_cos".desc, $"train_id")
      .limit(20)
  }

  val q152Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY vec_id
      |), dots AS (
      |  SELECT c.vec_id AS train_id, q.vec_id AS eval_id,
      |    CAST(SUM(CAST(FLOOR(q.v * c.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e q JOIN e c ON q.pos = c.pos AND q.vec_id % 97 = 0 AND c.vec_id % 97 <> 0
      |  GROUP BY 1, 2
      |), qs AS (
      |  SELECT d.train_id, d.eval_id, d.dot / SQRT(en.n2) AS qcos
      |  FROM dots d JOIN norms en ON en.vec_id = d.eval_id
      |), am AS (
      |  SELECT train_id, eval_id AS nearest_eval, qcos
      |  FROM qs
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY train_id ORDER BY qcos DESC, eval_id) = 1
      |)
      |SELECT a.train_id, a.qcos / SQRT(tn.n2) AS max_cos,
      |  CAST(a.nearest_eval AS BIGINT) AS nearest_eval
      |FROM am a JOIN norms tn ON tn.vec_id = a.train_id
      |ORDER BY max_cos DESC, a.train_id LIMIT 20""".stripMargin

  /** q162 — grid-density clustering (the DBSCAN/STING family): the
    * density-based member of the clustering surface, next to q55's
    * k-means (which forces every point into a sphere-ish cell and has
    * no noise concept). Points hash to fixed-resolution grid cells on
    * the two leading dimensions (cell = ⌊10·v⌋, one correctly-rounded
    * float→double→×10→floor chain per coordinate, identical IEEE in
    * both engines); a cell is CORE when its occupancy is strictly
    * above the corpus mean (cnt·n_cells > total in DECIMAL(38,0) —
    * a data-derived threshold that stays meaningful at any scale
    * factor, where a fixed minPts degenerates); connected core cells
    * (8-neighborhood) form clusters via the large-star/small-star CC
    * primitive; points in non-core cells are NOISE (cluster −1) —
    * the cell-granular DBSCAN approximation the grid literature uses
    * at scale (point-level ε-neighborhoods are the quadratic stage
    * this blocking exists to avoid).
    *
    * Scale shape: ONE corpus pass builds the cell histogram (map-side
    * partial agg — the exchange carries grid-bounded cells, never
    * points); core selection, adjacency, and CC all run on the
    * grid-bounded cell relation (≤9 edges per core cell via
    * neighbor-key explode + equi semi join — no theta self-join); the
    * label-back is a broadcast map-side join, so the corpus is never
    * shuffled except by the output ORDER BY. Cell-key encoding
    * (cx+512)·1024+(cy+512) is collision-free for |coord| < 512,
    * i.e. any |v| < 51 — embeddings are unit-scale.
    */
  def q162GridDensityClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Malformed-row guard, SYMMETRIC with the oracle (round-10 advice):
    // a row whose embedding has < 2 elements (ANSI element_at would
    // throw) or a null leading element (null grid coords would silently
    // vanish through the inner label-back join while the oracle's LEFT
    // JOIN kept them as noise) is excluded by BOTH engines up front.
    val pts = embeddings(s, d).filter($"vec_id".isNotNull && size($"embedding") >= 2)
      .select($"vec_id",
        floor(element_at($"embedding", 1).cast("double") * 10).cast("long").as("cx"),
        floor(element_at($"embedding", 2).cast("double") * 10).cast("long").as("cy"))
      .filter($"cx".isNotNull && $"cy".isNotNull)
    val cells = pts.groupBy($"cx", $"cy").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // grid-bounded; feeds core, totals, and label-back
    val tot = cells.agg(sum($"cnt").cast("decimal(38,0)").as("total"),
      count(lit(1)).cast("decimal(38,0)").as("ncells"))
    val core = cells.crossJoin(broadcast(tot))
      .filter(expr("cast(cnt as decimal(38,0)) * ncells > total"))
      .select($"cx", $"cy", (($"cx" + 512) * 1024 + $"cy" + 512).as("ck"))
      .localCheckpoint() // both CC input and the cell-label join reuse it
    val nbrs = core.select($"ck", explode(expr(
      """flatten(transform(sequence(-1, 1),
        |  dx -> transform(sequence(-1, 1),
        |    dy -> (cx + dx + 512L) * 1024L + cy + dy + 512L)))""".stripMargin)).as("nk"))
      .filter($"ck" =!= $"nk")
    val edges = nbrs.join(core.select($"ck".as("nk")), Seq("nk"), "left_semi")
    val lbl = ConnectedComponents.labels(s, edges, "ck", "nk")
    val cellLbl = cells
      .join(core, Seq("cx", "cy"), "left")
      .join(lbl.select($"node".as("ck"), $"component"), Seq("ck"), "left")
      .select($"cx", $"cy",
        when($"ck".isNull, lit(-1L))
          .otherwise(coalesce($"component", $"ck")).as("cluster_id"))
    pts.join(broadcast(cellLbl), Seq("cx", "cy"))
      .select($"vec_id", $"cx", $"cy", $"cluster_id")
      .orderBy($"vec_id")
  }

  /** Same grid, core rule, and 8-neighborhood closure; the recursive CTE
    * is q59's transitive-closure idiom on the core-cell adjacency (self
    * edges from the a=b join row make every core cell its own closure
    * seed, so isolated core cells label as singletons — the Spark side's
    * coalesce-to-own-key).
    */
  val q162Sql: String =
    """WITH RECURSIVE pts0 AS (
      |  SELECT vec_id,
      |    CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT) AS cx,
      |    CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 10) AS BIGINT) AS cy
      |  FROM embeddings WHERE vec_id IS NOT NULL AND LEN(embedding) >= 2
      |), pts AS (
      |  SELECT * FROM pts0 WHERE cx IS NOT NULL AND cy IS NOT NULL
      |), cells AS (
      |  SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS cnt FROM pts GROUP BY cx, cy
      |), tot AS (
      |  SELECT CAST(SUM(cnt) AS HUGEINT) AS total,
      |    CAST(COUNT(*) AS HUGEINT) AS ncells FROM cells
      |), core AS (
      |  SELECT cx, cy, (cx + 512) * 1024 + cy + 512 AS ck
      |  FROM cells, tot WHERE CAST(cnt AS HUGEINT) * ncells > total
      |), edges AS (
      |  SELECT a.ck AS u, b.ck AS v FROM core a JOIN core b
      |    ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1
      |), r(u, v) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u
      |), lbl AS (
      |  SELECT u AS ck, MIN(v) AS cluster_id FROM r GROUP BY u
      |)
      |SELECT p.vec_id, p.cx, p.cy,
      |  CAST(CASE WHEN c.ck IS NULL THEN -1
      |            ELSE COALESCE(l.cluster_id, c.ck) END AS BIGINT) AS cluster_id
      |FROM pts p LEFT JOIN core c ON c.cx = p.cx AND c.cy = p.cy
      |LEFT JOIN lbl l ON l.ck = c.ck
      |ORDER BY p.vec_id""".stripMargin

  /** q190 — EMBEDDING drift audit: q96/q97 detect distribution shift in
    * scalars; this is the vector-tier counterpart a training pipeline
    * runs per source/label slice — "has this slice's embedding mass
    * moved away from the corpus?" — as the squared cosine between the
    * slice centroid and the global centroid, in exact integer permille.
    * Squared cosine, not cosine: cos² = (a·b)² / (|a|²·|b|²) needs no
    * square root — the one operation whose last-bit behavior differs
    * across engines — so the whole statistic stays in the xsum
    * discipline: per-dim means are floor-quantized sums, dots/norms are
    * floor-quantized sums of single-op products, and the final permille
    * is one floor over an identically-parenthesized expression.
    *
    * Scale: two (label|pos)-keyed partial-combine aggregates over the
    * exploded corpus (d·|labels| cells), then everything runs on the
    * centroid relation (|labels|·d rows). The global centroid is a
    * d-row broadcast. No pairwise anything — linear in corpus size,
    * constant in label count beyond the cell relation.
    */
  def q190EmbeddingDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = embeddings(s, d)
      .filter($"vec_id".isNotNull && $"label".isNotNull)
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"label", $"pos", $"v".cast("double").as("v"))
      .localCheckpoint() // one explode feeds both centroid aggregates
    val byLabel = cells.groupBy($"label", $"pos")
      .agg((xsum($"v") / count(lit(1))).as("a"), count(lit(1)).as("n"))
    val global = cells.groupBy($"pos")
      .agg((xsum($"v") / count(lit(1))).as("b"))
    byLabel.join(broadcast(global), Seq("pos"))
      .groupBy($"label")
      .agg(xsum($"a" * $"b").as("dot"), xsum($"a" * $"a").as("na"),
        xsum($"b" * $"b").as("nb"), (max($"n")).as("n_vecs"))
      .select($"label", $"n_vecs",
        floor($"dot" * $"dot" * 1000.0 / ($"na" * $"nb")).cast("long")
          .as("cos2_permille"))
      .orderBy($"label")
  }

  val q190Sql: String =
    """WITH cells AS (
      |  SELECT label, pos, CAST(v AS DOUBLE) AS v FROM (
      |    SELECT label, UNNEST(embedding) AS v,
      |           UNNEST(RANGE(0, LEN(embedding))) AS pos
      |    FROM embeddings WHERE vec_id IS NOT NULL AND label IS NOT NULL)
      |), by_label AS (
      |  SELECT label, pos,
      |         CAST(SUM(CAST(FLOOR(v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10
      |           / COUNT(*) AS a,
      |         COUNT(*) AS n
      |  FROM cells GROUP BY 1, 2
      |), gcent AS (
      |  SELECT pos,
      |         CAST(SUM(CAST(FLOOR(v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10
      |           / COUNT(*) AS b
      |  FROM cells GROUP BY 1
      |), agg AS (
      |  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CAST(FLOOR(a * b * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot,
      |    CAST(SUM(CAST(FLOOR(a * a * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS na,
      |    CAST(SUM(CAST(FLOOR(b * b * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS nb
      |  FROM by_label JOIN gcent USING (pos) GROUP BY 1
      |)
      |SELECT label, n_vecs,
      |       CAST(FLOOR(dot * dot * 1000.0 / (na * nb)) AS BIGINT) AS cos2_permille
      |FROM agg ORDER BY label""".stripMargin

  /** q191 — k-center greedy CORESET selection (farthest-point
    * traversal, the 2-approximation of Gonzalez'85; the diversity-
    * driven data-selection family of Sener & Savarese ICLR'18): pick
    * the min-id seed, then 7 rounds of "select the vector farthest
    * from its nearest already-selected center" — the anti-SemDeDup:
    * q88 REMOVES redundancy, this EXTRACTS the most diverse k as a
    * training/eval coreset, and each selection's max-min distance is
    * the coverage-radius curve a data buyer reads. Exactly the q55
    * trajectory discipline: the per-round argmax is a deterministic
    * total order (distance DESC, vec_id), distances are xsum-quantized
    * squared L2 (no square root), and the oracle replays the identical
    * 8-round trajectory as chained CTEs.
    *
    * Scale: k passes, each = one broadcast of ONE center's exploded
    * row against the corpus, a per-vec partial-combine agg, a
    * TakeOrdered(1), and a running elementwise LEAST against the
    * maintained min-distance relation (localCheckpoint'd per round —
    * the q142 iterative-lineage discipline). Driver sees k ids — the
    * CC-fingerprint bounded-collect rule. Linear in corpus per round,
    * k rounds total; at real scale k-center++ sampling replaces the
    * exact argmax, same skeleton.
    */
  def q191KCenterCoreset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val K = 8
    val e = exploded(s, d).filter($"vec_id".isNotNull).localCheckpoint()
    val seed = e.agg(min($"vec_id")).head.getLong(0)
    var selected = Vector((0L, seed, 0.0))
    var minDist: DataFrame = null
    var curId = seed
    for (r <- 1 until K) {
      val c = e.filter($"vec_id" === curId).select($"pos", $"v".as("cv"))
      val dist = e.join(broadcast(c), Seq("pos"))
        .groupBy($"vec_id")
        .agg(xsum(($"v" - $"cv") * ($"v" - $"cv")).as("dd"))
      minDist =
        (if (minDist == null) dist.select($"vec_id", $"dd".as("mind"))
         else minDist.join(dist, Seq("vec_id"))
           .select($"vec_id", least($"mind", $"dd").as("mind")))
          .localCheckpoint()
      val top = minDist.orderBy($"mind".desc, $"vec_id").limit(1).head
      curId = top.getLong(0)
      selected :+= ((r.toLong, curId, top.getDouble(1)))
    }
    selected.toDF("round", "vec_id", "dist_at_selection")
      .orderBy($"round")
  }

  /** The same 8-round trajectory as chained CTEs (one dist/min/select
    * triple per round), generated from the same loop bounds.
    */
  val q191Sql: String = {
    val xd = "CAST(SUM(CAST(FLOOR(((a.v - b.v) * (a.v - b.v)) * 1e10) AS BIGINT)) AS DOUBLE) / 1e10"
    val rounds = (1 until 8).map { r =>
      val src = if (r == 1) "(SELECT id FROM s0)" else s"(SELECT vec_id FROM s${r - 1})"
      val m =
        if (r == 1) s"m1 AS (SELECT vec_id, dd AS mind FROM d1)"
        else s"m$r AS (SELECT m${r - 1}.vec_id, LEAST(m${r - 1}.mind, d$r.dd) AS mind " +
          s"FROM m${r - 1} JOIN d$r USING (vec_id))"
      s"""d$r AS (
         |  SELECT a.vec_id, $xd AS dd
         |  FROM e a JOIN e b ON a.pos = b.pos AND b.vec_id = $src
         |  GROUP BY 1
         |), $m, s$r AS (
         |  SELECT vec_id, mind FROM m$r ORDER BY mind DESC, vec_id LIMIT 1
         |)""".stripMargin
    }.mkString(",\n")
    val sel = (1 until 8)
      .map(r => s"UNION ALL SELECT $r, vec_id, mind FROM s$r").mkString("\n")
    s"""WITH e AS (
       |  SELECT vec_id, pos, CAST(v AS DOUBLE) AS v FROM (
       |    SELECT vec_id, UNNEST(embedding) AS v,
       |           UNNEST(RANGE(0, LEN(embedding))) AS pos
       |    FROM embeddings WHERE vec_id IS NOT NULL)
       |), s0 AS (SELECT MIN(vec_id) AS id FROM e),
       |$rounds
       |SELECT CAST(0 AS BIGINT) AS round, (SELECT id FROM s0) AS vec_id,
       |       0.0 AS dist_at_selection
       |$sel
       |ORDER BY round""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_kcenter_coreset" -> (q191KCenterCoreset _),
    "q190_embedding_drift" -> (q190EmbeddingDrift _),
    "q40_centroids" -> (q40Centroids _),
    "q41_cosine_topk" -> (q41CosineTopk _),
    "q42_nearest_centroid" -> (q42NearestCentroid _),
    "q54_embedding_dedup" -> (q54EmbeddingDedup _),
    "q55_kmeans" -> (q55Kmeans _),
    "q65_quantize" -> (q65Quantize _),
    "q74_pq_adc" -> (q74PqAdc _),
    "q76_ivf_search" -> (q76IvfSearch _),
    "q127_pca_power" -> (q127PcaPower _),
    "q143_matryoshka_audit" -> (q143MatryoshkaAudit _),
    "q152_semantic_decontamination" -> (q152SemanticDecontamination _),
    "q162_grid_density_clusters" -> (q162GridDensityClusters _),
  )

  val oracles: Map[String, String] = Map(
    "q191_kcenter_coreset" -> q191Sql,
    "q190_embedding_drift" -> q190Sql,
    "q40_centroids" -> q40Sql,
    "q41_cosine_topk" -> q41Sql,
    "q42_nearest_centroid" -> q42Sql,
    "q54_embedding_dedup" -> q54Sql,
    "q55_kmeans" -> q55Sql,
    "q65_quantize" -> q65Sql,
    "q74_pq_adc" -> q74Sql,
    "q76_ivf_search" -> q76Sql,
    "q127_pca_power" -> q127Sql,
    "q143_matryoshka_audit" -> q143Sql,
    "q152_semantic_decontamination" -> q152Sql,
    "q162_grid_density_clusters" -> q162Sql,
  )
}
