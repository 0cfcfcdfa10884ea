package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Sign-random-projection ANN built from portable arithmetic — the
  * oracle-checkable sibling of [[AnnLsh]] (q43), the same move
  * [[PortableMinHash]] makes for q36: the production tier keeps its
  * engine-tuned codegen'd kernel, and this variant derives the planes
  * from exact integer formulas so DuckDB reproduces the ENTIRE
  * bucket-then-rerank pipeline bit-for-bit.
  *
  * Planes: p[j][i] = ((j·64+i)·2654435761 mod 1000003)/1000003 − 0.5 —
  * an exact-integer construction whose one double division is a single
  * correctly-rounded IEEE op, identical in any engine. Projections are
  * fixed-point: dot_j = Σ_i floor(p·v·1e10) summed as int64 (terms
  * ≤ 5·10⁹, 64 of them — no overflow), so the SIGN of each projection
  * is exact: no float-boundary flakiness in bucket assignment. The
  * 8-bit bucket (256 cells — sized so sf-scale corpora keep
  * multi-member buckets) is Σ 2^j·[dot_j ≥ 0].
  *
  * Scale shape: planes are 512 literal rows — always broadcast; the
  * projection pass is one corpus scan + one aggregation; candidates
  * are same-bucket only (never all-pairs); the exact cosine re-rank
  * touches |Q|·|bucket| pairs with the query side broadcast (q41's
  * no-pos-shuffle discipline).
  */
object PortableAnn {

  def q80AnnPortable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"pos", $"v".cast("double").as("v"))
    // 8 planes × 64 dims from the integer formula; tiny → broadcast
    val planes = s.range(8L * 64L).toDF("id")
      .select(expr("id div 64").as("j"), ($"id" % 64).cast("int").as("pos"),
        ((($"id" * 2654435761L) % 1000003L).cast("double") / 1000003.0 - 0.5).as("p"))
    val dots = e.join(broadcast(planes), Seq("pos"))
      .groupBy($"vec_id", $"j")
      .agg(sum(floor($"p" * $"v" * 1e10).cast("long")).as("dj"))
    val buckets = dots.groupBy($"vec_id")
      .agg(sum(when($"dj" >= 0, pow(lit(2.0), $"j").cast("long")).otherwise(0L))
        .as("bucket"))
    val qb = buckets.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"bucket")
    val cand = broadcast(qb).join(buckets, Seq("bucket"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("cid"), $"bucket")
    // exact cosine re-rank inside the bucket; query side broadcast so
    // the corpus side never shuffles on the 64-value pos key
    val norms = e.groupBy($"vec_id")
      .agg((sum(floor($"v" * $"v" * 1e10).cast("long")).cast("double") / 1e10).as("n2"))
    // qpos rename gives the probe join distinct exprIds on both sides
    // (qe and e trace to the same exploded relation — a bare self-join
    // on `pos` would be ambiguous)
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"pos".as("qpos"), $"v".as("qv"))
    val cdots = broadcast(cand)
      .join(broadcast(qe), Seq("qid"))
      .join(e, $"cid" === $"vec_id" && $"qpos" === $"pos")
      .groupBy($"qid", $"cid", $"bucket")
      .agg((sum(floor($"qv" * $"v" * 1e10).cast("long")).cast("double") / 1e10).as("dot"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
    cdots
      .join(broadcast(norms.select($"vec_id".as("qid"), $"n2".as("qn2"))), Seq("qid"))
      .join(broadcast(norms.select($"vec_id".as("cid"), $"n2".as("cn2"))), Seq("cid"))
      .withColumn("cos", $"dot" / (sqrt($"qn2") * sqrt($"cn2")))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"qid", $"rk".cast("long").as("rk"), $"cid", $"bucket", $"cos")
      .orderBy($"qid", $"rk")
  }

  val q80Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), planes AS (
      |  SELECT id // 64 AS j, id % 64 AS pos,
      |    CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS p
      |  FROM (SELECT UNNEST(RANGE(512)) AS id)
      |), dots AS (
      |  SELECT e.vec_id, pl.j, SUM(CAST(FLOOR(pl.p * e.v * 1e10) AS BIGINT)) AS dj
      |  FROM e JOIN planes pl ON e.pos = pl.pos
      |  GROUP BY 1, 2
      |), buckets AS (
      |  SELECT vec_id,
      |    -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back for schema parity
      |    CAST(SUM(CASE WHEN dj >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY 1
      |), qb AS (
      |  SELECT vec_id AS qid, bucket FROM buckets WHERE vec_id < 5
      |), cand AS (
      |  SELECT q.qid, b.vec_id AS cid, q.bucket
      |  FROM qb q JOIN buckets b ON q.bucket = b.bucket AND b.vec_id <> q.qid
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY 1
      |), cdots AS (
      |  SELECT c.qid, c.cid, c.bucket,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM cand c
      |  JOIN e a ON a.vec_id = c.qid
      |  JOIN e b ON b.vec_id = c.cid AND b.pos = a.pos
      |  GROUP BY 1, 2, 3
      |)
      |SELECT qid, rk, cid, bucket, cos FROM (
      |  SELECT d.qid, d.cid, d.bucket,
      |    d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY d.qid
      |                       ORDER BY d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) DESC, d.cid) AS rk
      |  FROM cdots d
      |  JOIN norms qn ON d.qid = qn.vec_id
      |  JOIN norms cn ON d.cid = cn.vec_id)
      |WHERE rk <= 3
      |ORDER BY qid, rk""".stripMargin

  /** q121 — the k-nearest-neighbor GRAPH over the embedding corpus
    * (every vector is a query), the neighbor structure behind
    * SemDeDup-style semantic curation and density/novelty scoring.
    * Same portable SRP arithmetic as q80, but restructured for the
    * all-queries case where nothing is broadcastable:
    *
    *  - Bucket assignment is a PURE MAP: each row's 8 fixed-point
    *    projections are codegen'd [[graft.functions.FxpDot]] calls
    *    against the plane formula materialized as 8 float literal
    *    arrays — no pos-explode, no planes join, no aggregation
    *    shuffle (q80's explode+join shape costs two shuffles per
    *    corpus; this costs zero). The squared norm rides along in the
    *    same projection.
    *  - Candidates are same-bucket only, with a DETERMINISTIC per-
    *    bucket cap (row_number by vec_id ≤ 64) shared with the oracle
    *    — the cap bounds the quadratic pair stage to C(64,2) per
    *    bucket no matter how degenerate a bucket gets; at corpus
    *    scale you raise the plane count, not the cap.
    *  - Pair scoring is one `zip_with` dot per candidate pair in the
    *    join's projection — fixed-point floor sums, so cosine is
    *    bit-identical in DuckDB — and the top-3 per node is a window
    *    over ≤ 63 in-bucket candidates, never the corpus.
    */
  /** The shared scored-candidate-pair pipeline under q121 and q126:
    * (qid, cid, bucket, cos, qlabel, clabel) for every in-bucket pair
    * after the deterministic cap.
    *
    * The q80 plane formula is rounded to FLOAT so every projection runs
    * through the codegen'd [[graft.functions.FxpDot]] kernel (an
    * interpreted aggregate(zip_with(...)) form of the same math
    * measured 4.1 s for the bucket map at sf0.1 — higher-order
    * lambdas don't codegen; fxp_dot is one fused loop). The float
    * round is a correctly-rounded IEEE op the oracle replays with
    * CAST(... AS REAL), so buckets stay bit-identical.
    */
  private def scoredBucketPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s) // fxp_dot
    val planes: Seq[Seq[Float]] = (0 until 8).map { j =>
      (0 until 64).map { i =>
        ((((j * 64 + i).toLong * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5).toFloat
      }
    }
    val djCols = planes.zipWithIndex.map { case (p, j) =>
      call_function("fxp_dot", $"embedding", typedLit(p)).as(s"dj$j")
    }
    val withB = embeddings(s, d)
      .select($"vec_id" +: $"label" +: $"embedding" +: djCols: _*)
      .withColumn("bucket",
        (0 until 8).map(j => when(col(s"dj$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _))
      .withColumn("n2",
        call_function("fxp_dot", $"embedding", $"embedding").cast("double") / 1e10)
      .select($"vec_id", $"label", $"embedding", $"bucket", $"n2")
    val capped = withB
      .withColumn("mrk", row_number().over(
        Window.partitionBy($"bucket").orderBy($"vec_id")))
      .filter($"mrk" <= 64)
    val a = capped.select($"bucket", $"vec_id".as("qid"), $"label".as("qlabel"),
      $"embedding".as("ea"), $"n2".as("qn2"))
    val b = capped.select($"bucket".as("bucket_b"), $"vec_id".as("cid"),
      $"label".as("clabel"), $"embedding".as("eb"), $"n2".as("cn2"))
    a.join(b, $"bucket" === $"bucket_b" && $"qid" =!= $"cid")
      .withColumn("dot",
        call_function("fxp_dot", $"ea", $"eb").cast("double") / 1e10)
      .withColumn("cos", $"dot" / (sqrt($"qn2") * sqrt($"cn2")))
      .select($"qid", $"cid", $"bucket", $"cos", $"qlabel", $"clabel")
  }

  def q121KnnGraph(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
    scoredBucketPairs(s, d)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"qid", $"rk".cast("long").as("rk"), $"cid", $"bucket", $"cos")
      .orderBy($"qid", $"rk")
  }

  /** q126 — contrastive training-pair mining over the same bucketed
    * candidate pipeline: for every vector, the nearest SAME-label
    * neighbor (the positive) and the nearest DIFFERENT-label neighbor
    * (the hard negative — the highest-cosine impostor, exactly what
    * contrastive/triplet training wants mined). Vectors lacking either
    * inside their bucket are absent — at corpus scale you widen probes,
    * not the cap. Output also carries the margin (pos_cos − neg_cos);
    * negative margins flag label noise or embedding-collapse regions.
    */
  def q126HardNegatives(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = scoredBucketPairs(s, d)
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
    val pos = pairs.filter($"qlabel" === $"clabel")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"qid", $"qlabel".as("label"),
        $"cid".as("pos_id"), $"cos".as("pos_cos"))
    val neg = pairs.filter($"qlabel" =!= $"clabel")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"qid", $"cid".as("neg_id"), $"cos".as("neg_cos"))
    pos.join(neg, Seq("qid"))
      .withColumn("margin", $"pos_cos" - $"neg_cos")
      .select($"qid", $"label".cast("long").as("label"),
        $"pos_id", $"pos_cos", $"neg_id", $"neg_cos", $"margin")
      .orderBy($"qid")
  }

  val q121Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), planes AS (
      |  -- q80's plane formula ROUNDED TO REAL: the Spark side feeds the
      |  -- planes to the float-typed fxp_dot kernel, and the single
      |  -- correctly-rounded float cast is identical in both engines
      |  SELECT id // 64 AS j, id % 64 AS pos,
      |    CAST(CAST(CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS REAL) AS DOUBLE) AS p
      |  FROM (SELECT UNNEST(RANGE(512)) AS id)
      |), dots AS (
      |  SELECT e.vec_id, pl.j, SUM(CAST(FLOOR(e.v * pl.p * 1e10) AS BIGINT)) AS dj
      |  FROM e JOIN planes pl ON e.pos = pl.pos
      |  GROUP BY 1, 2
      |), buckets AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN dj >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY 1
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY 1
      |), capped AS (
      |  SELECT vec_id, bucket FROM buckets
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) <= 64
      |), cdots AS (
      |  SELECT ca.vec_id AS qid, cb.vec_id AS cid, ca.bucket,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM capped ca
      |  JOIN capped cb ON ca.bucket = cb.bucket AND ca.vec_id <> cb.vec_id
      |  JOIN e a ON a.vec_id = ca.vec_id
      |  JOIN e b ON b.vec_id = cb.vec_id AND b.pos = a.pos
      |  GROUP BY 1, 2, 3
      |)
      |SELECT qid, rk, cid, bucket, cos FROM (
      |  SELECT d.qid, d.cid, d.bucket,
      |    d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY d.qid
      |                       ORDER BY d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) DESC, d.cid) AS rk
      |  FROM cdots d
      |  JOIN norms qn ON d.qid = qn.vec_id
      |  JOIN norms cn ON d.cid = cn.vec_id)
      |WHERE rk <= 3
      |ORDER BY qid, rk""".stripMargin

  val q126Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), labels AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
      |), planes AS (
      |  SELECT id // 64 AS j, id % 64 AS pos,
      |    CAST(CAST(CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS REAL) AS DOUBLE) AS p
      |  FROM (SELECT UNNEST(RANGE(512)) AS id)
      |), dots AS (
      |  SELECT e.vec_id, pl.j, SUM(CAST(FLOOR(e.v * pl.p * 1e10) AS BIGINT)) AS dj
      |  FROM e JOIN planes pl ON e.pos = pl.pos
      |  GROUP BY 1, 2
      |), buckets AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN dj >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY 1
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY 1
      |), capped AS (
      |  SELECT vec_id, bucket FROM buckets
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) <= 64
      |), cdots AS (
      |  SELECT ca.vec_id AS qid, cb.vec_id AS cid,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM capped ca
      |  JOIN capped cb ON ca.bucket = cb.bucket AND ca.vec_id <> cb.vec_id
      |  JOIN e a ON a.vec_id = ca.vec_id
      |  JOIN e b ON b.vec_id = cb.vec_id AND b.pos = a.pos
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT d.qid, d.cid,
      |    lq.label AS qlabel, lc.label AS clabel,
      |    d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) AS cos
      |  FROM cdots d
      |  JOIN norms qn ON d.qid = qn.vec_id
      |  JOIN norms cn ON d.cid = cn.vec_id
      |  JOIN labels lq ON d.qid = lq.vec_id
      |  JOIN labels lc ON d.cid = lc.vec_id
      |), pos AS (
      |  SELECT qid, qlabel AS label, cid AS pos_id, cos AS pos_cos FROM scored
      |  WHERE qlabel = clabel
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) = 1
      |), neg AS (
      |  SELECT qid, cid AS neg_id, cos AS neg_cos FROM scored
      |  WHERE qlabel <> clabel
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) = 1
      |)
      |SELECT p.qid, p.label, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
      |  p.pos_cos - n.neg_cos AS margin
      |FROM pos p JOIN neg n USING (qid)
      |ORDER BY p.qid""".stripMargin

  /** q132 — label propagation over the q121 kNN graph [Zhu & Ghahramani
    * 2002; the weak-supervision move curation stacks run on neighbor
    * graphs]: two synchronous rounds of neighbor majority vote
    * (deterministic mode — count desc, label asc), nodes outside the
    * graph keep their label, and the output reports each node's initial
    * vs propagated label with a changed flag — the label-noise /
    * cluster-impurity signal (a node outvoted by its own neighborhood).
    *
    * Scale shape: the kNN edge list materializes ONCE
    * (localCheckpoint — 3N (long,long) pairs, the same
    * graph-materialization call GraphX makes; both rounds and the
    * final join read it), each round is one shuffle join on the
    * neighbor id plus two partial+final aggregates, and the
    * deterministic mode is max(struct(count, −label)) — no windows
    * over node neighborhoods.
    */
  def q132LabelProp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = q121KnnGraph(s, d).select($"qid", $"cid").localCheckpoint()
    val l0 = embeddings(s, d).select($"vec_id", $"label".cast("long").as("lab"))
    def step(lab: DataFrame): DataFrame = {
      val mode = edges
        .join(lab.select($"vec_id".as("cid"), $"lab".as("nlab")), Seq("cid"))
        .groupBy($"qid", $"nlab").agg(count(lit(1)).as("c"))
        .groupBy($"qid")
        .agg(max(struct($"c", (-$"nlab").as("negl"))).as("m"))
        .select($"qid".as("vec_id"), (-$"m.negl").as("voted"))
      lab.join(mode, Seq("vec_id"), "left")
        .select($"vec_id", coalesce($"voted", $"lab").as("lab"))
    }
    val l2 = step(step(l0))
    l0.select($"vec_id", $"lab".as("label0"))
      .join(l2.select($"vec_id", $"lab".as("label2")), Seq("vec_id"))
      .withColumn("changed", $"label0" =!= $"label2")
      .orderBy($"vec_id")
  }

  val q132Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), planes AS (
      |  SELECT id // 64 AS j, id % 64 AS pos,
      |    CAST(CAST(CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS REAL) AS DOUBLE) AS p
      |  FROM (SELECT UNNEST(RANGE(512)) AS id)
      |), dots AS (
      |  SELECT e.vec_id, pl.j, SUM(CAST(FLOOR(e.v * pl.p * 1e10) AS BIGINT)) AS dj
      |  FROM e JOIN planes pl ON e.pos = pl.pos
      |  GROUP BY 1, 2
      |), buckets AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN dj >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY 1
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY 1
      |), capped AS (
      |  SELECT vec_id, bucket FROM buckets
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) <= 64
      |), cdots AS (
      |  SELECT ca.vec_id AS qid, cb.vec_id AS cid,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM capped ca
      |  JOIN capped cb ON ca.bucket = cb.bucket AND ca.vec_id <> cb.vec_id
      |  JOIN e a ON a.vec_id = ca.vec_id
      |  JOIN e b ON b.vec_id = cb.vec_id AND b.pos = a.pos
      |  GROUP BY 1, 2
      |), knn AS (
      |  SELECT qid, cid FROM (
      |    SELECT d.qid, d.cid,
      |      ROW_NUMBER() OVER (PARTITION BY d.qid
      |        ORDER BY d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) DESC, d.cid) AS rk
      |    FROM cdots d
      |    JOIN norms qn ON d.qid = qn.vec_id
      |    JOIN norms cn ON d.cid = cn.vec_id)
      |  WHERE rk <= 3
      |), l0 AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS lab FROM embeddings
      |), m1 AS (
      |  SELECT qid, nlab FROM (
      |    SELECT k.qid, l.lab AS nlab, COUNT(*) AS c,
      |      ROW_NUMBER() OVER (PARTITION BY k.qid ORDER BY COUNT(*) DESC, l.lab) AS r
      |    FROM knn k JOIN l0 l ON k.cid = l.vec_id
      |    GROUP BY k.qid, l.lab)
      |  WHERE r = 1
      |), l1 AS (
      |  SELECT l0.vec_id, COALESCE(m1.nlab, l0.lab) AS lab
      |  FROM l0 LEFT JOIN m1 ON l0.vec_id = m1.qid
      |), m2 AS (
      |  SELECT qid, nlab FROM (
      |    SELECT k.qid, l.lab AS nlab, COUNT(*) AS c,
      |      ROW_NUMBER() OVER (PARTITION BY k.qid ORDER BY COUNT(*) DESC, l.lab) AS r
      |    FROM knn k JOIN l1 l ON k.cid = l.vec_id
      |    GROUP BY k.qid, l.lab)
      |  WHERE r = 1
      |), l2 AS (
      |  SELECT l1.vec_id, COALESCE(m2.nlab, l1.lab) AS lab
      |  FROM l1 LEFT JOIN m2 ON l1.vec_id = m2.qid
      |)
      |SELECT l0.vec_id, l0.lab AS label0, l2.lab AS label2,
      |  l0.lab <> l2.lab AS changed
      |FROM l0 JOIN l2 USING (vec_id) ORDER BY l0.vec_id""".stripMargin

  /** q163 — ANN index-quality audit: recall@10 and MRR of the SRP
    * bucket index against exact brute-force ground truth, per eval
    * query (vec_id % 97 — the q152 eval-set convention). q143 answers
    * "can retrieval run on truncated vectors?"; this answers the
    * sibling serving decision "can retrieval run on the LSH index?" —
    * measured, not assumed. Per eval: the in-bucket candidate count,
    * the overlap between the index's top-10 and the exact top-10, and
    * mrr_milli = ⌊1000/rank⌋ of the exact top-1 inside the index's
    * list (0 when the index misses it entirely). A production
    * pipeline runs exactly this gate before swapping brute force for
    * the index; the output is all-integer, so the hash check is
    * arithmetic-free.
    *
    * Scale shape: the eval side is benchmark-sized and BROADCASTS into
    * the brute arm (one corpus pass scoring |evals| codegen'd fxp_dot
    * products per row — the audit's inherent baseline cost; at 100 TB
    * you run it on a corpus sample, the operator shape is unchanged).
    * The index arm reuses q121's pure-map bucket pipeline (zero
    * shuffles to bucket, per-bucket candidate cap bounds the pair
    * stage). Everything after candidate scoring runs on |evals|·O(k)
    * relations. Both arms share one fixed-point cosine chain, so
    * cross-arm rank comparisons are exact.
    */
  def q163AnnRecallAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s) // fxp_dot
    val evalsBase = embeddings(s, d).filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
      .withColumn("qn2", call_function("fxp_dot", $"qe", $"qe").cast("double") / 1e10)
    val corpus = embeddings(s, d).filter($"vec_id" % 97 =!= 0)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
      .withColumn("cn2", call_function("fxp_dot", $"ce", $"ce").cast("double") / 1e10)
    val exact = corpus.crossJoin(broadcast(evalsBase))
      .withColumn("cos",
        (call_function("fxp_dot", $"qe", $"ce").cast("double") / 1e10)
          / (sqrt($"qn2") * sqrt($"cn2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")))
      .filter($"rk" <= 10)
      .select($"qid", $"cid", $"rk")
      .localCheckpoint() // |evals|·10 rows; feeds overlap + MRR branches
    val annPairs = scoredBucketPairs(s, d)
      .filter($"qid" % 97 === 0 && $"cid" % 97 =!= 0)
      .select($"qid", $"cid", $"cos")
      .localCheckpoint() // bucket-capped; feeds count + top-10 branches
    val nCand = annPairs.groupBy($"qid").agg(count(lit(1)).as("n_cand"))
    val annTop = annPairs
      .withColumn("ark", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")))
      .filter($"ark" <= 10)
      .select($"qid", $"cid", $"ark")
    val overlap = exact.join(annTop, Seq("qid", "cid"))
      .groupBy($"qid").agg(count(lit(1)).as("overlap_at_10"))
    val mrr = exact.filter($"rk" === 1)
      .join(annTop, Seq("qid", "cid"), "left")
      .select($"qid", coalesce(expr("1000 div ark"), lit(0L)).as("mrr_milli"))
    evalsBase.select($"qid".as("eval_id"))
      .join(nCand.withColumnRenamed("qid", "eval_id"), Seq("eval_id"), "left")
      .join(overlap.withColumnRenamed("qid", "eval_id"), Seq("eval_id"), "left")
      .join(mrr.withColumnRenamed("qid", "eval_id"), Seq("eval_id"), "left")
      .select($"eval_id",
        coalesce($"n_cand", lit(0L)).as("n_cand"),
        coalesce($"overlap_at_10", lit(0L)).as("overlap_at_10"),
        coalesce($"mrr_milli", lit(0L)).as("mrr_milli"))
      .orderBy($"eval_id")
  }

  /** q121's bucket/cap CTEs + a brute-force arm; both arms share the
    * fixed-point cosine chain, so ranks agree with the Spark side
    * bit-for-bit.
    */
  val q163Sql: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), planes AS (
      |  SELECT id // 64 AS j, id % 64 AS pos,
      |    CAST(CAST(CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS REAL) AS DOUBLE) AS p
      |  FROM (SELECT UNNEST(RANGE(512)) AS id)
      |), dots AS (
      |  SELECT e.vec_id, pl.j, SUM(CAST(FLOOR(e.v * pl.p * 1e10) AS BIGINT)) AS dj
      |  FROM e JOIN planes pl ON e.pos = pl.pos
      |  GROUP BY 1, 2
      |), buckets AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN dj >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY 1
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY 1
      |), capped AS (
      |  SELECT vec_id, bucket FROM buckets
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) <= 64
      |), xdots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS cid,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e a JOIN e b ON b.pos = a.pos
      |  WHERE a.vec_id % 97 = 0 AND b.vec_id % 97 <> 0
      |  GROUP BY 1, 2
      |), exact AS (
      |  SELECT d.qid, d.cid,
      |    ROW_NUMBER() OVER (PARTITION BY d.qid
      |      ORDER BY d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) DESC, d.cid) AS rk
      |  FROM xdots d
      |  JOIN norms qn ON d.qid = qn.vec_id
      |  JOIN norms cn ON d.cid = cn.vec_id
      |  QUALIFY rk <= 10
      |), apairs AS (
      |  SELECT ca.vec_id AS qid, cb.vec_id AS cid,
      |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM capped ca
      |  JOIN capped cb ON ca.bucket = cb.bucket AND ca.vec_id <> cb.vec_id
      |  JOIN e a ON a.vec_id = ca.vec_id
      |  JOIN e b ON b.vec_id = cb.vec_id AND b.pos = a.pos
      |  WHERE ca.vec_id % 97 = 0 AND cb.vec_id % 97 <> 0
      |  GROUP BY 1, 2
      |), ncand AS (
      |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand FROM apairs GROUP BY 1
      |), anntop AS (
      |  SELECT d.qid, d.cid,
      |    ROW_NUMBER() OVER (PARTITION BY d.qid
      |      ORDER BY d.dot / (SQRT(qn.n2) * SQRT(cn.n2)) DESC, d.cid) AS ark
      |  FROM apairs d
      |  JOIN norms qn ON d.qid = qn.vec_id
      |  JOIN norms cn ON d.cid = cn.vec_id
      |  QUALIFY ark <= 10
      |), ov AS (
      |  SELECT x.qid, CAST(COUNT(*) AS BIGINT) AS overlap_at_10
      |  FROM exact x JOIN anntop a ON a.qid = x.qid AND a.cid = x.cid
      |  GROUP BY 1
      |), mr AS (
      |  SELECT x.qid, CAST(COALESCE(1000 // a.ark, 0) AS BIGINT) AS mrr_milli
      |  FROM exact x LEFT JOIN anntop a ON a.qid = x.qid AND a.cid = x.cid
      |  WHERE x.rk = 1
      |)
      |SELECT ev.vec_id AS eval_id,
      |  CAST(COALESCE(n.n_cand, 0) AS BIGINT) AS n_cand,
      |  CAST(COALESCE(o.overlap_at_10, 0) AS BIGINT) AS overlap_at_10,
      |  CAST(COALESCE(m.mrr_milli, 0) AS BIGINT) AS mrr_milli
      |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 97 = 0) ev
      |LEFT JOIN ncand n ON n.qid = ev.vec_id
      |LEFT JOIN ov o ON o.qid = ev.vec_id
      |LEFT JOIN mr m ON m.qid = ev.vec_id
      |ORDER BY eval_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_ann_portable" -> (q80AnnPortable _),
    "q121_knn_graph" -> (q121KnnGraph _),
    "q126_hard_negatives" -> (q126HardNegatives _),
    "q132_label_prop" -> (q132LabelProp _),
    "q163_ann_recall_audit" -> (q163AnnRecallAudit _),
  )

  val oracles: Map[String, String] = Map(
    "q80_ann_portable" -> q80Sql,
    "q121_knn_graph" -> q121Sql,
    "q126_hard_negatives" -> q126Sql,
    "q132_label_prop" -> q132Sql,
    "q163_ann_recall_audit" -> q163Sql,
  )
}
