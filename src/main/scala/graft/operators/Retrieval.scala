package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Hybrid retrieval flagship — the query a RAG / dataset-search stack
  * runs against a corpus this engine curates: a LEXICAL retriever
  * (distinct-token overlap with the query document, the q111 inverted
  * index's scoring side) and a SEMANTIC retriever (q41's fixed-point
  * exact cosine over the aligned embeddings table) each produce a
  * top-50 list, fused by Reciprocal Rank Fusion
  * [Cormack et al. SIGIR'09]: rrf = 1/(60+r_lex) + 1/(60+r_sem), with
  * unretrieved-list membership penalized at rank 1000. The query is the
  * corpus's own doc 0 (data-derived, parameter-free, like q102's BFS
  * source).
  *
  * Determinism: overlap counts and ranks are integers (rank ties broken
  * by doc id), cosine is the q41 floor-quantized dot/norm chain, and the
  * RRF score is two IEEE divisions and one add of exactly-agreed
  * inputs — hash-identical across engines.
  *
  * Scale shape: the query-token set and query vector BROADCAST; the
  * corpus-side token relation is semi-filtered map-side against the
  * broadcast query-token set BEFORE any exchange, so the lexical arm's
  * shuffles (the (doc_id, tok) distinct and the overlap count) carry
  * only query-overlapping token instances — the full-corpus token
  * relation never shuffles. The embedding relation shuffles once for
  * the dot products; both
  * retrievers end in `orderBy().limit(50)` — TakeOrderedAndProject, no
  * global sort — and everything after (rank windows, full-outer fuse,
  * final top-10) runs on ≤ 50-row relations. RRF over full corpora
  * would need a corpus-wide rank; fusing bounded per-retriever top-k
  * lists is both the standard formulation and the scale-safe one.
  */
object Retrieval {

  def q114HybridRetrieval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
    val qtoks = docs.filter($"doc_id" === 0)
      .select(explode(TextOps.tokens($"text")).as("tok")).distinct()
    // Broadcast-filter BEFORE distinct: the exploded (doc_id, tok)
    // relation joins the broadcast query-token set first — a map-side
    // semi-filter with no exchange — so the (doc_id, tok) distinct that
    // follows shuffles ONLY query-overlapping token instances (bounded
    // by |qtoks| × docs containing them), not the full corpus token
    // relation. distinct-then-join and join-then-distinct agree because
    // qtoks is itself distinct: the inner join never multiplies rows.
    // Pinned in PlanSpec: no exchange in the lexical arm carries `text`
    // or a pre-filter token relation.
    val lexTop = docs.filter($"doc_id" =!= 0)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
      .join(broadcast(qtoks), Seq("tok"))
      .distinct()
      .groupBy($"doc_id").agg(count(lit(1)).as("lex_overlap"))
      .orderBy($"lex_overlap".desc, $"doc_id").limit(50)
    val lexR = lexTop.withColumn("lex_rank",
      row_number().over(Window.orderBy($"lex_overlap".desc, $"doc_id")).cast("long"))

    // dot products AND norms in ONE aggregate pass: the broadcast query
    // vector joins on pos (keeps every row — the query embedding is
    // dense), then a single groupBy(vec_id) computes both fixed-point
    // sums. The previous shape aggregated norms and dots in separate
    // passes over the exploded relation — two scan+explode+shuffle
    // chains where one suffices; values are bit-identical (same xsum
    // over the same products), so the oracle is untouched.
    // FIXED-WIDTH ASSUMPTION: n2 is summed over the positions that
    // survive the inner join with the query vector's pos set, which is
    // bit-identical to a norm over ALL positions only while every
    // embedding shares the query vector's exact dimensionality (the
    // corpus-wide fixed width VectorOps documents). A corpus vector
    // longer than the query — or a truncated doc-0 embedding — would
    // silently deflate n2. RetrievalSpec pins one distinct
    // size(embedding) across the shipped testdata; if variable dims ever
    // become legal, compute n2 from `e` BEFORE this join.
    val e = VectorOps.exploded(s, d)
    val qv = e.filter($"vec_id" === 0).select($"pos", $"v".as("qv"))
    val both = e.join(broadcast(qv), Seq("pos"))
      .groupBy($"vec_id")
      .agg(VectorOps.xsum($"qv" * $"v").as("dot"),
        VectorOps.xsum($"v" * $"v").as("n2"))
    val qn = both.filter($"vec_id" === 0).select($"n2".as("qn2"))
    val semTop = both.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(qn))
      .select($"vec_id".as("doc_id"),
        ($"dot" / (sqrt($"n2") * sqrt($"qn2"))).as("cos"))
      .orderBy($"cos".desc, $"doc_id").limit(50)
    val semR = semTop.withColumn("sem_rank",
      row_number().over(Window.orderBy($"cos".desc, $"doc_id")).cast("long"))

    lexR.join(semR, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        coalesce($"lex_overlap", lit(0L)).as("lex_overlap"),
        $"cos",
        coalesce($"lex_rank", lit(1000L)).as("lex_rank"),
        coalesce($"sem_rank", lit(1000L)).as("sem_rank"))
      .withColumn("rrf",
        lit(1.0) / ($"lex_rank" + 60L) + lit(1.0) / ($"sem_rank" + 60L))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(10)
  }

  val q114Sql: String =
    """WITH qt AS (
      |  SELECT DISTINCT tok FROM (
      |    SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS tok
      |    FROM documents WHERE doc_id = 0)
      |), dt AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS tok
      |    FROM documents WHERE doc_id IS NOT NULL AND doc_id <> 0)
      |), lex AS (
      |  SELECT doc_id, COUNT(*) AS lex_overlap
      |  FROM dt JOIN qt USING (tok) GROUP BY doc_id
      |  ORDER BY lex_overlap DESC, doc_id LIMIT 50
      |), lexr AS (
      |  SELECT doc_id, lex_overlap,
      |    ROW_NUMBER() OVER (ORDER BY lex_overlap DESC, doc_id) AS lex_rank
      |  FROM lex
      |), e AS (
      |  SELECT vec_id, UNNEST(RANGE(0, LEN(embedding))) AS pos,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(SUM(CAST(FLOOR(v * v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS n2
      |  FROM e GROUP BY vec_id
      |), dots AS (
      |  SELECT c.vec_id, CAST(SUM(CAST(FLOOR(q.v * c.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dot
      |  FROM e q JOIN e c ON q.pos = c.pos AND q.vec_id = 0 AND c.vec_id <> 0
      |  GROUP BY c.vec_id
      |), sem AS (
      |  SELECT d.vec_id AS doc_id, d.dot / (SQRT(n.n2) * SQRT(qn.n2)) AS cos
      |  FROM dots d JOIN norms n ON n.vec_id = d.vec_id
      |    JOIN norms qn ON qn.vec_id = 0
      |  ORDER BY cos DESC, doc_id LIMIT 50
      |), semr AS (
      |  SELECT doc_id, cos,
      |    ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
      |  FROM sem
      |)
      |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |  COALESCE(l.lex_overlap, 0) AS lex_overlap,
      |  s.cos AS cos,
      |  CAST(COALESCE(l.lex_rank, 1000) AS BIGINT) AS lex_rank,
      |  CAST(COALESCE(s.sem_rank, 1000) AS BIGINT) AS sem_rank,
      |  CAST(1.0 AS DOUBLE) / (COALESCE(l.lex_rank, 1000) + 60)
      |    + CAST(1.0 AS DOUBLE) / (COALESCE(s.sem_rank, 1000) + 60) AS rrf
      |FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_hybrid_retrieval" -> (q114HybridRetrieval _),
  )

  val oracles: Map[String, String] = Map(
    "q114_hybrid_retrieval" -> q114Sql,
  )
}
