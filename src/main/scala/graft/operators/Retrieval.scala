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
      row_number().over(BoundedWindow.ordered($"doc_id", $"lex_overlap".desc, $"doc_id")).cast("long"))

    // Norms are aggregated over the exploded relation BEFORE the query-
    // vector join (round-7 verdict item 5, closing the former
    // fixed-width trap): n2 now covers ALL of a vector's positions
    // regardless of the query vector's dimensionality, so a corpus
    // vector longer than the query — or a truncated doc-0 embedding —
    // can no longer silently deflate its norm. On the shipped
    // fixed-width corpus the summed position set is identical either
    // way and xsum is an order-independent integer sum, so the oracle
    // hash is unchanged; RetrievalSpec adds the variable-width case the
    // old shape got wrong. Cost: one extra vec_id-sized aggregate; the
    // dots/norms join is co-partitioned on vec_id (both are groupBy
    // outputs on the same key — no extra exchange).
    val e = VectorOps.exploded(s, d)
    val norms = e.groupBy($"vec_id").agg(VectorOps.xsum($"v" * $"v").as("n2"))
    val qv = e.filter($"vec_id" === 0).select($"pos", $"v".as("qv"))
    val dots = e.join(broadcast(qv), Seq("pos"))
      .groupBy($"vec_id")
      .agg(VectorOps.xsum($"qv" * $"v").as("dot"))
    val both = dots.join(norms, Seq("vec_id"))
    val qn = norms.filter($"vec_id" === 0).select($"n2".as("qn2"))
    val semTop = both.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(qn))
      .select($"vec_id".as("doc_id"),
        ($"dot" / (sqrt($"n2") * sqrt($"qn2"))).as("cos"))
      .orderBy($"cos".desc, $"doc_id").limit(50)
    val semR = semTop.withColumn("sem_rank",
      row_number().over(BoundedWindow.ordered($"doc_id", $"cos".desc, $"doc_id")).cast("long"))

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

  /** q131 — Okapi BM25 ranking [Robertson & Walker, SIGIR'94], the
    * canonical lexical relevance function, in overflow-safe exact
    * integer arithmetic (k1 = 1.2, b = 0.75, query = the corpus's own
    * doc 0 like q114):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avg))
    *
    *  - idf is the full SIGNED BM25 idf, log2-quantized with mantissa
    *    interpolation applied to numerator and denominator separately:
    *    idf_milli = L(2(N−df)+1) − L(2df+1) with
    *    L(x) = 250·(4b + (4x div 2^b) − 4), b = LENGTH(BIN(x))−1 —
    *    ≈ 1000·log2(x) within ~86 milli-bits, exact int64 at any N,
    *    and no engine's libm appears anywhere (Math.log and DuckDB's
    *    ln are each ~1 ulp, NOT guaranteed to agree). Two earlier
    *    quantizations were measured VACUOUS on this corpus and
    *    rejected: whole-bit floor(log2) (q104's) and the clamped
    *    non-negative ratio-floor — the synthetic vocabulary is so
    *    small that every query token has df ≳ N/3, where both collapse
    *    to identically zero; the signed rational form keeps the
    *    stopword-gradient (mildly positive to negative) that actually
    *    ranks such a corpus, exactly as unquantized BM25 would.
    *  - the tf saturation with k1 = 6/5, b = 3/4 clears denominators
    *    exactly: tfpart_milli = 22000·tf div (10·tf + 3 + lennorm)
    *    with lennorm = (9·|d|·N) div T — the one interior div floors
    *    the length-normalization term by < 1, deterministically in
    *    both engines, and keeps every intermediate ≤ ~10¹³ at ANY
    *    corpus size (the naive common-denominator form multiplies by
    *    the corpus token total and overflows int64 past T ≈ 4·10¹¹).
    *
    * Scale shape: q114's discipline — the query-token set broadcasts
    * and semi-filters the corpus token relation map-side BEFORE any
    * exchange; df/tf are partial+final hash aggs over the overlapping
    * instances only; doc lengths are a pure-map second scan; the final
    * top-20 is TakeOrderedAndProject.
    */
  def q131Bm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
    val qtoks = docs.filter($"doc_id" === 0)
      .select(explode(TextOps.tokens($"text")).as("tok")).distinct()
    val lens = docs.filter($"doc_id" =!= 0)
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("len"))
    val tot = lens.agg(count(lit(1)).as("n_docs"), sum($"len").as("t_toks"))
    val inst = docs.filter($"doc_id" =!= 0)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
      .join(broadcast(qtoks), Seq("tok"))
    val tf = inst.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    // L(x) ≈ 1000·log2(x): whole bits from BIN length, fraction from
    // the mantissa's top two bits
    def l2milli(x: String): String =
      s"250 * (4 * (length(bin($x)) - 1) + (4 * $x) div cast(pow(2, length(bin($x)) - 1) as bigint) - 4)"
    val idf = df.crossJoin(broadcast(tot))
      .withColumn("p", expr("2 * (n_docs - df) + 1"))
      .withColumn("q", expr("2 * df + 1"))
      .select($"tok", expr(s"${l2milli("p")} - ${l2milli("q")}").as("idf_milli"))
    tf.join(broadcast(idf), Seq("tok"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(tot))
      .withColumn("term_micro", expr(
        "idf_milli * ((22000 * tf) div (10 * tf + 3 + (9 * len * n_docs) div t_toks))"))
      .groupBy($"doc_id", $"len")
      .agg(sum($"term_micro").as("bm25_micro"), count(lit(1)).as("n_hit_terms"))
      .orderBy($"bm25_micro".desc, $"doc_id")
      .limit(20)
      .select($"doc_id", $"len", $"n_hit_terms", $"bm25_micro")
  }

  val q131Sql: String =
    """WITH qtoks AS (
      |  SELECT DISTINCT UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS tok
      |  FROM documents WHERE doc_id = 0
      |), lens AS (
      |  SELECT doc_id, CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS BIGINT) AS len
      |  FROM documents WHERE doc_id IS NOT NULL AND doc_id <> 0
      |), tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(len) AS BIGINT) AS t_toks FROM lens
      |), inst AS (
      |  SELECT i.doc_id, i.tok FROM (
      |    SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS tok
      |    FROM documents WHERE doc_id IS NOT NULL AND doc_id <> 0) i
      |  JOIN qtoks q ON i.tok = q.tok
      |), tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM inst GROUP BY doc_id, tok
      |), df AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
      |), idf AS (
      |  SELECT tok,
      |    CAST((250 * (4 * (LENGTH(BIN(p)) - 1) + (4 * p) // CAST(POWER(2, LENGTH(BIN(p)) - 1) AS BIGINT) - 4))
      |       - (250 * (4 * (LENGTH(BIN(q)) - 1) + (4 * q) // CAST(POWER(2, LENGTH(BIN(q)) - 1) AS BIGINT) - 4)) AS BIGINT) AS idf_milli
      |  FROM (SELECT tok, 2 * (t.n_docs - df) + 1 AS p, 2 * df + 1 AS q FROM df, tot t)
      |)
      |SELECT doc_id, len, n_hit_terms, bm25_micro FROM (
      |  SELECT tf.doc_id, l.len,
      |    CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
      |    CAST(SUM(i.idf_milli * ((22000 * tf.tf) // (10 * tf.tf + 3 + (9 * l.len * t.n_docs) // t.t_toks))) AS BIGINT) AS bm25_micro
      |  FROM tf
      |  JOIN idf i ON tf.tok = i.tok
      |  JOIN lens l ON tf.doc_id = l.doc_id
      |  CROSS JOIN tot t
      |  GROUP BY tf.doc_id, l.len)
      |ORDER BY bm25_micro DESC, doc_id LIMIT 20""".stripMargin

  /** q144 — RAG context ASSEMBLY under a token budget: the step between
    * retrieval and generation — take q114's fused top-10 and greedily
    * admit documents in RRF-rank order while the running token total
    * stays within the context budget (256 tokens here; the "greedy by
    * rank until full" packing every RAG stack ships). Output keeps the
    * skipped tail too (selected = false) so the cut is visible.
    *
    * Scale shape: the retrieval arms are q114's (broadcast-semi-filter
    * lexical, one-agg semantic, TakeOrderedAndProject limits); the
    * assembly itself runs on the 10-row fused relation — the window is
    * over ten rows, the token-count join probes the corpus relation
    * with a 10-row broadcast.
    */
  def q144ContextAssembly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val budget = 256L
    val top = q114HybridRetrieval(s, d).select($"doc_id", $"rrf")
    val toks = documents(s, d).filter($"doc_id".isNotNull)
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
    broadcast(top).join(toks, Seq("doc_id"))
      .withColumn("rank",
        row_number().over(BoundedWindow.ordered($"doc_id", $"rrf".desc, $"doc_id")).cast("long"))
      .withColumn("cum_tokens",
        sum($"n_tokens").over(BoundedWindow.ordered($"doc_id", $"rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"rank", $"doc_id", $"n_tokens", $"cum_tokens",
        ($"cum_tokens" <= budget).as("selected"))
      .orderBy($"rank")
  }

  /** Oracle: q114's full SQL embedded as a CTE (the q59/q141 nesting
    * trick), token counts joined, greedy running sum over rank.
    */
  val q144Sql: String =
    s"""WITH fused AS (
       |${q114Sql.linesIterator.map("  " + _).mkString("\n")}
       |), toks AS (
       |  SELECT doc_id,
       |    CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents WHERE doc_id IS NOT NULL
       |), ranked AS (
       |  SELECT f.doc_id, t.n_tokens,
       |    CAST(ROW_NUMBER() OVER (ORDER BY f.rrf DESC, f.doc_id) AS BIGINT) AS rank
       |  FROM fused f JOIN toks t USING (doc_id)
       |)
       |SELECT rank, doc_id, n_tokens,
       |  CAST(SUM(n_tokens) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |  SUM(n_tokens) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) <= 256 AS selected
       |FROM ranked ORDER BY rank""".stripMargin

  /** q148 — MMR (Maximal Marginal Relevance, Carbonell & Goldstein '98)
    * diversification rerank: the step between retrieval and context
    * assembly when the top-k is redundant — greedily select K = 5 of
    * the top-20 cosine candidates maximizing
    * λ·rel − (1−λ)·max_{s∈selected} sim(d, s), λ = 0.7. Standard in
    * every RAG stack; a dedup-aware retriever in miniature.
    *
    * Scale shape: the candidate arm is q114's semantic chain
    * (TakeOrderedAndProject top-20, corpus never sorted); candidate
    * pairwise sims are a 20-vector self-join on the broadcast-filtered
    * exploded relation (≤ 20·64 rows); the greedy unroll is FIVE
    * bounded plan steps over checkpointed ≤ 20-row relations — no
    * driver-side collect anywhere. Cosines ride the same
    * floor-fixed-point dot products as q41/q114, so every score is
    * bit-identical cross-engine and the greedy argmax (ties by doc_id)
    * is deterministic.
    */
  def q148MmrRerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lam = 0.7
    val e = VectorOps.exploded(s, d)
    val norms = e.groupBy($"vec_id").agg(VectorOps.xsum($"v" * $"v").as("n2"))
    val qv = e.filter($"vec_id" === 0).select($"pos", $"v".as("qv"))
    val dots = e.join(broadcast(qv), Seq("pos"))
      .groupBy($"vec_id").agg(VectorOps.xsum($"qv" * $"v").as("dot"))
    val qn = norms.filter($"vec_id" === 0).select($"n2".as("qn2"))
    val cand = dots.join(norms, Seq("vec_id")).filter($"vec_id" =!= 0)
      .crossJoin(broadcast(qn))
      .select($"vec_id".as("doc_id"),
        ($"dot" / (sqrt($"n2") * sqrt($"qn2"))).as("rel"))
      .orderBy($"rel".desc, $"doc_id").limit(20)
      .localCheckpoint() // 20 rows
    val ids = cand.select($"doc_id".as("vec_id"))
    val ce = e.join(broadcast(ids), Seq("vec_id"))
    val pd = ce.as("a").join(ce.as("b"),
        $"a.pos" === $"b.pos" && $"a.vec_id" < $"b.vec_id")
      .groupBy($"a.vec_id".as("x"), $"b.vec_id".as("y"))
      .agg(VectorOps.xsum($"a.v" * $"b.v").as("dxy"))
    val sims0 = pd
      .join(norms.select($"vec_id".as("x"), $"n2".as("nx")), Seq("x"))
      .join(norms.select($"vec_id".as("y"), $"n2".as("ny")), Seq("y"))
      .select($"x", $"y", ($"dxy" / (sqrt($"nx") * sqrt($"ny"))).as("sim"))
    val sims = sims0.unionAll(sims0.select($"y".as("x"), $"x".as("y"), $"sim"))
      .localCheckpoint() // ≤ 20·19 rows
    var selected = cand.orderBy($"rel".desc, $"doc_id").limit(1)
      .select($"doc_id", lit(1L).as("mmr_rank"), $"rel",
        lit(0.0).as("max_sim"), (lit(lam) * $"rel").as("score"))
      .localCheckpoint()
    for (k <- 2 to 5) {
      val next = cand
        .join(selected.select($"doc_id"), Seq("doc_id"), "left_anti")
        .join(sims.join(selected.select($"doc_id".as("y")), Seq("y"))
            .groupBy($"x".as("doc_id")).agg(max($"sim").as("max_sim")),
          Seq("doc_id"), "left")
        .withColumn("max_sim", coalesce($"max_sim", lit(0.0)))
        // 0.3 as a LITERAL, not 1 − λ: Scala's `1 - 0.7` is
        // 0.30000000000000004 and the last-bit drift breaks the
        // cell-exact oracle (measured)
        .withColumn("score", lit(lam) * $"rel" - lit(0.3) * $"max_sim")
        .orderBy($"score".desc, $"doc_id").limit(1)
        .select($"doc_id", lit(k.toLong).as("mmr_rank"), $"rel", $"max_sim", $"score")
      selected = selected.unionByName(next).localCheckpoint()
    }
    selected.select($"mmr_rank", $"doc_id", $"rel", $"max_sim", $"score")
      .orderBy($"mmr_rank")
  }

  /** Oracle: the identical unrolled greedy — candidate/pairwise CTEs in
    * the q114 fixed-point dot arithmetic, five selection steps
    * generated mechanically (the bpeStepSql pattern).
    */
  val q148Sql: String = {
    val steps = (2 to 5).map { k =>
      val prevSel = (1 until k).map(i => s"SELECT doc_id FROM s$i").mkString(" UNION ALL ")
      s"""r$k AS (
         |  SELECT c.doc_id, c.rel, COALESCE(MAX(s.sim), 0.0) AS max_sim
         |  FROM cand c LEFT JOIN sims s
         |    ON s.x = c.doc_id AND s.y IN ($prevSel)
         |  WHERE c.doc_id NOT IN ($prevSel)
         |  GROUP BY c.doc_id, c.rel
         |), s$k AS (
         |  SELECT doc_id, CAST($k AS BIGINT) AS mmr_rank, rel, max_sim,
         |    0.7*rel - 0.3*max_sim AS score
         |  FROM r$k ORDER BY score DESC, doc_id LIMIT 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
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
       |), cand AS (
       |  SELECT d.vec_id AS doc_id, d.dot / (SQRT(n.n2) * SQRT(qn.n2)) AS rel
       |  FROM dots d JOIN norms n ON n.vec_id = d.vec_id
       |    JOIN norms qn ON qn.vec_id = 0
       |  ORDER BY rel DESC, doc_id LIMIT 20
       |), pd AS (
       |  SELECT a.vec_id AS x, b.vec_id AS y,
       |    CAST(SUM(CAST(FLOOR(a.v * b.v * 1e10) AS BIGINT)) AS DOUBLE) / 1e10 AS dxy
       |  FROM e a JOIN e b ON a.pos = b.pos AND a.vec_id < b.vec_id
       |  WHERE a.vec_id IN (SELECT doc_id FROM cand)
       |    AND b.vec_id IN (SELECT doc_id FROM cand)
       |  GROUP BY 1, 2
       |), sims0 AS (
       |  SELECT x, y, dxy / (SQRT(nx.n2) * SQRT(ny.n2)) AS sim
       |  FROM pd JOIN norms nx ON nx.vec_id = pd.x JOIN norms ny ON ny.vec_id = pd.y
       |), sims AS (
       |  SELECT x, y, sim FROM sims0 UNION ALL SELECT y AS x, x AS y, sim FROM sims0
       |), s1 AS (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS mmr_rank, rel, 0.0 AS max_sim,
       |    0.7*rel AS score
       |  FROM cand ORDER BY rel DESC, doc_id LIMIT 1
       |), $steps
       |SELECT mmr_rank, doc_id, rel, max_sim, score FROM (
       |  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
       |  UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5)
       |ORDER BY mmr_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_hybrid_retrieval" -> (q114HybridRetrieval _),
    "q131_bm25" -> (q131Bm25 _),
    "q144_context_assembly" -> (q144ContextAssembly _),
    "q148_mmr_rerank" -> (q148MmrRerank _),
  )

  val oracles: Map[String, String] = Map(
    "q114_hybrid_retrieval" -> q114Sql,
    "q131_bm25" -> q131Sql,
    "q144_context_assembly" -> q144Sql,
    "q148_mmr_rerank" -> q148Sql,
  )
}
