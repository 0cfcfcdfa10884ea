package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Fuzzy-matching joins beyond set-Jaccard: edit-distance similarity
  * (token-variant mining for corpus normalization) and asymmetric
  * CONTAINMENT (quote/inclusion detection) — the two dedup-adjacent
  * similarity semantics the Jaccard family can't express. Jaccard is
  * symmetric and set-shaped; a 100-shingle doc pasted inside a
  * 10 000-shingle doc scores J ≈ 0.01 (invisible to q34–q37/q134) while
  * its CONTAINMENT is 1.0, and "colour"/"color" are different tokens to
  * every shingle scheme while their edit distance is 1.
  */
object Fuzzy {

  /** q156 — edit-distance token-variant mining: all pairs of vocabulary
    * tokens (length ≥ 3) within Levenshtein distance 2, with corpus
    * frequencies — the normalization worklist behind spelling-variant /
    * typo collapse in corpus curation (a high-frequency token with a
    * low-frequency lev-1 neighbor is a typo candidate; two
    * high-frequency neighbors are variants to map, cf. "colour" vs
    * "color").
    *
    * Candidate generation is the SymSpell deletion-neighborhood scheme,
    * recall-EXACT for the lev ≤ 2 band: if lev(a,b) = d then
    * LCS(a,b) ≥ max(|a|,|b|) − d, so deleting ≤ d characters from each
    * side reaches a common string — two tokens within distance 2 always
    * share a member of their ≤2-deletion neighborhoods (each token's
    * neighborhood includes itself). Blocking on the deletion variant
    * then verifying with exact `levenshtein` loses nothing, and the
    * neighborhood is built from codegen'd builtins (transform/
    * substring/flatten), no UDF.
    *
    * Scale shape: the corpus contributes ONE token-count aggregate
    * (map-side partial, vocab-bounded output); everything after runs on
    * the vocabulary relation — for natural language that is bounded
    * (~10⁷ types) regardless of corpus bytes, the same posture as
    * q124's BPE training. The variant self-join shuffles ≤ (2 + |t| +
    * |t|²/2) keys per type; variant buckets only collect tokens that
    * are genuinely lev-close, so no df cap is needed.
    */
  def q156TokenVariants(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = documents(s, d)
      .filter($"text".isNotNull)
      .select(explode(TextOps.tokens($"text")).as("token"))
      .filter($"token" =!= "" && length($"token") >= 3)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      // vocab-bounded; feeds both sides of the variant self-join
      .localCheckpoint()
    // ≤2-deletion neighborhood, token itself included. sequence(1, n)
    // needs n ≥ 1 — guaranteed: tokens are ≥ 3 chars, one-deletion
    // variants ≥ 2.
    val dels = vocab.select($"token", $"cnt",
      explode(array_distinct(expr(
        """concat(
          |  array(token),
          |  transform(sequence(1, length(token)),
          |    i -> concat(substring(token, 1, i-1), substring(token, i+1, length(token)))),
          |  flatten(transform(
          |    transform(sequence(1, length(token)),
          |      i -> concat(substring(token, 1, i-1), substring(token, i+1, length(token)))),
          |    v -> transform(sequence(1, length(v)),
          |      j -> concat(substring(v, 1, j-1), substring(v, j+1, length(v)))))))""".stripMargin)))
        .as("dk"))
    dels.select($"dk", $"token".as("token_a"), $"cnt".as("cnt_a"))
      .join(dels.select($"dk", $"token".as("token_b"), $"cnt".as("cnt_b")), Seq("dk"))
      .filter($"token_a" < $"token_b")
      .select($"token_a", $"token_b", $"cnt_a", $"cnt_b")
      .distinct()
      .withColumn("dist", levenshtein($"token_a", $"token_b").cast("long"))
      .filter($"dist" <= 2)
      .select($"token_a", $"token_b", $"dist", $"cnt_a", $"cnt_b")
      .orderBy($"token_a", $"token_b")
  }

  /** Brute-force vocabulary self-join — the oracle may be quadratic in
    * the vocabulary (it checks answers at verification scale); equality
    * against the deletion-blocked plan is the SymSpell recall theorem
    * checked cell-exact.
    */
  val q156Sql: String =
    """WITH tok AS (
      |  SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS token
      |  FROM documents WHERE text IS NOT NULL
      |), v AS (
      |  SELECT token, COUNT(*) AS cnt FROM tok
      |  WHERE token <> '' AND LEN(token) >= 3 GROUP BY token
      |)
      |SELECT a.token AS token_a, b.token AS token_b,
      |  CAST(LEVENSHTEIN(a.token, b.token) AS BIGINT) AS dist,
      |  CAST(a.cnt AS BIGINT) AS cnt_a, CAST(b.cnt AS BIGINT) AS cnt_b
      |FROM v a JOIN v b ON a.token < b.token
      |WHERE LEVENSHTEIN(a.token, b.token) <= 2
      |ORDER BY token_a, token_b""".stripMargin

  /** q157 — asymmetric containment join: directed pairs where ≥ 80 % of
    * the contained doc's 3-shingles appear in the container
    * (C(A→B) = |S_A ∩ S_B| / |S_A|, |S_A| ≥ 5) — the quote/inclusion
    * detector. A short doc pasted verbatim into a long one is exactly
    * the dup mass RefinedWeb-style pipelines dedup by SUBSTRING, not by
    * symmetric Jaccard, and it is invisible to q34/q134 (J ≈ |A|/|B|).
    *
    * Blocking: shared-shingle buckets with a DETERMINISTIC df ≤ 50
    * filter (shingles more frequent than that are boilerplate and
    * excluded from blocking — the q35/q56 bounded-recall discipline,
    * mirrored cell-exactly in the oracle, unlike a keep-first cap whose
    * surviving membership is partition-order-dependent). Verification
    * is the codegen'd `sorted_intersect_count` merge-walk over the FULL
    * sorted hash sets, so reported containment is exact even though
    * candidate recall is df-bounded. Integer containment_milli
    * (`div` ≡ DuckDB `//`) keeps the threshold engine-exact.
    *
    * Scale shape: only (doc_id, shingle-hash) pairs shuffle for
    * blocking (text never leaves the scan); bucket fan-out is capped by
    * the df filter (quadratic guard); the verify joins are size-gated
    * broadcasts with a shuffle fallback (the prefixJaccardPairs gate,
    * reused).
    */
  def q157ContainmentJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val perDoc = documents(s, d)
      .filter($"doc_id".isNotNull)
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") >= 5)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .localCheckpoint()
    val buckets = perDoc.select($"doc_id", explode($"hs").as("h"))
      .groupBy($"h")
      .agg(call_function("collect_capped", $"doc_id", lit(50)).as("ids"))
      // capped at 51 members: size ≤ 50 ⟺ true df ≤ 50 and membership
      // complete; size 51 ⟺ df > 50, dropped — both deterministic
      .filter(size($"ids").between(2, 50))
      .localCheckpoint()
    val (_, pairBound) = TextOps.bucketGate(buckets, "ids", 50)
    val cand = buckets
      .select(explode($"ids").as("contained_doc"), $"ids")
      .select($"contained_doc", explode($"ids").as("container_doc"))
      .filter($"contained_doc" =!= $"container_doc")
      .distinct()
    val maxBroadcastBytes = 64L << 20
    val candB = if (pairBound * 2 * 48L <= maxBroadcastBytes) broadcast(cand) else cand
    val verifyA = candB.join(
      perDoc.select($"doc_id".as("contained_doc"), $"hs".as("hs_a")), Seq("contained_doc"))
    val decorated =
      if (TextOps.estDecoratedBytes(s, perDoc, pairBound * 2, maxBroadcastBytes)
          <= maxBroadcastBytes) broadcast(verifyA)
      else verifyA
    decorated
      .join(perDoc.select($"doc_id".as("container_doc"), $"hs".as("hs_b")),
        Seq("container_doc"))
      .withColumn("n_common", call_function("sorted_intersect_count", $"hs_a", $"hs_b"))
      .withColumn("n_sh", size($"hs_a").cast("long"))
      .withColumn("containment_milli", expr("(n_common * 1000) div n_sh"))
      .filter($"containment_milli" >= 800)
      .select($"contained_doc", $"container_doc", $"n_sh", $"n_common",
        $"containment_milli")
      .orderBy($"contained_doc", $"container_doc")
  }

  /** Same blocking (df BETWEEN 2 AND 50 — deterministic), brute
    * verification on string shingles; hash-set intersect counts equal
    * string-set intersect counts (64-bit shingle hashes, collision-free
    * at verification scale — the q134/q56 argument).
    */
  val q157Sql: String =
    """WITH d0 AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL)
      |), docs AS (
      |  SELECT doc_id, sh FROM d0 WHERE LEN(sh) >= 5
      |), ex AS (
      |  SELECT doc_id, UNNEST(sh) AS s FROM docs
      |), sz AS (
      |  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id
      |), keep AS (
      |  SELECT s FROM ex GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 50
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM ex a JOIN keep k ON a.s = k.s
      |  JOIN ex b ON b.s = a.s AND a.doc_id <> b.doc_id
      |), cm AS (
      |  SELECT c.da, c.db, COUNT(*) AS common
      |  FROM cand c JOIN ex ea ON ea.doc_id = c.da
      |  JOIN ex eb ON eb.doc_id = c.db AND eb.s = ea.s
      |  GROUP BY 1, 2
      |)
      |SELECT cm.da AS contained_doc, cm.db AS container_doc,
      |  CAST(sa.n AS BIGINT) AS n_sh, CAST(common AS BIGINT) AS n_common,
      |  CAST((common * 1000) // sa.n AS BIGINT) AS containment_milli
      |FROM cm JOIN sz sa ON sa.doc_id = cm.da
      |WHERE (common * 1000) // sa.n >= 800
      |ORDER BY contained_doc, container_doc""".stripMargin

  /** q158 — WEIGHTED (multiset) Jaccard near-dup: J_w(A,B) =
    * Σ_t min(tf_A, tf_B) / Σ_t max(tf_A, tf_B) over token
    * MULTISETS — the repetition-robust member of the similarity
    * family. Set-Jaccard (q34–q37, q134) treats "spam spam spam … spam"
    * and "spam" as identical (one distinct type); weighted Jaccard
    * scores them by mass, which is what boilerplate-vs-content dup
    * accounting actually wants (SpotSigs/multiset-resemblance
    * literature). Σmax is derived, never joined: Σmax = |A| + |B| −
    * Σmin (multiset identity), so only the intersection mass is
    * computed pairwise.
    *
    * Blocking: q157's deterministic df ≤ 50 shingle buckets
    * (undirected a < b), then the PPJoin length filter — J_w ≥ τ forces
    * Σmin/Σmax ≥ τ and Σmin ≤ min(tot), Σmax ≥ max(tot), so any
    * qualifying pair has min(tot)·1000 ≥ 600·max(tot); the filter is
    * provably redundant for the RESULT (the oracle needn't mirror it)
    * but prunes ~35 % of candidates before they carry any payload.
    *
    * Verification: the token multiset is born in the scan as ONE
    * [[graft.functions.TokenTfEnc]] array per doc (pure-map kernel —
    * 43-bit token-hash key (KeyShift sacrifices one bit for sign-safe
    * `sort_array` order — see TokenTfEnc), 20-bit tf, run-length
    * encoded, sorted) and
    * each surviving pair scores via ONE codegen'd
    * [[graft.functions.SortedTfMinSum]] merge walk. The original
    * relational verify — pair ⋈ tf ⋈ tf on (doc, token) + a Σmin
    * aggregate — exploded to Σ_pairs |tokens(doc_a)| rows (74.6 M at
    * sf0.1, measured 17.8 s; this shape runs in the dedup tier's normal
    * band). Hashed-key Σmin equals string-token Σmin by the per-DOC
    * collision argument in TokenTfEnc's doc (bounded by doc length, not
    * corpus size), so the unchanged string-relational oracle still
    * hash-matches. Integer wj_milli (`div` ≡ `//` on non-negatives)
    * keeps the τ = 0.6 threshold engine-exact.
    */
  def q158WeightedJaccard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val docs = documents(s, d).filter($"doc_id".isNotNull)
    // per-doc payload — blocking shingles, tf-encoded multiset, total
    // mass — all born in ONE corpus scan, checkpointed once
    val perDoc = docs
      .select($"doc_id",
        call_function("shingle_hashes", $"text", lit(3)).as("hs"),
        call_function("token_tf_enc", $"text").as("tfe"))
      .filter($"hs".isNotNull && size($"hs") >= 5)
      .withColumn("tot", aggregate($"tfe", lit(0L),
        (acc, e) => acc + e.bitwiseAND(lit(graft.functions.TokenTfEnc.TfMask))))
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .localCheckpoint()
    val buckets = perDoc.select($"doc_id", explode($"hs").as("h"))
      .groupBy($"h")
      .agg(call_function("collect_capped", $"doc_id", lit(50)).as("ids"))
      .filter(size($"ids").between(2, 50))
    val tots = perDoc.select($"doc_id", $"tot")
    val cand = buckets
      .select(explode($"ids").as("doc_a"), $"ids")
      .select($"doc_a", explode($"ids").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .distinct()
      .join(tots.select($"doc_id".as("doc_a"), $"tot".as("tot_a")), Seq("doc_a"))
      .join(tots.select($"doc_id".as("doc_b"), $"tot".as("tot_b")), Seq("doc_b"))
      .filter(least($"tot_a", $"tot_b") * 1000 >= greatest($"tot_a", $"tot_b") * 600)
      .localCheckpoint()
    cand
      .join(perDoc.select($"doc_id".as("doc_a"), $"tfe".as("tfe_a")), Seq("doc_a"))
      .join(perDoc.select($"doc_id".as("doc_b"), $"tfe".as("tfe_b")), Seq("doc_b"))
      .withColumn("inter_mass", call_function("sorted_tf_minsum", $"tfe_a", $"tfe_b"))
      .withColumn("union_mass", $"tot_a" + $"tot_b" - $"inter_mass")
      .withColumn("wj_milli", expr("(inter_mass * 1000) div union_mass"))
      .filter($"wj_milli" >= 600)
      .select($"doc_a", $"doc_b", $"inter_mass", $"union_mass", $"wj_milli")
      .orderBy($"doc_a", $"doc_b")
  }

  val q158Sql: String =
    """WITH d0 AS (
      |  SELECT doc_id, toks,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL)
      |), docs AS (
      |  SELECT doc_id, sh FROM d0 WHERE LEN(sh) >= 5
      |), ex AS (
      |  SELECT doc_id, UNNEST(sh) AS s FROM docs
      |), keep AS (
      |  SELECT s FROM ex GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 50
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ex a JOIN keep k ON a.s = k.s
      |  JOIN ex b ON b.s = a.s AND a.doc_id < b.doc_id
      |), tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM d0)
      |  WHERE tok <> '' GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tot FROM tf GROUP BY 1
      |), inter AS (
      |  SELECT c.doc_a, c.doc_b, CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS im
      |  FROM cand c JOIN tf a ON a.doc_id = c.doc_a
      |  JOIN tf b ON b.doc_id = c.doc_b AND b.tok = a.tok
      |  GROUP BY 1, 2
      |)
      |SELECT i.doc_a, i.doc_b, im AS inter_mass,
      |  ta.tot + tb.tot - im AS union_mass,
      |  (im * 1000) // (ta.tot + tb.tot - im) AS wj_milli
      |FROM inter i JOIN tot ta ON ta.doc_id = i.doc_a
      |JOIN tot tb ON tb.doc_id = i.doc_b
      |WHERE (im * 1000) // (ta.tot + tb.tot - im) >= 600
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q156_token_variants" -> (q156TokenVariants _),
    "q157_containment_join" -> (q157ContainmentJoin _),
    "q158_weighted_jaccard" -> (q158WeightedJaccard _),
  )

  val oracles: Map[String, String] = Map(
    "q156_token_variants" -> q156Sql,
    "q157_containment_join" -> q157Sql,
    "q158_weighted_jaccard" -> q158Sql,
  )
}
