package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Corpus mixing and vocabulary-based curation — the sampling-side
  * operators of an LLM training-data pipeline (the reference ingests
  * per-source streams — crypto_collector.py's per-exchange fan-out —
  * and a training pipeline re-weights exactly such per-source corpora
  * before training):
  *
  *   - q85: temperature-weighted source mixing (the XLM-R / GPT-3
  *     recipe: sample source s with probability ∝ n_s^α, α = 1/2, so
  *     small sources are up-weighted relative to their share).
  *   - q86: rare-token (out-of-vocabulary) ratio — the vocabulary
  *     quality signal: fraction of a doc's token instances whose
  *     corpus-wide document frequency is below a relative threshold.
  *   - q87: per-domain document caps (the RefinedWeb/C4 move against
  *     domain dominance) via the bounded-heap [[graft.functions.TopK]]
  *     aggregate, so the cap never globally sorts.
  *
  * Every arithmetic step is integer-exact or a fixed IEEE-double op
  * chain, so the DuckDB oracle reproduces results bit-for-bit.
  */
object Mixing {

  /** Exact integer square root of a BIGINT column: seed from the double
    * sqrt (within ±1 of truth for n < 2^52), then correct by exact
    * integer comparison — both branches are portable, so the result is
    * identical in any engine regardless of libm.
    */
  private[graft] def isqrt(n: Column): Column = {
    val r0 = floor(sqrt(n.cast("double"))).cast("long")
    when((r0 + 1) * (r0 + 1) <= n, r0 + 1)
      .when(r0 * r0 > n, r0 - 1)
      .otherwise(r0)
  }

  /** Temperature-weighted mixture sampling across sources. Per-source
    * weight w_s = ⌊√n_s⌋ (α = 1/2 temperature, integer-exact via
    * [[isqrt]]); the per-mille keep rate is the integer share
    * (w_s·1000) div Σw. Selection is the same deterministic per-mille
    * hash bucket as q58/q78 — reproducible under re-runs and engine
    * changes, no RNG state to coordinate across executors.
    *
    * Scale shape: the per-source count is a tiny aggregate (sources
    * number in the thousands at worst), its total a 1-row cross join;
    * the rate table broadcasts back over the scan, and selection is a
    * pure map — ONE pass over the corpus plus two dim-sized shuffles,
    * at any corpus size.
    */
  def q85MixtureSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val weighted = counts.withColumn("w", isqrt($"n_docs"))
    val tot = weighted.agg(sum($"w").as("tot_w"))
    val rates = weighted.crossJoin(broadcast(tot))
      .withColumn("rate_pm", expr("(w * 1000) div tot_w"))
      .select($"source", $"n_docs", $"w", $"rate_pm")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("bucket", expr("((doc_id % 1000003) * 2654435761) % 1000"))
      .filter($"bucket" < $"rate_pm")
      .select($"doc_id", $"source", $"n_docs", $"w", $"rate_pm", $"bucket")
      .orderBy($"doc_id")
  }

  val q85Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source FROM documents WHERE doc_id IS NOT NULL
      |), counts AS (
      |  SELECT source, COUNT(*) AS n_docs FROM d GROUP BY source
      |), wts AS (
      |  SELECT source, n_docs,
      |    CASE WHEN (r0+1)*(r0+1) <= n_docs THEN r0+1
      |         WHEN r0*r0 > n_docs THEN r0-1 ELSE r0 END AS w
      |  FROM (SELECT source, n_docs,
      |          CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS r0
      |        FROM counts)
      |), rates AS (
      |  SELECT source, n_docs, w,
      |    CAST((w * 1000) // (SELECT SUM(w) FROM wts) AS BIGINT) AS rate_pm
      |  FROM wts
      |)
      |SELECT doc_id, source, n_docs, w, rate_pm,
      |  ((doc_id % 1000003) * 2654435761) % 1000 AS bucket
      |FROM d JOIN rates USING (source)
      |WHERE ((doc_id % 1000003) * 2654435761) % 1000 < rate_pm
      |ORDER BY doc_id""".stripMargin

  /** Rare-token (OOV) ratio per document: the fraction of token
    * INSTANCES whose corpus document frequency is under 10% of the
    * corpus — the vocabulary-coverage quality filter (docs full of
    * tokens the corpus has never seen are boilerplate, OCR noise, or
    * here: the planted `dup` marker at df ≈ 5%).
    *
    * Scale shape: df is one distinct + one aggregate on the token —
    * vocabulary-sized, not corpus-sized. The COMMON head is then
    * provably broadcast-safe at ANY corpus size: Σ_t df_t = Σ_docs
    * |distinct toks| ≤ N·L, so |{t : df_t ≥ f·N}| ≤ L/f (L = mean
    * distinct tokens per doc; f = 0.1 here) — a few thousand entries
    * regardless of N. Rarity is then a broadcast LEFT ANTI join of
    * token instances against that bounded head; the corpus itself
    * never shuffles on tokens.
    */
  def q86RareTokenRatio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
    val inst = docs.select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    val dfreq = inst.distinct().groupBy($"tok").agg(count(lit(1)).as("df"))
    val common = dfreq.crossJoin(broadcast(nDocs))
      .filter($"df" * 10 >= $"n_corpus").select($"tok")
    val rare = inst.join(broadcast(common), Seq("tok"), "left_anti")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_rare"))
    docs.select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_toks"))
      .join(rare, Seq("doc_id"), "left")
      .withColumn("n_rare", coalesce($"n_rare", lit(0L)))
      .withColumn("rare_ratio", $"n_rare".cast("double") / $"n_toks")
      .orderBy($"doc_id")
  }

  val q86Sql: String =
    """WITH d AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id IS NOT NULL
      |), n AS (
      |  SELECT COUNT(*) AS n_corpus FROM d
      |), inst AS (
      |  SELECT DISTINCT doc_id, UNNEST(toks) AS tok FROM d
      |), dfreq AS (
      |  SELECT tok, COUNT(*) AS df FROM inst GROUP BY tok
      |), common AS (
      |  SELECT LIST(tok) AS cl FROM dfreq, n WHERE df * 10 >= n_corpus
      |)
      |SELECT doc_id,
      |  CAST(LEN(toks) AS BIGINT) AS n_toks,
      |  CAST(LEN(LIST_FILTER(toks, t -> NOT LIST_CONTAINS(cl, t))) AS BIGINT) AS n_rare,
      |  CAST(LEN(LIST_FILTER(toks, t -> NOT LIST_CONTAINS(cl, t))) AS DOUBLE) / LEN(toks) AS rare_ratio
      |FROM d, common
      |ORDER BY doc_id""".stripMargin

  /** Per-domain document cap: keep each source's top-5 docs by
    * (quality DESC, doc_id ASC) — the anti-domain-dominance cap every
    * web-scale curation pipeline applies, composed from q31's scoring
    * map and the bounded-heap [[graft.functions.TopK]] aggregate. The
    * heap ships ≤ k rows per (source, partition) into ONE aggregation
    * exchange — no global or per-group sort of the corpus, unlike the
    * windowed row_number formulation (which must sort every group
    * somewhere), so the cap costs the same as a count at any scale.
    */
  def q87DomainCap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 5
    val scored = TextOps.qualityScored(documents(s, d).filter($"doc_id".isNotNull))
    scored.groupBy($"source")
      .agg(graft.functions.TopK(k)($"quality", $"doc_id").as("top"))
      .select($"source", posexplode($"top").as(Seq("i", "r")))
      .select($"source", ($"i" + 1).cast("long").as("rk"),
        $"r.key".as("doc_id"), $"r.price".as("quality"))
      .orderBy($"source", $"rk")
  }

  val q87Sql: String =
    """WITH s AS (
      |  SELECT doc_id, source,
      |    CASE WHEN n_toks < 5 THEN 0.0
      |         ELSE LEAST(1.0, n_toks / 100.0) * (1.0 - digit_ratio) * LEAST(1.0, (stop_hits / n_toks) * 5.0)
      |    END AS quality
      |  FROM (
      |    SELECT doc_id, source,
      |      LEN(toks) AS n_toks,
      |      CAST(LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS DOUBLE) AS stop_hits,
      |      CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE) / LENGTH(text) AS digit_ratio
      |    FROM (SELECT doc_id, source, text,
      |            REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |          FROM documents WHERE doc_id IS NOT NULL))
      |)
      |SELECT source, rk, doc_id, quality FROM (
      |  SELECT source, doc_id, quality,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
      |  FROM s)
      |WHERE rk <= 5
      |ORDER BY source, rk""".stripMargin

  /** q120 — priority sampling (Duffield–Lund–Thorup, "Priority
    * sampling for estimation of arbitrary subset sums", JACM'07) in
    * portable integer arithmetic: the weighted-sampling-without-
    * replacement scheme whose k-sample supports UNBIASED subset-sum
    * estimates. Each doc with weight w (= n_chars) draws priority
    * p = w·P div h with h a fixed-constant universal hash of doc_id on
    * [1, P] (the u ∈ (0,1] uniform as a rational h/P — no RNG state,
    * reproducible anywhere); the sample is the top k by priority, the
    * threshold τ is the (k+1)-th priority, and each kept doc's
    * estimator is ŵ = max(w, τ) — Σŵ over the sample estimates the
    * corpus total (near-unbiased; the div floors τ by < 1 weight unit).
    * The rolled-along exact total makes the error visible per row
    * (q113/q116's audit posture), and every step is exact int64 both
    * engines replay — same doc_id < P domain assumption as q116,
    * shared with the oracle rather than hidden.
    *
    * Scale shape: priorities are a pure map fused into the scan; the
    * top-(k+1) heap is ONE partial+final [[graft.functions.TopK]]
    * aggregate (shuffle O(k × partitions) — never a global sort); the
    * k-row sample broadcasts back for the weight join; the exact total
    * is one map-side-combined sum. The corpus is read twice and never
    * shuffled.
    */
  def q120PrioritySample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 64
    val P = 1000000007L
    val a = 2654435761L % P
    val b = 97911L
    val w = documents(s, d)
      .filter($"doc_id".isNotNull && $"n_chars" > 0)
      .select($"doc_id", $"n_chars".cast("long").as("weight"),
        ((($"doc_id" % P) * a + b) % P + 1L).as("h"))
      .select($"doc_id", $"weight", expr(s"(weight * $P) div h").as("priority"))
    // top-(k+1) bounded LONG-keyed heap ([[graft.functions.TopKLong]]):
    // the priority stays int64 end to end, so within the domain bound
    // weight < 2^63/P (n_chars ≲ 9.2·10^9) the ordering and the
    // recovered τ are exact — the double-keyed variant was exact only
    // while priority < 2^53 (n_chars ≲ 9·10^6). Beyond that bound
    // weight·P wraps int64 in non-ANSI Spark while DuckDB raises, so
    // the bound is a documented domain contract (same posture as
    // q116's doc_id < P), not an "exact at any n_chars" claim. Ties
    // impossible to get wrong (total order on (priority DESC, doc_id
    // ASC) in both engines).
    val heap = w.agg(graft.functions.TopKLong(k + 1)(
        $"priority", $"doc_id").as("top"))
      .select($"top",
        // below-(k+1) corpora (tiny SFs) have no threshold: τ = 0 makes
        // every estimator exact, matching the estimator's whole-
        // population degenerate case
        coalesce(try_element_at($"top", lit(k + 1)).getField("priority"), lit(0L))
          .as("tau"))
      .select(explode(slice($"top", 1, k)).as("r"), $"tau")
      .select($"r.key".as("doc_id"), $"tau")
    val exactTot = w.agg(sum($"weight").as("exact_total"))
    broadcast(heap)
      .join(w, Seq("doc_id"))
      .withColumn("est_weight", greatest($"weight", $"tau"))
      .crossJoin(broadcast(exactTot))
      .withColumn("est_total", sum($"est_weight").over(
        BoundedWindow.all($"doc_id")))
      .withColumn("err_permille",
        expr("(abs(est_total - exact_total) * 1000) div exact_total"))
      .select($"doc_id", $"weight", $"priority", $"tau", $"est_weight",
        $"est_total", $"exact_total", $"err_permille")
      .orderBy($"priority".desc, $"doc_id")
  }

  val q120Sql: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
      |    ((doc_id % 1000000007) * (2654435761 % 1000000007) + 97911) % 1000000007 + 1 AS h
      |  FROM documents WHERE doc_id IS NOT NULL AND n_chars > 0),
      |p AS (
      |  SELECT doc_id, weight, (weight * 1000000007) // h AS priority FROM w),
      |ranked AS (
      |  SELECT doc_id, weight, priority,
      |    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rk FROM p),
      |tau AS (
      |  SELECT COALESCE((SELECT priority FROM ranked WHERE rk = 65), 0) AS tau),
      |kept AS (
      |  SELECT r.doc_id, r.weight, r.priority, t.tau,
      |    GREATEST(r.weight, t.tau) AS est_weight
      |  FROM ranked r CROSS JOIN tau t WHERE r.rk <= 64)
      |SELECT doc_id, weight, priority, tau, est_weight,
      |  CAST(SUM(est_weight) OVER () AS BIGINT) AS est_total,
      |  CAST((SELECT SUM(weight) FROM p) AS BIGINT) AS exact_total,
      |  CAST((ABS(SUM(est_weight) OVER () - (SELECT SUM(weight) FROM p)) * 1000)
      |    // (SELECT SUM(weight) FROM p) AS BIGINT) AS err_permille
      |FROM kept ORDER BY priority DESC, doc_id""".stripMargin

  /** q151 — k-ANONYMITY audit over quasi-identifiers: the governance
    * gate a dataset release runs before publication — group docs by the
    * (lang, source, 100-char size bucket) quasi-identifier tuple and
    * flag every document whose group has fewer than k = 5 members
    * (re-identifiable via attribute linkage; Sweeney's k-anonymity
    * criterion). The PII tier (q83) scrubs direct identifiers; this is
    * the complementary INDIRECT-identifier audit.
    *
    * Scale shape: the group relation is bounded by the quasi-identifier
    * cross space (langs × sources × buckets — dimension-sized at any
    * corpus scale) and BROADCASTS back over the scan; one partial+final
    * agg plus a pure-map decoration, the corpus never shuffles.
    */
  def q151KAnonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
      .select($"doc_id", $"lang", $"source",
        expr("n_chars div 100").as("size_bucket"))
    val groups = docs.groupBy($"lang", $"source", $"size_bucket")
      .agg(count(lit(1)).as("k"))
    docs.join(broadcast(groups), Seq("lang", "source", "size_bucket"))
      .select($"doc_id", $"lang", $"source", $"size_bucket", $"k",
        ($"k" < 5).as("at_risk"))
      .orderBy($"doc_id")
  }

  /** q170 — l-diversity audit, the release-gate companion to q151's
    * k-anonymity (Machanavajjhala et al., ICDE'06): a quasi-identifier
    * group can be k-anonymous yet still leak when every member shares
    * the same SENSITIVE value, so each group additionally reports
    * l = distinct sensitive values and the dominant value's share.
    * Quasi-identifiers here are what an observer of the event stream
    * plausibly knows — (event_type, hour-of-day, user-id bucket) — and
    * the sensitive attribute is the payload metric `props.k`; a group
    * is at risk when l < 3 or one value exceeds 800 ‰ (the homogeneity
    * attack surface).
    *
    * All-integer math end to end: hour-of-day via exact epoch-µs `div`
    * (timezone-free), permille via integer div, so the risk thresholds
    * are engine-exact. Null/malformed payloads are filtered
    * symmetrically with the oracle (the q162 discipline).
    *
    * Scale: two stacked aggregations, both with map-side partial
    * combine — the corpus-sized shuffle carries only (quasi-id,
    * sensitive) cells, the second runs on the cell relation (bounded by
    * group count × distinct sensitive values, never event count).
    */
  def q170LDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .filter($"event_id".isNotNull && $"user_id".isNotNull &&
        $"ts".isNotNull && $"props".isNotNull)
      .select($"event_type",
        expr("(unix_micros(ts) div 3600000000L) % 24").as("hour_of_day"),
        expr("user_id div 10").as("user_bucket"),
        get_json_object($"props", "$.k").cast("long").as("sensitive"))
      .filter($"sensitive".isNotNull)
    ev.groupBy($"event_type", $"hour_of_day", $"user_bucket", $"sensitive")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type", $"hour_of_day", $"user_bucket")
      .agg(sum($"cnt").cast("long").as("k"), count(lit(1)).as("l"),
        max($"cnt").as("mx"))
      .withColumn("dom_permille", expr("(mx * 1000) div k"))
      .withColumn("at_risk", $"l" < 3 || $"dom_permille" > 800)
      .select($"event_type", $"hour_of_day", $"user_bucket", $"k", $"l",
        $"dom_permille", $"at_risk")
      .orderBy($"event_type", $"hour_of_day", $"user_bucket")
  }

  val q170Sql: String =
    """WITH e AS (
      |  SELECT event_type, (EPOCH_US(ts) // 3600000000) % 24 AS hour_of_day,
      |         user_id // 10 AS user_bucket,
      |         CAST(props->>'$.k' AS BIGINT) AS sensitive
      |  FROM events
      |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
      |    AND props IS NOT NULL AND (props->>'$.k') IS NOT NULL
      |), c AS (
      |  SELECT event_type, hour_of_day, user_bucket, sensitive, COUNT(*) AS cnt
      |  FROM e GROUP BY 1, 2, 3, 4
      |)
      |SELECT event_type, CAST(hour_of_day AS BIGINT) AS hour_of_day,
      |  CAST(user_bucket AS BIGINT) AS user_bucket,
      |  CAST(SUM(cnt) AS BIGINT) AS k, COUNT(*) AS l,
      |  (MAX(cnt) * 1000) // CAST(SUM(cnt) AS BIGINT) AS dom_permille,
      |  COUNT(*) < 3 OR (MAX(cnt) * 1000) // CAST(SUM(cnt) AS BIGINT) > 800 AS at_risk
      |FROM c GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  val q151Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source, n_chars // 100 AS size_bucket
      |  FROM documents WHERE doc_id IS NOT NULL
      |), g AS (
      |  SELECT lang, source, size_bucket, COUNT(*) AS k
      |  FROM d GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, lang, source, CAST(size_bucket AS BIGINT) AS size_bucket,
      |  CAST(k AS BIGINT) AS k, k < 5 AS at_risk
      |FROM d JOIN g USING (lang, source, size_bucket)
      |ORDER BY doc_id""".stripMargin

  /** q153 — deterministic TRAINING ORDER + shard assignment: the step
    * between curation and writing webdataset-style shards — every doc
    * gets a pseudo-random but REPRODUCIBLE position (seeded permutation
    * via two independent affine hashes: one routes to a shard, one
    * orders within it), so a re-run of the pipeline writes
    * byte-identical shards and a training job can resume
    * mid-epoch deterministically. No RNG state, no driver-side
    * shuffling — the q58/q120 portable-hash discipline applied to data
    * ordering.
    *
    * Scale shape: shard routing is a pure map; the within-shard rank is
    * a window PARTITIONED BY shard — exactly the distributed sort a
    * shard writer performs anyway (hash-partition by shard, sort within
    * partition), never a global window. The per-shard manifest (count +
    * token total) is dimension-bounded (n_shards rows) and broadcasts
    * back onto the assignment.
    */
  def q153TrainingOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val P = 1000000007L
    val docs = documents(s, d).filter($"doc_id".isNotNull)
      .select($"doc_id",
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("shard", (($"doc_id" % P) * (2654435761L % P) + 40503L) % P % 16L)
      .withColumn("h2", (($"doc_id" % P) * (1779033703L % P) + 144169L) % P)
    val ranked = docs.withColumn("pos_in_shard",
      (row_number().over(Window.partitionBy($"shard")
        .orderBy($"h2", $"doc_id")) - 1).cast("long"))
    val manifest = ranked.groupBy($"shard")
      .agg(count(lit(1)).as("shard_docs"), sum($"n_tokens").as("shard_tokens"))
    ranked.join(broadcast(manifest), Seq("shard"))
      .select($"doc_id", $"shard", $"pos_in_shard", $"n_tokens",
        $"shard_docs", $"shard_tokens")
      .orderBy($"doc_id")
  }

  val q153Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS BIGINT) AS n_tokens,
      |    ((doc_id % 1000000007) * (2654435761 % 1000000007) + 40503) % 1000000007 % 16 AS shard,
      |    ((doc_id % 1000000007) * (1779033703 % 1000000007) + 144169) % 1000000007 AS h2
      |  FROM documents WHERE doc_id IS NOT NULL
      |), r AS (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, doc_id) - 1 AS BIGINT) AS pos_in_shard
      |  FROM d
      |), m AS (
      |  SELECT shard, COUNT(*) AS shard_docs, SUM(n_tokens) AS shard_tokens
      |  FROM r GROUP BY shard
      |)
      |SELECT doc_id, CAST(shard AS BIGINT) AS shard, pos_in_shard, n_tokens,
      |  CAST(shard_docs AS BIGINT) AS shard_docs,
      |  CAST(shard_tokens AS BIGINT) AS shard_tokens
      |FROM r JOIN m USING (shard)
      |ORDER BY doc_id""".stripMargin

  /** q128 — leakage-safe train/val/test split: the split is assigned to
    * the exact-duplicate GROUP, not the document, so two copies of the
    * same text can never straddle train and eval (the classic benchmark
    * contamination bug a doc-keyed hash split silently commits). Group
    * key = md5(text) (q34's exact-dup grouping); representative = min
    * doc_id; the representative's portable affine hash picks 8/1/1
    * buckets. Every member inherits the representative's split by
    * construction — the planted-dup spec pins it.
    *
    * Scale shape: one corpus scan to key, one 16-byte-key hash agg for
    * the group relation, one shuffle join back on the same key (both
    * sides hash the identical gk — one exchange each, AQE-skew-safe).
    * The text column itself never shuffles; only (gk, doc_id) pairs do.
    */
  def q128LeakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 1000000007L
    val a = 2654435761L % P
    // text IS NOT NULL is explicit (mirrored in the oracle): a null text
    // yields a null gk, which matches in NEITHER engine's join — without
    // the filter such docs would silently vanish from the split
    // assignment instead of visibly falling outside the domain contract
    val keyed = documents(s, d).filter($"doc_id".isNotNull && $"text".isNotNull)
      .select($"doc_id", md5($"text").as("gk"))
    val groups = keyed.groupBy($"gk")
      .agg(min($"doc_id").as("group_rep"), count(lit(1)).as("group_size"))
    keyed.join(groups, Seq("gk"))
      .withColumn("bucket10", (($"group_rep" % P) * a + 17L) % P % 10)
      .withColumn("split",
        when($"bucket10" <= 7, "train")
          .when($"bucket10" === 8, "val").otherwise("test"))
      .select($"doc_id", $"group_rep", $"group_size", $"split")
      .orderBy($"doc_id")
  }

  val q128Sql: String =
    """WITH keyed AS (
      |  SELECT doc_id, MD5(text) AS gk FROM documents
      |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
      |), groups AS (
      |  SELECT gk, MIN(doc_id) AS group_rep, COUNT(*) AS group_size
      |  FROM keyed GROUP BY gk
      |)
      |SELECT k.doc_id, g.group_rep, g.group_size,
      |  CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
      |FROM keyed k JOIN groups g USING (gk),
      |  LATERAL (SELECT ((g.group_rep % 1000000007) * (2654435761 % 1000000007) + 17)
      |             % 1000000007 % 10 AS b) t
      |ORDER BY k.doc_id""".stripMargin

  /** q130 — token-budget allocation: the mixing CALCULATOR that turns
    * q85's temperature weights into an actual sampling plan for a
    * fixed training budget (the LLaMA-style "tokens and epochs per
    * source" table). Per source: available tokens, √-temperature
    * weight, integer-share allocation alloc = B·w div Σw, and the
    * implied epoch count epochs_milli = alloc·1000 div available —
    * values > 1000 mean the source repeats (the over-epoching signal
    * data-mixing reviews look for). Exact integer arithmetic
    * throughout; the one corpus pass is the per-source token count
    * (map-side combining hash agg), everything after is
    * |sources|-sized.
    */
  def q130TokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val budget = 1000000L
    val counts = documents(s, d)
      .filter($"doc_id".isNotNull && $"source".isNotNull)
      .select($"source", size(TextOps.tokens($"text")).cast("long").as("toks"))
      .groupBy($"source").agg(sum($"toks").as("n_tokens"))
    val weighted = counts.withColumn("w", isqrt($"n_tokens"))
    val tot = weighted.agg(sum($"w").as("tot_w"))
    weighted.crossJoin(broadcast(tot))
      .withColumn("alloc_tokens", expr(s"($budget * w) div tot_w"))
      .withColumn("epochs_milli", expr("(alloc_tokens * 1000) div n_tokens"))
      .select($"source", $"n_tokens", $"w", $"alloc_tokens", $"epochs_milli",
        ($"epochs_milli" > 1000L).as("over_epoched"))
      .orderBy($"source")
  }

  val q130Sql: String =
    """WITH counts AS (
      |  SELECT source, CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
      |  GROUP BY source
      |), weighted AS (
      |  SELECT source, n_tokens,
      |    CAST(CASE WHEN (FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) + 1)
      |                   * (FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) + 1) <= n_tokens
      |              THEN FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) + 1
      |              WHEN FLOOR(SQRT(CAST(n_tokens AS DOUBLE)))
      |                   * FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) > n_tokens
      |              THEN FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) - 1
      |              ELSE FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) END AS BIGINT) AS w
      |  FROM counts
      |), tot AS (
      |  SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM weighted
      |)
      |SELECT source, n_tokens, w,
      |  CAST((1000000 * w) // tot_w AS BIGINT) AS alloc_tokens,
      |  CAST(((1000000 * w) // tot_w * 1000) // n_tokens AS BIGINT) AS epochs_milli,
      |  ((1000000 * w) // tot_w * 1000) // n_tokens > 1000 AS over_epoched
      |FROM weighted, tot ORDER BY source""".stripMargin

  /** q139 — curriculum PHASE bucketing, the scale-right form of
    * quality-ordered training (curriculum learning à la Bengio et al.
    * 2009, as production pipelines actually ship it): an exact global
    * rank over the corpus needs a single-partition window, so instead
    * each doc is assigned a quality DECILE phase from thresholds
    * derived off a deterministic 512-doc uniform sample (q129's
    * k-min-hash sample idiom — mergeable, engine-portable), plus a
    * portable `shuffle_slot` for within-phase ordering. Phase
    * assignment is then a PURE MAP against 9 broadcast thresholds —
    * nothing global anywhere, any corpus size.
    *
    * Scale shape: sample selection is orderBy(h).limit(512)
    * (TakeOrderedAndProject); the threshold relation is ≤ 9 rows and
    * broadcasts; the corpus is scanned twice (sample pass + assign
    * pass) and never shuffled at all.
    */
  def q139CurriculumPhases(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val P = 1000000007L
    val a = 2654435761L % P
    val scored = TextOps.qualityScored(
        documents(s, d).filter($"doc_id".isNotNull && $"source".isNotNull))
      .select($"doc_id", $"source", $"quality")
    val keyed = scored.withColumn("h", (($"doc_id" % P) * a + 71L) % P)
    val sample = keyed.orderBy($"h", $"doc_id").limit(512)
      .select($"quality", $"doc_id")
    val ranked = sample.withColumn("rn",
      row_number().over(BoundedWindow.ordered($"doc_id", $"quality", $"doc_id")).cast("long"))
    val nsDf = sample.agg(count(lit(1)).as("ns"))
    val thrRanks = nsDf
      .select(explode(sequence(lit(1), lit(9))).as("i"), $"ns")
      .select(greatest(expr("(i * ns) div 10"), lit(1L)).as("rn"))
    val thresholds = ranked.join(broadcast(thrRanks), Seq("rn"))
      .agg(sort_array(collect_list($"quality")).as("tarr"))
    scored.crossJoin(broadcast(thresholds))
      .withColumn("phase",
        size(filter($"tarr", t => t <= $"quality")).cast("long"))
      .select($"doc_id", $"source", $"quality", $"phase",
        ((($"doc_id" % P) * a + 977L) % P % 1000L).as("shuffle_slot"))
      .orderBy($"doc_id")
  }

  val q139Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    CASE WHEN n_toks < 5 THEN 0.0
      |         ELSE LEAST(1.0, n_toks / 100.0) * (1.0 - digit_ratio) * LEAST(1.0, (stop_hits / n_toks) * 5.0)
      |    END AS quality
      |  FROM (
      |    SELECT doc_id, source, LEN(toks) AS n_toks,
      |      CAST(LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS DOUBLE) AS stop_hits,
      |      CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE) / LENGTH(text) AS digit_ratio
      |    FROM (SELECT doc_id, source, text, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |          FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL))
      |), keyed AS (
      |  SELECT doc_id, quality,
      |    ((doc_id % 1000000007) * (2654435761 % 1000000007) + 71) % 1000000007 AS h
      |  FROM scored
      |), sample AS (
      |  SELECT quality, doc_id FROM keyed ORDER BY h, doc_id LIMIT 512
      |), ranked AS (
      |  SELECT quality, ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rn FROM sample
      |), ns AS (SELECT COUNT(*) AS ns FROM sample
      |), thr AS (
      |  SELECT GREATEST((i * ns) // 10, 1) AS rn
      |  FROM ns, UNNEST(RANGE(1, 10)) t(i)
      |), tarr AS (
      |  SELECT LIST_SORT(LIST(r.quality)) AS tarr FROM ranked r JOIN thr USING (rn)
      |)
      |SELECT s.doc_id, s.source, s.quality,
      |  CAST(LEN(LIST_FILTER(tarr, t -> t <= s.quality)) AS BIGINT) AS phase,
      |  CAST(((s.doc_id % 1000000007) * (2654435761 % 1000000007) + 977) % 1000000007 % 1000 AS BIGINT) AS shuffle_slot
      |FROM scored s, tarr ORDER BY s.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_mixture_sample" -> (q85MixtureSample _),
    "q86_rare_token_ratio" -> (q86RareTokenRatio _),
    "q87_domain_cap" -> (q87DomainCap _),
    "q120_priority_sample" -> (q120PrioritySample _),
    "q128_leakage_safe_split" -> (q128LeakageSafeSplit _),
    "q130_token_budget" -> (q130TokenBudget _),
    "q139_curriculum_phases" -> (q139CurriculumPhases _),
    "q151_k_anonymity" -> (q151KAnonymity _),
    "q170_l_diversity" -> (q170LDiversity _),
    "q153_training_order" -> (q153TrainingOrder _),
  )

  val oracles: Map[String, String] = Map(
    "q85_mixture_sample" -> q85Sql,
    "q86_rare_token_ratio" -> q86Sql,
    "q87_domain_cap" -> q87Sql,
    "q120_priority_sample" -> q120Sql,
    "q128_leakage_safe_split" -> q128Sql,
    "q130_token_budget" -> q130Sql,
    "q139_curriculum_phases" -> q139Sql,
    "q151_k_anonymity" -> q151Sql,
    "q170_l_diversity" -> q170Sql,
    "q153_training_order" -> q153Sql,
  )
}
