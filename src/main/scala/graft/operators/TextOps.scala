package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Text-analysis + deduplication surface over `documents` — the
  * operations a large-scale LLM training-data pipeline runs per document
  * (builder prompt; BASELINE.json north star). All are plain DataFrame
  * transformations: per-document ops are embarrassingly parallel (no
  * shuffle at all), pairwise ops bound their candidate space (per-source
  * blocking / LSH banding) so nothing is O(n²) over the full corpus.
  *
  * No `lower()`/`upper()`: Spark 4 routes those through ICU collation case
  * mapping whose static init costs minutes in a fresh JVM; `translate`
  * (exact char map) folds ASCII for free and matches DuckDB `LOWER` on
  * this corpus.
  */
object TextOps {
  private val Uc = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Lc = "abcdefghijklmnopqrstuvwxyz"

  /** ASCII-fold + whitespace-split token array. */
  def tokens(text: Column): Column = split(trim(translate(text, Uc, Lc)), "\\s+")

  /** Word w-shingles (w consecutive tokens joined by one space). Guarded:
    * Spark's `sequence(1, n)` with n < 1 counts DOWN, so short docs get an
    * explicit empty array.
    *
    * NOTE: array-lambda form — fine for tests/small inputs, but Catalyst
    * inlines the `toks` expression into every `element_at`, so with
    * `toks = tokens(text)` the text is re-tokenized O(positions) times,
    * interpreted. Hot paths use [[explodedShingles]] instead.
    */
  def shingles(toks: Column, w: Int): Column =
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", (0 until w).map(k => element_at(toks, i + k)): _*)))

  /** DISTINCT word w-shingles as exploded rows `(idCols…, shingle)` — the
    * whole-stage-codegen formulation: posexplode tokens once, build each
    * shingle from window `lead`s over (doc, position). One shuffle on the
    * doc id; every operator stays codegen'd (profiling the lambda form
    * showed interpreted `translate`+`split` dominating — 90+ s at sf0.1
    * vs ~4 s for this shape).
    */
  def explodedShingles(df: DataFrame, idCols: Seq[String], textCol: String, w: Int): DataFrame = {
    val ex = df.select(idCols.map(col) :+
      posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")): _*)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(idCols.map(col): _*).orderBy(col("__pos"))
    val withLeads = (1 until w).foldLeft(ex) { (acc, k) =>
      acc.withColumn(s"__lead$k", lead(col("__tok"), k).over(win))
    }
    val sh = concat_ws(" ", col("__tok") +: (1 until w).map(k => col(s"__lead$k")): _*)
    withLeads.filter(col(s"__lead${w - 1}").isNotNull)
      .select(idCols.map(col) :+ sh.as("shingle"): _*)
      .distinct()
  }

  /** Per-document stats: token count, distinct tokens, type-token ratio,
    * mean token length, regex (BPE-ish) token count. Pure map — no shuffle.
    */
  def q30TextStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fanout.widen: see CorpusOps.q73 — the final sort's range-sampling
    // pass re-executes an un-materialized map child, so a single-split
    // scan runs the token kernel twice on one core. Identity at scale.
    Fanout.widen(documents(s, d), $"doc_id")
      .withColumn("toks", tokens($"text"))
      .select(
        $"doc_id", $"lang",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_distinct"),
        (size(array_distinct($"toks")).cast("double") / size($"toks")).as("ttr"),
        (length(concat_ws("", $"toks")).cast("double") / size($"toks")).as("mean_tok_len"),
        regexp_count($"text", lit("[a-z]+|[0-9]+")).cast("long").as("n_bpeish"))
      .orderBy($"doc_id")
  }

  val q30Sql: String =
    """SELECT doc_id, lang,
      |  LEN(toks) AS n_tokens,
      |  LEN(LIST_DISTINCT(toks)) AS n_distinct,
      |  CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS ttr,
      |  CAST(LEN(ARRAY_TO_STRING(toks, '')) AS DOUBLE) / LEN(toks) AS mean_tok_len,
      |  LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS n_bpeish
      |FROM (SELECT doc_id, lang, text,
      |        REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring: length/stopword/digit signals + a composite score —
    * the filter stage of a training-data pipeline. Pure map.
    */
  def q31QualityScore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fanout.widen: see q30.
    qualityScored(Fanout.widen(documents(s, d), $"doc_id"))
      .select($"doc_id", $"n_toks", $"stop_ratio", $"digit_ratio", $"quality")
      .orderBy($"doc_id")
  }

  /** q31's scoring columns as a reusable stage (q78 composes it as the
    * pipeline's filter step). Adds n_toks / stop_ratio / digit_ratio /
    * quality to `docs`; pure map.
    */
  def qualityScored(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val toks = tokens($"text")
    val stopHits = size(filter(toks, t => t.isin(stop: _*))).cast("double")
    docs
      .withColumn("n_toks", size(toks).cast("long"))
      .withColumn("stop_ratio", stopHits / $"n_toks")
      .withColumn("digit_ratio",
        (length($"text") - length(regexp_replace($"text", "[0-9]", ""))).cast("double") / length($"text"))
      .withColumn("quality",
        when($"n_toks" < 5, 0.0).otherwise(
          least(lit(1.0), $"n_toks" / lit(100.0)) * (lit(1.0) - $"digit_ratio") *
            least(lit(1.0), $"stop_ratio" * 5.0)))
  }

  val q31Sql: String =
    """SELECT doc_id, n_toks,
      |  stop_hits / n_toks AS stop_ratio,
      |  digit_ratio,
      |  CASE WHEN n_toks < 5 THEN 0.0
      |       ELSE LEAST(1.0, n_toks / 100.0) * (1.0 - digit_ratio) * LEAST(1.0, (stop_hits / n_toks) * 5.0)
      |  END AS quality
      |FROM (
      |  SELECT doc_id,
      |    LEN(toks) AS n_toks,
      |    CAST(LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS DOUBLE) AS stop_hits,
      |    CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE) / LENGTH(text) AS digit_ratio
      |  FROM (SELECT doc_id, text, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Language ID by stopword-marker voting (n-gram heuristic): count
    * per-language marker-token hits, predict the argmax (ties broken by
    * fixed language order via the CASE chain). Pure map.
    */
  def q32LangId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val markers = Map(
      "en" -> Seq("the", "and", "of", "is"),
      "es" -> Seq("el", "la", "de", "que"),
      "fr" -> Seq("le", "la", "et", "les"),
      "de" -> Seq("der", "die", "und", "das"))
    val toks = tokens($"text")
    def hits(ws: Seq[String]): Column =
      size(filter(toks, t => t.isin(ws: _*))).cast("long")
    // Fanout.widen: see q30.
    Fanout.widen(documents(s, d), $"doc_id")
      .withColumn("en_hits", hits(markers("en")))
      .withColumn("es_hits", hits(markers("es")))
      .withColumn("fr_hits", hits(markers("fr")))
      .withColumn("de_hits", hits(markers("de")))
      .withColumn("pred_lang",
        when($"en_hits" >= $"es_hits" && $"en_hits" >= $"fr_hits" && $"en_hits" >= $"de_hits", "en")
          .when($"es_hits" >= $"fr_hits" && $"es_hits" >= $"de_hits", "es")
          .when($"fr_hits" >= $"de_hits", "fr")
          .otherwise("de"))
      .select($"doc_id", $"lang", $"pred_lang", $"en_hits", $"es_hits", $"fr_hits", $"de_hits")
      .orderBy($"doc_id")
  }

  val q32Sql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
      |       WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
      |       WHEN fr_hits >= de_hits THEN 'fr'
      |       ELSE 'de' END AS pred_lang,
      |  en_hits, es_hits, fr_hits, de_hits
      |FROM (
      |  SELECT doc_id, lang,
      |    LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','and','of','is'], t))) AS en_hits,
      |    LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['el','la','de','que'], t))) AS es_hits,
      |    LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['le','la','et','les'], t))) AS fr_hits,
      |    LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['der','die','und','das'], t))) AS de_hits
      |  FROM (SELECT doc_id, lang, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Bag-of-words fingerprint (order-insensitive content hash) + exact
    * dedup on it: the fingerprint is the SUM of per-distinct-token 48-bit
    * hashes (md5 prefix), which is order-independent by commutativity —
    * no per-row `array_sort(array_distinct(...))` materialization (that
    * formulation cost 8.6 s at sf0.1: interpreted collection ops over
    * large token arrays). This shape is one codegen'd explode + two hash
    * aggs; at 100 TB only 8-byte hashes shuffle, never text. 48-bit token
    * hashes keep the sum < 2^63 under ANSI mode (≤ ~2^14 tokens/doc) and
    * make the construction reproducible in any engine with md5.
    */
  def q33FingerprintDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", explode(array_distinct(tokens($"text"))).as("tok"))
      .groupBy($"doc_id")
      .agg(sum(conv(substring(md5($"tok"), 1, 12), 16, 10).cast("long")).as("fp"),
        count(lit(1)).as("n_tokens"))
      .groupBy($"fp", $"n_tokens")
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_members"))
      .select($"fp", $"keeper_doc_id", $"n_members")
      .orderBy($"keeper_doc_id")
  }

  val q33Sql: String =
    """SELECT fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_members
      |FROM (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(CONCAT('0x', SUBSTRING(MD5(tok), 1, 12)) AS BIGINT)) AS BIGINT) AS fp,
      |    COUNT(*) AS n_tokens
      |  FROM (SELECT doc_id,
      |          UNNEST(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'))) AS tok
      |        FROM documents)
      |  GROUP BY doc_id)
      |GROUP BY fp, n_tokens
      |ORDER BY keeper_doc_id""".stripMargin

  /** Exact duplicate removal on raw text hash (the simplest dedup tier):
    * survivors only, with the duplicate count they absorbed.
    */
  def q34DedupExact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .groupBy(md5($"text").as("text_md5"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select($"doc_id", $"text_md5", $"n_copies")
      .orderBy($"doc_id")
  }

  val q34Sql: String =
    """SELECT MIN(doc_id) AS doc_id, MD5(text) AS text_md5, COUNT(*) AS n_copies
      |FROM documents GROUP BY MD5(text) ORDER BY doc_id""".stripMargin

  /** N-gram Jaccard near-dup pairs, blocked by `source` AND by rare
    * shingles: candidate pairs must share at least one shingle whose
    * within-source document frequency is in [2, 50]; candidates are then
    * re-verified with EXACT Jaccard over the full shingle sets.
    *
    * The df cap is the load-bearing scale decision: a naive
    * shingle-equality self-join blows up as Σ df² — on this corpus's
    * small vocabulary it produced tens of millions of intermediate pairs
    * (80 s at sf0.1); stop-shingles (df > 50) carry no discriminative
    * signal, so dropping them from CANDIDATE GENERATION (not from the
    * jaccard itself) bounds each bucket at 50² while reported scores stay
    * exact. Same standard trick as [[MinHashLsh.candidates]]' bucket cap.
    */
  def q35NgramJaccard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s) // shingle_hashes
    // Single-pass per-doc formulation: the corpus reduces to ONE compact
    // `(doc_id, source, hs)` relation — per-doc distinct shingle hashes
    // from the fused [[graft.functions.ShingleHashes]] kernel (scan →
    // project, no shuffle; bit-parity with the explodedShingles pipeline
    // asserted in ShingleHashesSpec), counts via `size(hs)`. The
    // repartition + localCheckpoint is the materialization point: the
    // broadcast GATE below reads a bounded scalar before the verify
    // plan exists, splitting the pipeline into separate jobs, and
    // across jobs there is no ReuseExchange — the checkpoint is what
    // keeps the corpus scan + kernel at exactly one execution (the
    // round-1 recompute cost 24.5 s at sf0.1 from 5 references).
    //
    // The exact verify is the codegen'd `sorted_intersect_count` merge
    // walk on the sorted 64-bit hash arrays instead of a shingle-level
    // join: per-candidate-pair O(|doc|) primitive work, no extra
    // shuffle, no per-row boxing (array_intersect builds a boxed hash
    // set per ROW — measured ~37 µs/pair, over half of q56's wall).
    // Collision risk per pair ≈ n_a·n_b/2^64 ≈ 1e-15.
    // At 100 TB the per-doc array is the same order as the text column
    // itself, so the one shuffle is no heavier than shuffling the corpus.
    val perDoc = documents(s, d)
      .filter($"doc_id".isNotNull && $"source".isNotNull)
      .select($"doc_id", $"source",
        call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .localCheckpoint()
    // df-capped blocking WITHOUT a hash-level self-join: collect the docs
    // sharing each rare hash (df ∈ [2,50], so ≤50 per bucket) and pair
    // them by double-explode — candidate generation touches the exploded
    // hash rows exactly once. collect_capped (not collect_list) bounds
    // the aggregation buffer at 51 members per hash: a stop-shingle
    // shared by millions of docs would otherwise materialize its whole
    // bucket in one buffer before the size filter could drop it.
    // Shared buckets (≥ 2 members) checkpoint — dup-mass-sized, ≤ 51
    // ids each — so the gate scalar and the pairing read one
    // materialization.
    val buckets = perDoc
      .select($"doc_id", $"source", explode($"hs").as("h"))
      .groupBy($"source", $"h")
      .agg(call_function("collect_capped", $"doc_id", lit(50)).as("docs"))
      .filter(size($"docs") >= 2)
      .localCheckpoint()
    // SIZE-GATED broadcasts (round-8 verdict item 2): the candidate
    // relation grows with corpus dup mass, not with the bucket cap, so
    // hint-forced broadcasts are a driver OOM at 100 TB percent-level
    // duplication. The gate measures a pair bound from the capped
    // bucket relation (one bounded scalar job); above the budget the
    // verify joins shuffle on the doc key with identical results.
    // Over-cap buckets here DROP by design (df-capped blocking's
    // documented bounded recall) — the OverCapDrop policy.
    val (_, pairBound) = bucketGate(buckets, "docs", 50)
    val cand = buckets.filter(size($"docs").between(2, 50))
      .select($"source", explode($"docs").as("doc_a"), $"docs")
      .select($"source", $"doc_a", explode($"docs").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .distinct()
    val maxBroadcastBytes = 64L << 20
    val candB = if (pairBound * 48L <= maxBroadcastBytes) broadcast(cand) else cand
    val verifyA = candB
      .join(perDoc.select($"source", $"doc_id".as("doc_a"), $"hs".as("hs_a")), Seq("source", "doc_a"))
    val decorated =
      if (estDecoratedBytes(s, perDoc, pairBound, maxBroadcastBytes) <= maxBroadcastBytes)
        broadcast(verifyA)
      else verifyA
    decorated
      .join(perDoc.select($"source", $"doc_id".as("doc_b"), $"hs".as("hs_b")), Seq("source", "doc_b"))
      .withColumn("common",
        call_function("sorted_intersect_count", $"hs_a", $"hs_b"))
      .withColumn("jaccard", $"common".cast("double") /
        (size($"hs_a") + size($"hs_b") - $"common"))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** [[prefixJaccardPairs]] over-cap policies: drop over-cap buckets
    * (bounded recall) vs re-route them through the distributed exact
    * tier (exact recall at any skew, no abort).
    */
  final val OverCapDrop = 0
  final val OverCapExact = 1

  /** All-pairs set-similarity SELF-JOIN with exact recall (Bayardo et
    * al. "Scaling Up All Pairs Similarity Search", WWW'07; Xiao et al.
    * PPJoin): candidates from PREFIX filtering, verification by exact
    * Jaccard. With each doc's element hashes globally SORTED, any pair
    * with J(A,B) ≥ τ shares its smallest common element within both
    * prefixes of length |X| − ⌈τ·|X|⌉ + 1 (if the smallest common
    * element c sat outside A's prefix, all |A∩B| ≥ ⌈τ|A|⌉ common
    * elements would fit in A's ⌈τ|A|⌉ − 1 post-prefix slots —
    * contradiction), so blocking on prefix elements then verifying is
    * recall-EXACT — unlike q35's df-capped blocking (bounded recall by
    * construction) or q36's MinHash banding (probabilistic recall
    * driven to 1 by tuning). The three queries are the engine's three
    * points on the recall/cost frontier.
    *
    * `perDoc` must be (idCol, hs) with hs sorted distinct hashes
    * (e.g. [[graft.functions.ShingleHashes]] output), pre-filtered
    * non-null/non-empty. It is localCheckpointed here: the broadcast
    * gate below reads a bounded scalar BEFORE the verify plan exists,
    * which splits the pipeline into separate jobs, and across jobs
    * there is no ReuseExchange — without the checkpoint every job
    * would recompute the corpus scan + shingle kernel.
    *
    * Hot prefix buckets are capped at `maxBucket` by `collect_capped` —
    * the house quadratic-bucket guard. Because dropping a bucket
    * silently breaks the recall-EXACT contract (SkewStressSpec
    * demonstrates true J = 1.0 clique pairs vanishing), `overCap`
    * picks the policy when the cap binds:
    *
    *  - [[TextOps.OverCapDrop]] (default) — over-cap buckets drop
    *    wholesale: the documented bounded-recall behavior for callers
    *    that want dup ACCOUNTING, not every pair of a boilerplate
    *    clique (a 45k-doc identical clique has ~10⁹ true pairs; a
    *    caller that can't consume 10⁹ rows shouldn't enumerate them).
    *  - [[TextOps.OverCapExact]] — over-cap buckets re-route through a
    *    DISTRIBUTED tier that keeps recall exact without the round-9
    *    abort (`failOnCapped`'s successor): the positional prefix
    *    relation (id, pos, |hs|) restricted to over-cap keys self-joins
    *    on the prefix element — a shuffle join whose within-key
    *    quadratic runs on executors, never the driver — pruned by the
    *    PPJoin length filter (J ≥ τ ⇒ τ·max(|a|,|b|) ≤ min(|a|,|b|))
    *    and positional filter (at a match on positions i, j: shared
    *    elements before it ≤ min(i,j), at/after it ≤ 1 +
    *    min(|a|−i−1, |b|−j−1); pruning when the sum can't reach the
    *    overlap bound ⌈τ(|a|+|b|)/(1+τ)⌉ is safe at EVERY match, so
    *    the pair always survives at its smallest common prefix
    *    element). Union with the capped tier, one distinct, same
    *    verify. Exactness: every J ≥ τ pair shares a prefix element
    *    whose bucket is either ≤ cap (array tier) or > cap (join
    *    tier).
    *
    * The verify joins are SIZE-GATED rather than hint-forced: the
    * candidate-pair relation decorated with full hash arrays grows
    * with corpus dup mass (not with the bucket cap), so an
    * unconditional broadcast is a driver OOM at 100 TB percent-level
    * duplication. The gate measures a pair-count bound from the capped
    * bucket relation (one bounded scalar job — the CC-fingerprint
    * discipline) and estimates decorated bytes via the mean hash-array
    * length; above `maxBroadcastBytes` the verify joins shuffle on the
    * doc key (the q56 discipline) with identical results. When the
    * exact tier is active the true pair count is UNKNOWABLE from the
    * capped relation (collect_capped truncates membership), so the
    * gate goes maximally conservative: no broadcast hints at all.
    */
  def prefixJaccardPairs(perDoc: DataFrame, idCol: String, tau: Double,
                         maxBucket: Int = 100,
                         overCap: Int = OverCapDrop,
                         maxBroadcastBytes: Long = 64L << 20,
                         inputMaterialized: Boolean = false): DataFrame = {
    val s = perDoc.sparkSession
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    // inputMaterialized: callers whose perDoc is already a (slice of a)
    // checkpoint (q37's shared base) skip the second materialization —
    // re-checkpointing a checkpointed projection copies every hash
    // array once more for nothing (measured 7 s of task time at sf0.1)
    val pd = if (inputMaterialized) perDoc else perDoc.localCheckpoint()
    val prefLen = (size(col("hs")) - ceil(size(col("hs")) * tau) + 1).cast("int")
    // shared-prefix buckets only (singletons pair nothing); bounded at
    // maxBucket+1 ids per bucket by collect_capped, so the checkpoint
    // is dup-mass-sized, never corpus-exploded
    val buckets = pd
      .select(col(idCol), explode(slice(col("hs"), lit(1), prefLen)).as("ph"))
      .groupBy($"ph")
      .agg(call_function("collect_capped", col(idCol), lit(maxBucket)).as("ids"))
      .filter(size($"ids") >= 2)
      .localCheckpoint()
    val (nCapped, pairBound) = bucketGate(buckets, "ids", maxBucket)
    val exactTier = overCap == OverCapExact && nCapped > 0
    val candUnder = buckets.filter(size($"ids").between(2, maxBucket))
      .select(explode($"ids").as("doc_a"), $"ids")
      .select($"doc_a", explode($"ids").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
    val cand = (if (!exactTier) candUnder else {
      // Over-cap keys are a projection of the checkpointed bucket
      // relation; the join is left unhinted — AQE sees the real
      // runtime shuffle sizes (checkpoints carry no planner stats)
      // and converts to broadcast when the key set is small.
      val overKeys = buckets.filter(size($"ids") > maxBucket).select($"ph")
      val pref = pd
        .select(col(idCol).as("id"), size(col("hs")).as("len"),
          posexplode(slice(col("hs"), lit(1), prefLen)).as(Seq("pos", "ph")))
        .join(overKeys, Seq("ph"))
      val candOver = pref
        .select($"ph", $"id".as("doc_a"), $"pos".as("pa"), $"len".as("la"))
        .join(pref.select($"ph", $"id".as("doc_b"), $"pos".as("pb"), $"len".as("lb")),
          Seq("ph"))
        .filter($"doc_a" < $"doc_b")
        .filter(least($"la", $"lb").cast("double") >= lit(tau) * greatest($"la", $"lb"))
        .filter((least($"pa", $"pb") + lit(1) +
            least($"la" - $"pa" - 1, $"lb" - $"pb" - 1)).cast("double") >=
          lit(tau / (1.0 + tau)) * ($"la" + $"lb") - lit(1e-9))
        .select($"doc_a", $"doc_b")
      candUnder.unionAll(candOver)
    }).distinct()
    // checkpointed inputs carry no stats, so the hints are the ONLY
    // broadcast signal — both are measured, not assumed: the bare pair
    // list at 48 B/row, the decorated relation at 48 + 8·mean|hs|.
    // Exact-tier pair counts are unbounded by the cap → never hint.
    val candB =
      if (!exactTier && pairBound * 48L <= maxBroadcastBytes) broadcast(cand) else cand
    val verifyA = candB
      .join(pd.select(col(idCol).as("doc_a"), $"hs".as("hs_a")), Seq("doc_a"))
    val decorated =
      if (!exactTier &&
          estDecoratedBytes(s, pd, pairBound, maxBroadcastBytes) <= maxBroadcastBytes)
        broadcast(verifyA)
      else verifyA
    decorated
      .join(pd.select(col(idCol).as("doc_b"), $"hs".as("hs_b")), Seq("doc_b"))
      .withColumn("common",
        call_function("sorted_intersect_count", $"hs_a", $"hs_b"))
      .withColumn("jaccard", $"common".cast("double") /
        (size($"hs_a") + size($"hs_b") - $"common"))
      .filter($"jaccard" >= tau)
      .select($"doc_a", $"doc_b", $"common", $"jaccard")
  }

  /** One bounded scalar job over a capped bucket relation: (number of
    * over-cap buckets — dropped wholesale by the `between` filter —
    * and an upper bound on candidate pairs from surviving buckets).
    * Σ C(|bucket|, 2) over-counts the DISTINCT pair set (a pair seen
    * in k buckets counts k times) — a safe over-estimate for a
    * broadcast gate.
    */
  private[operators] def bucketGate(buckets: DataFrame, idsCol: String,
                                    maxBucket: Int): (Long, Long) = {
    val n = size(col(idsCol)).cast("long")
    // n·(n−1) summed as exact int64 (`/` would promote to double);
    // halved on the driver
    val r = buckets.agg(
      coalesce(sum(when(n > maxBucket, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(n <= maxBucket, n * (n - 1L)).otherwise(0L)), lit(0L))).head()
    (r.getLong(0), r.getLong(1) / 2L)
  }

  /** Estimated bytes of the candidate relation once decorated with one
    * full hash array per pair (mean array length from one 1-row agg on
    * the checkpointed per-doc relation, skipped when the bare pair
    * bound alone already exceeds the budget). 48 B of row overhead per
    * pair, 8 B per hash.
    */
  private[operators] def estDecoratedBytes(s: SparkSession, pd: DataFrame,
                                           pairBound: Long, budget: Long): Long = {
    if (pairBound * 48L > budget) return Long.MaxValue
    val avgLen = pd.agg(coalesce(avg(size(col("hs"))), lit(0.0))).head().getDouble(0)
    (pairBound * (48.0 + avgLen * 8.0)).toLong
  }

  /** q134 — the all-pairs join as a first-class query at τ = 0.7: the
    * EXACT-recall dedup path (every pair the brute-force oracle finds,
    * none it doesn't) at ~20% of the exploded rows and zero signature
    * machinery. The corpus is scanned once into the checkpoint inside
    * [[prefixJaccardPairs]]; `OverCapExact` makes the recall-exact
    * claim UNCONDITIONAL — a corpus whose prefix buckets overflow the
    * quadratic guard re-routes those buckets through the distributed
    * exact tier instead of silently hash-mismatching the brute-force
    * oracle (round 9's fail-loud abort, made scale-safe).
    */
  def q134AllPairsJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val perDoc = documents(s, d)
      .filter($"doc_id".isNotNull)
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
    prefixJaccardPairs(perDoc, "doc_id", 0.7, overCap = OverCapExact)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Brute-force exact-Jaccard oracle at τ = 0.7 (the q36 oracle's
    * chain; the oracle may be quadratic — it checks answers at
    * verification scale).
    */
  val q134Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL)
      |), ex AS (
      |  SELECT doc_id, UNNEST(sh) AS shingle FROM docs WHERE LEN(sh) > 0
      |), sz AS (
      |  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id
      |), cm AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
      |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
      |FROM cm JOIN sz sa ON sa.doc_id = cm.doc_a JOIN sz sb ON sb.doc_id = cm.doc_b
      |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.7
      |ORDER BY doc_a, doc_b""".stripMargin

  val q35Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, source, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks FROM documents)
      |), ex AS (
      |  SELECT doc_id, source, UNNEST(sh) AS shingle FROM docs
      |), rare AS (
      |  SELECT source, shingle FROM ex GROUP BY source, shingle
      |  HAVING COUNT(*) BETWEEN 2 AND 50
      |), rare_ex AS (
      |  SELECT e.doc_id, e.source, e.shingle
      |  FROM ex e JOIN rare r ON e.source = r.source AND e.shingle = r.shingle
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM rare_ex a JOIN rare_ex b
      |    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, common,
      |  CAST(common AS DOUBLE) / (n_a + n_b - common) AS jaccard
      |FROM (
      |  SELECT c.doc_a, c.doc_b,
      |    LEN(LIST_FILTER(da.sh, x -> LIST_CONTAINS(db.sh, x))) AS common,
      |    LEN(da.sh) AS n_a, LEN(db.sh) AS n_b
      |  FROM cand c
      |  JOIN docs da ON da.doc_id = c.doc_a
      |  JOIN docs db ON db.doc_id = c.doc_b)
      |WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Winnowing (rolling-hash) document-fingerprint near-dup pairs — the
    * character-level dedup tier (Schleimer et al., SIGMOD'03; MOSS). The
    * selection itself is the fused codegen'd
    * [[graft.functions.WinnowFps]] kernel (true O(1)-slide base-31
    * polynomial over char 8-grams + monotonic-deque window-of-4 minima)
    * — scan → project, NO shuffle; the corpus reduces to one compact
    * `(doc_id, fps)` relation exactly like q35/q36's shingle pipeline.
    *
    * Pairing reuses the df-capped blocking shape: fingerprints shared by
    * 2–50 docs form buckets (collect_capped bounds hot boilerplate
    * buckets), pairs are scored by Jaccard over the full fingerprint
    * SETS (sizes via `size(fps)` from the same reused exchange). The
    * base-31 hash is exact portable integer math, so the DuckDB oracle
    * reproduces every fingerprint bit-for-bit — a full hash-checked
    * row, unlike the xxhash64-based q36/q37 tiers.
    */
  def q56WinnowFingerprint(s: SparkSession, d: String): DataFrame =
    winnowNearDupPairs(documents(s, d))

  /** q56's pipeline over an arbitrary (doc_id, text, …) relation — the
    * near-dup edge stage q59 and q78 compose.
    *
    * Blocking generates CANDIDATES only; similarity is verified over the
    * FULL fingerprint sets (q35's split exactly). The earlier form
    * counted n_shared over the df∈[2,50] blocked fingerprints
    * themselves, which silently under-reports similarity as the corpus
    * grows — at sf0.1 every fingerprint of a true duplicate pair above
    * df 50 vanished from the count and recall collapsed to ZERO (the
    * pair 932/4556 shares all 158 fingerprints, sim 1.0, and was
    * reported at sim < 0.4). At 100 TB virtually all fingerprints
    * exceed any fixed df cap, so the conflated form finds nothing; the
    * split form's recall is independent of corpus size (any pair
    * sharing ≥1 rare fingerprint verifies exactly).
    */
  def winnowNearDupPairs(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    graft.plans.GraftExtensions.register(s) // winnow_fps, collect_capped
    // Round 9: the q35/q36 GATED shape. The raw text repartitions
    // first, the kernel runs post-exchange, and the localCheckpoint is
    // the materialization point every branch reads — with a checkpoint
    // (unlike the old exchange-reuse discipline) consumers read
    // computed arrays, so kernel-after-exchange no longer re-evaluates
    // per consumer, the exchange carries text once instead of ~2× its
    // volume in fingerprint arrays, and the kernel parallelizes past
    // the single small-SF parquet split. The EXPLICIT partition count
    // still matters: a bare repartition lets AQE coalesce the tiny
    // post-shuffle relation to ONE partition and serialize every
    // downstream per-doc stage (measured 2.96 → 2.07 s on q56 in the
    // reuse era; same physics applies to the checkpoint).
    val perDoc = documents
      .filter($"doc_id".isNotNull)
      .select($"doc_id", $"text")
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", call_function("winnow_fps", $"text", lit(8), lit(4)).as("fps"))
      .filter($"fps".isNotNull && size($"fps") > 0)
      .localCheckpoint()
    // df-capped CANDIDATE blocking (collect_capped bounds hot
    // boilerplate buckets at 51 before the size filter drops them);
    // shared buckets (≥ 2 members) checkpoint so the gate scalar and
    // the pairing read one materialization
    val buckets = perDoc.select($"doc_id", explode($"fps").as("fp"))
      .groupBy($"fp")
      .agg(call_function("collect_capped", $"doc_id", lit(50)).as("docs"))
      .filter(size($"docs") >= 2)
      .localCheckpoint()
    // SIZE-GATED bare-pair broadcast (the q35/q36 discipline applied to
    // the winnow tier — the candidate pair count grows with corpus dup
    // mass, not with the bucket cap, so even two-longs-per-row
    // broadcasts need a measured bound): under the 64 MB budget the
    // pair list broadcasts; over it the verify joins shuffle on the doc
    // key with identical results. The DECORATED relation never
    // broadcasts here (candidates × fingerprint arrays — 300 MB at
    // sf0.1).
    val (_, pairBound) = bucketGate(buckets, "docs", 50)
    val cand = buckets.filter(size($"docs").between(2, 50))
      .select(explode($"docs").as("doc_a"), $"docs")
      .select($"doc_a", explode($"docs").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .distinct()
    val candB = if (pairBound * 48L <= (64L << 20)) broadcast(cand) else cand
    // exact verify: winnow_fps arrays are sorted-distinct, so the
    // merge-walk count IS the distinct shared-fingerprint count.
    candB
      .join(perDoc.select($"doc_id".as("doc_a"), $"fps".as("fps_a")), Seq("doc_a"))
      .join(perDoc.select($"doc_id".as("doc_b"), $"fps".as("fps_b")), Seq("doc_b"))
      .withColumn("n_shared",
        call_function("sorted_intersect_count", $"fps_a", $"fps_b"))
      .withColumn("sim", $"n_shared".cast("double") /
        (size($"fps_a") + size($"fps_b") - $"n_shared"))
      .filter($"sim" >= 0.4)
      .select($"doc_a", $"doc_b", $"n_shared", $"sim")
      .orderBy($"doc_a", $"doc_b")
  }

  /** The oracle rebuilds the identical fingerprints relationally: LEAD
    * windows form each 8-gram's base-31 polynomial (same exact integer
    * values as the kernel's rolling form), MIN OVER a 4-row window
    * selects, the COUNT qualify keeps complete windows only.
    */
  val q56Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, TRIM(LOWER(text)) AS t FROM documents WHERE doc_id IS NOT NULL
      |), ch0 AS (
      |  SELECT doc_id, t, UNNEST(RANGE(1, LEN(t) + 1)) AS i FROM docs
      |), ch AS (
      |  SELECT doc_id, i, CAST(ORD(SUBSTRING(t, i, 1)) AS BIGINT) AS c FROM ch0
      |), grams AS (
      |  SELECT doc_id, i AS p,
      |    c*27512614111 + LEAD(c,1) OVER w * 887503681 + LEAD(c,2) OVER w * 28629151
      |    + LEAD(c,3) OVER w * 923521 + LEAD(c,4) OVER w * 29791
      |    + LEAD(c,5) OVER w * 961 + LEAD(c,6) OVER w * 31 + LEAD(c,7) OVER w AS gh
      |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY LEAD(c,7) OVER w IS NOT NULL
      |), sel AS (
      |  SELECT DISTINCT doc_id,
      |    MIN(gh) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM grams
      |  QUALIFY COUNT(gh) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) = 4
      |), nfp AS (
      |  SELECT doc_id, COUNT(*) AS n FROM sel GROUP BY 1
      |), buckets AS (
      |  SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 50
      |), fpx AS (
      |  SELECT s.doc_id, s.fp FROM sel s JOIN buckets b USING (fp)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |), shared AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
      |  FROM cand c JOIN sel sa ON sa.doc_id = c.doc_a
      |               JOIN sel sb ON sb.doc_id = c.doc_b AND sb.fp = sa.fp
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, n_shared,
      |  CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared) AS sim
      |FROM shared JOIN nfp na ON na.doc_id = doc_a JOIN nfp nb ON nb.doc_id = doc_b
      |WHERE CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared) >= 0.4
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Top-3 TF-IDF terms per document — the relevance/keyword-extraction
    * stage of a corpus pipeline. Shape: one exploded-token pass → per-
    * (doc, token) TF aggregate (map-side partial) → token-keyed document
    * frequency derived FROM the TF relation (no second corpus scan) →
    * per-doc top-3 window (doc_id partitioning: full parallelism).
    *
    * The idf factor is the RATIONAL variant n_docs/df scaled to ppm and
    * computed in exact int64 arithmetic (`div`): the classic log-idf
    * would make the score depend on each engine's libm `log` rounding,
    * breaking the bit-exact cross-engine oracle (same policy as q27's
    * deliberate transcendental-free scalar pack). Overflow headroom:
    * tf·10^6·n_docs < 2^63 holds up to ~9·10^12 doc·token occurrences.
    */
  def q57TfidfTerms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val tf = docs
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score_ppm".desc, $"term")
    // dfreq broadcasts: a shuffle join keyed on the raw term would send
    // every occurrence-row of a stopword to ONE partition — the classic
    // hot-key skew. The df relation is vocabulary-sized (distinct terms,
    // bounded here by the fold/split normalization); an unbounded-vocab
    // web corpus would keep the shuffle join and lean on AQE skew-join
    // splitting plus a df floor that drops hapax terms before the join.
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score_ppm", expr("(tf * 1000000 * n_docs) div df"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"doc_id", $"rn", $"term", $"tf", $"df", $"score_ppm")
      .orderBy($"doc_id", $"rn")
  }

  val q57Sql: String =
    """WITH ex AS (
      |  SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2
      |), dfq AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |), sel AS (
      |  SELECT doc_id, term, tf, df, (tf * 1000000 * n_docs) // df AS score_ppm,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |                       ORDER BY (tf * 1000000 * n_docs) // df DESC, term) AS rn
      |  FROM tf JOIN dfq USING (term) CROSS JOIN n
      |)
      |SELECT doc_id, rn, term, tf, df, score_ppm
      |FROM sel WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  /** Deterministic stratified sampling — the corpus-rebalancing stage of
    * a training-data pipeline (e.g. downsample over-represented
    * languages). Each doc maps to a stable per-mille bucket via a
    * multiplicative (Knuth) hash in exact int64 arithmetic — portable
    * across engines and executors, unlike `rand()` or engine hash
    * functions — and survives iff bucket < its language's quota from a
    * broadcast rates dimension. Pure map + broadcast join: no shuffle,
    * restartable, and the same doc always lands in the same split.
    * (`doc_id % 1000003` keeps the product < 2^63 for any int64 id —
    * ANSI mode would throw on a silent overflow.)
    */
  def q58StratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("en", 200L), ("zh", 500L), ("es", 500L), ("de", 800L), ("fr", 800L))
      .toDF("lang", "rate_pm")
    documents(s, d)
      .withColumn("bucket", expr("((doc_id % 1000003) * 2654435761) % 1000"))
      .join(broadcast(rates), Seq("lang"))
      .filter($"bucket" < $"rate_pm")
      .select($"doc_id", $"lang", $"source", $"n_chars", $"bucket")
      .orderBy($"doc_id")
  }

  val q58Sql: String =
    """WITH rates AS (
      |  SELECT * FROM (VALUES ('en', 200), ('zh', 500), ('es', 500),
      |                        ('de', 800), ('fr', 800)) AS t(lang, rate_pm)
      |)
      |SELECT doc_id, lang, source, n_chars,
      |  ((doc_id % 1000003) * 2654435761) % 1000 AS bucket
      |FROM documents JOIN rates USING (lang)
      |WHERE ((doc_id % 1000003) * 2654435761) % 1000 < rate_pm
      |ORDER BY doc_id""".stripMargin

  /** Near-dup CLUSTERS — the step after pairwise dedup candidates that
    * every real pipeline needs: similarity pairs are not transitive, so
    * keeping "one of each pair" over-deletes; the unit of dedup is the
    * connected component. Edges are q56's winnow-fingerprint near-dup
    * pairs (sim ≥ 0.4) — the two queries compose exactly as the
    * production pipeline would chain them. The component label (min
    * doc_id reachable) comes from iterative min-label propagation —
    * each round one join + one min-aggregate, shuffles keyed on doc id,
    * rounds bounded by component diameter (near-dup clusters are
    * shallow; an adversarial long-chain graph would switch to the
    * large-star/small-star variant [Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14] — same primitive,
    * provably O(log²) rounds). The driver loop only reads a 1-row
    * convergence aggregate per round — the label state itself never
    * leaves the cluster; at production scale each round's labels would
    * be checkpointed to truncate lineage. Oracle: DuckDB recursive-CTE
    * transitive closure over the same pairs, min reachable id per node.
    */
  def q59DedupClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = q56WinnowFingerprint(s, d).select($"doc_a", $"doc_b")
    ConnectedComponents.labels(s, edges, "doc_a", "doc_b")
      .select($"component".as("cluster_id"), $"node".as("doc_id"))
      .orderBy($"cluster_id", $"doc_id")
  }

  // q56's full SQL embeds as a CTE body (DuckDB allows a nested WITH
  // inside a CTE), so the edge construction literally IS q56's oracle
  val q59Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |${q56Sql.linesIterator.map("  " + _).mkString("\n")}
       |), sym AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
       |), r(u, v) AS (
       |  SELECT u, u FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM r JOIN sym s ON r.v = s.u
       |)
       |SELECT MIN(v) AS cluster_id, u AS doc_id
       |FROM r GROUP BY u
       |ORDER BY cluster_id, doc_id""".stripMargin

  /** q100 — INCREMENTAL near-dup: dedup a new batch against the
    * existing corpus without re-pairing the corpus against itself. The
    * production posture at 100 TB: a daily increment is ~10⁻³ of the
    * lake, and re-running q56 corpus-wide per day is quadratic waste —
    * here candidate blocking is restricted to fingerprints that occur
    * in a NEW document (semi join on the increment's fp set), and
    * corpus×corpus pairs are filtered out, so pairing cost scales with
    * increment size. Verification is q56's full-set exact intersect.
    * The (fp → capped docs) bucket relation is exactly what a
    * production pipeline would maintain as a persistent index; built
    * here from the same scan for oracle parity.
    */
  def q100DedupIncrement(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val perDoc = documents(s, d)
      .filter($"doc_id".isNotNull)
      .select($"doc_id", $"text")
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", ($"doc_id" % 10 === 0).as("is_new"),
        call_function("winnow_fps", $"text", lit(8), lit(4)).as("fps"))
      .filter($"fps".isNotNull && size($"fps") > 0)
      .localCheckpoint() // the q56 gated-shape materialization point
    // "fp occurs in a new document" ⇔ "the capped bucket has a new
    // member" — testing the collected structs keeps candidate
    // generation to one pass over the exploded relation; a production
    // deployment with increment ≪ corpus would swap this for a probe
    // of its persistent fp index
    val buckets = perDoc.select($"doc_id", $"is_new", explode($"fps").as("fp"))
      .groupBy($"fp")
      .agg(call_function("collect_capped", struct($"doc_id", $"is_new"), lit(50)).as("docs"))
      .filter(size($"docs") >= 2)
      .localCheckpoint()
    val (_, pairBound) = bucketGate(buckets, "docs", 50)
    val cand = buckets
      .filter(size($"docs").between(2, 50) &&
        exists($"docs", x => x("is_new")))
      .select(explode($"docs").as("a"), $"docs")
      .select($"a", explode($"docs").as("b"))
      .filter($"a.doc_id" < $"b.doc_id" && ($"a.is_new" || $"b.is_new"))
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    // size-gated bare-pair broadcast (the q56 discipline; identical
    // results on the shuffle path)
    val candB = if (pairBound * 48L <= (64L << 20)) broadcast(cand) else cand
    candB
      .join(perDoc.select($"doc_id".as("doc_a"), $"is_new".as("new_a"),
        $"fps".as("fps_a")), Seq("doc_a"))
      .join(perDoc.select($"doc_id".as("doc_b"), $"is_new".as("new_b"),
        $"fps".as("fps_b")), Seq("doc_b"))
      .withColumn("n_shared",
        call_function("sorted_intersect_count", $"fps_a", $"fps_b"))
      .withColumn("sim", $"n_shared".cast("double") /
        (size($"fps_a") + size($"fps_b") - $"n_shared"))
      // candidate generation already guarantees a new member; restating
      // it here keeps new_a/new_b ALIVE in the verify branches so their
      // pruned column set equals the candidate branch's and the one
      // perDoc exchange is reused (Catalyst cannot prove the redundancy)
      .filter(($"new_a" || $"new_b") && $"sim" >= 0.4)
      .select($"doc_a", $"doc_b", $"n_shared", $"sim")
      .orderBy($"doc_a", $"doc_b")
  }

  val q100Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, TRIM(LOWER(text)) AS t, (doc_id % 10 = 0) AS is_new
      |  FROM documents WHERE doc_id IS NOT NULL
      |), ch0 AS (
      |  SELECT doc_id, t, UNNEST(RANGE(1, LEN(t) + 1)) AS i FROM docs
      |), ch AS (
      |  SELECT doc_id, i, CAST(ORD(SUBSTRING(t, i, 1)) AS BIGINT) AS c FROM ch0
      |), grams AS (
      |  SELECT doc_id, i AS p,
      |    c*27512614111 + LEAD(c,1) OVER w * 887503681 + LEAD(c,2) OVER w * 28629151
      |    + LEAD(c,3) OVER w * 923521 + LEAD(c,4) OVER w * 29791
      |    + LEAD(c,5) OVER w * 961 + LEAD(c,6) OVER w * 31 + LEAD(c,7) OVER w AS gh
      |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY LEAD(c,7) OVER w IS NOT NULL
      |), sel AS (
      |  SELECT DISTINCT doc_id,
      |    MIN(gh) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM grams
      |  QUALIFY COUNT(gh) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) = 4
      |), nfp AS (SELECT doc_id, COUNT(*) AS n FROM sel GROUP BY 1
      |), newfp AS (
      |  SELECT DISTINCT s.fp FROM sel s JOIN docs d USING (doc_id) WHERE d.is_new
      |), buckets AS (
      |  SELECT s.fp FROM sel s JOIN newfp nf USING (fp)
      |  GROUP BY s.fp HAVING COUNT(*) BETWEEN 2 AND 50
      |), fpx AS (SELECT s.doc_id, s.fp FROM sel s JOIN buckets b USING (fp)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM fpx a JOIN fpx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  JOIN docs da ON da.doc_id = a.doc_id JOIN docs db ON db.doc_id = b.doc_id
      |  WHERE da.is_new OR db.is_new
      |), shared AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
      |  FROM cand c JOIN sel sa ON sa.doc_id = c.doc_a
      |               JOIN sel sb ON sb.doc_id = c.doc_b AND sb.fp = sa.fp
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, n_shared,
      |  CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared) AS sim
      |FROM shared JOIN nfp na ON na.doc_id = doc_a JOIN nfp nb ON nb.doc_id = doc_b
      |WHERE CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared) >= 0.4
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q150 — cross-source duplication MATRIX: for every ordered source
    * pair (source of the smaller doc_id first), how many exact-recall
    * near-dup pairs (τ = 0.7, the q134 prefix-filter join) cross it,
    * and how many are byte-level identical (J = 1). This is the
    * curation dashboard question behind source mixing — "how much of
    * source B is already in source A" decides dedup ordering and
    * mixture weights (the RefinedWeb/Dolma-style per-source dedup
    * accounting).
    *
    * Scale shape: the pair relation is [[prefixJaccardPairs]]'
    * survivor set, localCheckpointed (it feeds two joins and one count)
    * and broadcast into the pruned (doc_id, source) joins ONLY under a
    * measured size gate — the survivor set grows with corpus dup mass
    * (percent-level duplication at 100 TB is billions of pairs), so an
    * unconditional hint here is a driver OOM, the exact class the
    * size-gating discipline exists for. Above the budget the two joins
    * shuffle on the doc key against the 2-column source projection —
    * identical results. The rollup is a partial+final agg on the
    * ≤|sources|² key space either way.
    */
  def q150CrossSourceDups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val docs = documents(s, d).filter($"doc_id".isNotNull && $"source".isNotNull)
    val perDoc = docs
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter($"hs".isNotNull && size($"hs") > 0)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
    val pairs = prefixJaccardPairs(perDoc, "doc_id", 0.7, overCap = OverCapExact)
      .select($"doc_a", $"doc_b", $"jaccard")
      .localCheckpoint()
    // ~40 B/row (two int64 keys + a double + row overhead); one bounded
    // scalar count over the checkpointed survivor set decides the hint.
    val pairsGated =
      if (pairs.count() * 40L <= (64L << 20)) broadcast(pairs) else pairs
    val src = docs.select($"doc_id", $"source")
    pairsGated
      .join(src.select($"doc_id".as("doc_a"), $"source".as("source_a")), Seq("doc_a"))
      .join(src.select($"doc_id".as("doc_b"), $"source".as("source_b")), Seq("doc_b"))
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"jaccard" >= 1.0, 1L).otherwise(0L)).as("n_exact"))
      .orderBy($"source_a", $"source_b")
  }

  val q150Sql: String =
    """WITH d0 AS (
      |  SELECT doc_id, source,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, source, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL)
      |), ex AS (
      |  SELECT doc_id, UNNEST(sh) AS shingle FROM d0 WHERE LEN(sh) > 0
      |), sz AS (
      |  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id
      |), cm AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
      |  FROM cm JOIN sz sa ON sa.doc_id = cm.doc_a JOIN sz sb ON sb.doc_id = cm.doc_b
      |  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.7
      |)
      |SELECT da.source AS source_a, db.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN jaccard >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
      |FROM pairs JOIN d0 da ON da.doc_id = pairs.doc_a
      |           JOIN d0 db ON db.doc_id = pairs.doc_b
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_text_stats" -> (q30TextStats _),
    "q31_quality_score" -> (q31QualityScore _),
    "q32_lang_id" -> (q32LangId _),
    "q33_fingerprint_dedup" -> (q33FingerprintDedup _),
    "q34_dedup_exact" -> (q34DedupExact _),
    "q35_ngram_jaccard" -> (q35NgramJaccard _),
    "q56_winnow_fingerprint" -> (q56WinnowFingerprint _),
    "q57_tfidf_terms" -> (q57TfidfTerms _),
    "q58_stratified_sample" -> (q58StratifiedSample _),
    "q59_dedup_clusters" -> (q59DedupClusters _),
    "q100_dedup_increment" -> (q100DedupIncrement _),
    "q134_allpairs_join" -> (q134AllPairsJoin _),
    "q150_cross_source_dups" -> (q150CrossSourceDups _),
  )

  val oracles: Map[String, String] = Map(
    "q30_text_stats" -> q30Sql,
    "q31_quality_score" -> q31Sql,
    "q32_lang_id" -> q32Sql,
    "q33_fingerprint_dedup" -> q33Sql,
    "q34_dedup_exact" -> q34Sql,
    "q35_ngram_jaccard" -> q35Sql,
    "q56_winnow_fingerprint" -> q56Sql,
    "q57_tfidf_terms" -> q57Sql,
    "q58_stratified_sample" -> q58Sql,
    "q59_dedup_clusters" -> q59Sql,
    "q100_dedup_increment" -> q100Sql,
    "q134_allpairs_join" -> q134Sql,
    "q150_cross_source_dups" -> q150Sql,
  )
}
