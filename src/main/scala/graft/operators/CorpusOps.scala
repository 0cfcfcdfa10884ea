package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Corpus-hygiene operators over `documents` — the per-document quality
  * signals and normalizations an LLM training-data pipeline applies
  * before dedup/sampling (Gopher-style repetition ratios, corpus n-gram
  * statistics, C4-style text scrubbing).
  *
  * Scale posture (100 TB): q71/q73 are pure per-row maps — zero shuffle,
  * embarrassingly parallel; q72 is the bounded explodedShingles path
  * (shuffles scale with corpus size, top-k finishes in a
  * TakeOrderedAndProject, never a global sort). Tokenization is the
  * pipeline-wide [[TextOps.tokens]] contract (ASCII fold + `\s+` split,
  * trailing-empty-token semantics included) so signals compose with the
  * dedup operators over identical token streams.
  */
object CorpusOps {

  /** Repetition-based quality signals per document [Gopher, Rae et al.
    * 2021 §A1.1]: duplicate-token and duplicate-bigram fractions, in
    * exact parts-per-million (integer arithmetic — no float division to
    * hash-mismatch on). High duplicate fractions mark boilerplate /
    * degenerate text for downstream filtering.
    *
    * Distinct-bigram counts ride the codegen'd
    * [[graft.functions.ShingleHashes]] kernel (one fused pass per row)
    * rather than an interpreted array-lambda chain; it counts distinct
    * 64-bit shingle hashes, so a same-doc collision would undercount by
    * one — P < n²·2⁻⁶⁵ per doc, zero observed across the corpus (the
    * exact-string oracle would flag any). Unigram distincts use the
    * codegen'd `array_distinct` directly. NO shuffle anywhere.
    */
  def q71RepetitionSignals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks: Column = TextOps.tokens($"text")
    // Fanout.widen: see q73.
    Fanout.widen(documents(s, d), $"doc_id")
      .select($"doc_id",
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        greatest(size(toks) - 1, lit(0)).cast("long").as("n_bigrams"),
        size(call_function("shingle_hashes", $"text", lit(2)))
          .cast("long").as("n_distinct_bigrams"))
      .withColumn("dup_token_ppm",
        expr("(n_tokens - n_distinct_tokens) * 1000000 DIV n_tokens"))
      .withColumn("dup_bigram_ppm",
        when($"n_bigrams" === 0, 0L).otherwise(
          expr("(n_bigrams - n_distinct_bigrams) * 1000000 DIV n_bigrams")))
      .orderBy($"doc_id")
  }

  val q71Sql: String =
    """WITH t AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, LEN(toks) AS nt, LEN(LIST_DISTINCT(toks)) AS nd,
      |    LIST_TRANSFORM(RANGE(1, LEN(toks)),
      |                   i -> toks[i] || ' ' || toks[i+1]) AS bg
      |  FROM t
      |)
      |SELECT doc_id,
      |  CAST(nt AS BIGINT) AS n_tokens,
      |  CAST(nd AS BIGINT) AS n_distinct_tokens,
      |  CAST(LEN(bg) AS BIGINT) AS n_bigrams,
      |  CAST(LEN(LIST_DISTINCT(bg)) AS BIGINT) AS n_distinct_bigrams,
      |  CAST((nt - nd) * 1000000 // nt AS BIGINT) AS dup_token_ppm,
      |  CAST(CASE WHEN LEN(bg) = 0 THEN 0
      |            ELSE (LEN(bg) - LEN(LIST_DISTINCT(bg))) * 1000000 // LEN(bg)
      |       END AS BIGINT) AS dup_bigram_ppm
      |FROM b ORDER BY doc_id""".stripMargin

  /** Corpus-level n-gram statistics: the 25 trigrams appearing in the
    * most documents (document frequency, not raw occurrences — the
    * boilerplate detector: a trigram shared by thousands of documents is
    * template text). Rides [[TextOps.explodedShingles]] (codegen'd
    * posexplode + lead shape, distinct per doc) into a partial+final
    * count aggregate keyed on the shingle — vocabulary-bounded, map-side
    * combine absorbs the corpus scale — and a TakeOrderedAndProject
    * top-k (no global sort). Deterministic tie-break: count desc, then
    * shingle asc.
    */
  def q72NgramTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextOps.explodedShingles(documents(s, d), Seq("doc_id"), "text", 3)
      .groupBy($"shingle").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"shingle").limit(25)
  }

  val q72Sql: String =
    """WITH t AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents
      |), g AS (
      |  SELECT DISTINCT doc_id,
      |    UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM t
      |)
      |SELECT shingle, COUNT(*) AS df FROM g
      |GROUP BY shingle ORDER BY df DESC, shingle LIMIT 25""".stripMargin

  /** C4-style text scrub [Raffel et al. 2020 §2.2]: drop stopwords, then
    * collapse consecutive repeated tokens (the run-dedup that kills
    * "spam spam spam" degeneracy), re-emitting cleaned text plus
    * before/after counts. Pure per-row map — zero shuffle.
    *
    * The run-collapse avoids the O(tokens²)-per-row trap: referencing
    * the kept-array by index inside a lambda (`element_at(kept, i)`)
    * re-evaluates the whole array expression per ELEMENT (Catalyst
    * inlines, HOFs interpret). Instead `zip_with(kept, null ⧺ kept)`
    * aligns each token with its predecessor in one O(n) pass — the
    * padded copy shifts indices by one, the zip's tail null is filtered
    * with the collapsed runs.
    */
  def q73TextScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fanout.widen: on a single-split scan the scrub kernel would run
    // TWICE on one core (the final sort's range-sampling pass re-executes
    // the un-materialized map child, then the shuffle write runs it
    // again); widening materializes a stage below the sort and spreads
    // both kernel passes across the session. Identity on any multi-split
    // real scan — a pure map never shuffles the corpus at scale.
    scrubbed(Fanout.widen(documents(s, d), $"doc_id"))
      .select($"doc_id", $"n_tokens", $"n_kept", $"n_collapsed", $"clean_text")
      .orderBy($"doc_id")
  }

  /** q73's scrub columns as a reusable stage (q78 composes it): adds
    * n_tokens / n_kept / n_collapsed / clean_text to `docs`; pure map.
    */
  def scrubbed(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks: Column = TextOps.tokens($"text")
    val kept = filter(toks, t => !(t === "a" || t === "the"))
    val prevPad = concat(array(lit(null).cast("string")), kept)
    val collapsed = filter(
      zip_with(kept, prevPad,
        (cur, prev) => when(cur.isNotNull && (prev.isNull || cur =!= prev), cur)),
      x => x.isNotNull)
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("n_collapsed", size(collapsed).cast("long"))
      .withColumn("clean_text", concat_ws(" ", collapsed))
  }

  val q73Sql: String =
    """WITH t AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents
      |), k AS (
      |  SELECT doc_id, toks,
      |    LIST_FILTER(toks, x -> x NOT IN ('a', 'the')) AS kept FROM t
      |), c AS (
      |  SELECT doc_id, toks, kept,
      |    LIST_FILTER(kept, (x, i) -> i = 1 OR x <> kept[i-1]) AS collapsed
      |  FROM k
      |)
      |SELECT doc_id,
      |  CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |  CAST(LEN(kept) AS BIGINT) AS n_kept,
      |  CAST(LEN(collapsed) AS BIGINT) AS n_collapsed,
      |  ARRAY_TO_STRING(collapsed, ' ') AS clean_text
      |FROM c ORDER BY doc_id""".stripMargin

  /** Document chunking — overlapping token windows (size 64, stride 48),
    * the context-window segmentation step of a pretraining/RAG pipeline.
    * Pure map + explode: chunk count and slices derive per row from the
    * token array; no shuffle but the final sort. Chunk math: n_chunks =
    * ceil(max(n_tokens − overlap, 1) / stride), chunk k covers tokens
    * [k·stride, k·stride + size) clamped to the doc — identical integer
    * arithmetic and list-slice clamping in both engines.
    */
  def q81DocChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val size = 64
    val stride = 48 // = size − overlap(16)
    // Fanout.widen: see q73.
    Fanout.widen(documents(s, d).filter($"doc_id".isNotNull), $"doc_id")
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("n_tokens", org.apache.spark.sql.functions.size($"toks").cast("long"))
      .withColumn("n_chunks",
        expr(s"(greatest(n_tokens - 16, 1L) + ${stride - 1}) div $stride"))
      .select($"doc_id", $"n_tokens",
        explode(sequence(lit(0L), $"n_chunks" - 1L)).as("chunk_idx"), $"toks")
      .withColumn("chunk_toks",
        slice($"toks", ($"chunk_idx" * stride + 1L).cast("int"), lit(size)))
      .select($"doc_id", $"chunk_idx", $"n_tokens",
        org.apache.spark.sql.functions.size($"chunk_toks").cast("long").as("n_chunk_tokens"),
        concat_ws(" ", $"chunk_toks").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val q81Sql: String =
    """WITH t AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id IS NOT NULL
      |), n AS (
      |  SELECT doc_id, toks, CAST(LEN(toks) AS BIGINT) AS n_tokens,
      |    CAST((GREATEST(LEN(toks) - 16, 1) + 47) // 48 AS BIGINT) AS n_chunks
      |  FROM t
      |), ex AS (
      |  SELECT doc_id, n_tokens, toks, UNNEST(RANGE(n_chunks)) AS chunk_idx FROM n
      |)
      |SELECT doc_id, chunk_idx, n_tokens,
      |  CAST(LEN(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT) AS n_chunk_tokens,
      |  ARRAY_TO_STRING(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
      |FROM ex ORDER BY doc_id, chunk_idx""".stripMargin

  /** Sequence packing — the concatenate-then-split batching step: per
    * language stream, documents concatenate in doc_id order and split
    * at context-length boundaries (C = 512 tokens); each doc reports
    * its global token offset, first/last bin, and whether it straddles
    * a boundary. Formulated as an exact windowed prefix sum (integer
    * arithmetic end to end).
    *
    * Scale: the window partitions by the packing stream (`lang` here) —
    * real pipelines pack per shard/worker, so stream count scales with
    * the cluster, not 1; within a stream the prefix sum is the q19/q26
    * distributed-running-total shape. Per-doc token counts are capped
    * at C so a single long doc occupies whole bins instead of breaking
    * the invariant that a bin holds ≤ C tokens of any one doc.
    */
  def q82SequencePack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    documents(s, d)
      .filter($"doc_id".isNotNull)
      .withColumn("t", least(org.apache.spark.sql.functions.size(TextOps.tokens($"text")).cast("long"), lit(c)))
      .withColumn("offset", coalesce(sum($"t").over(w), lit(0L)))
      .select($"lang", $"doc_id", $"t",
        $"offset",
        expr(s"offset div $c").as("bin_first"),
        expr(s"(offset + t - 1) div $c").as("bin_last"))
      .withColumn("straddles", $"bin_first" =!= $"bin_last")
      .orderBy($"lang", $"doc_id")
  }

  val q82Sql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    LEAST(CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS BIGINT), 512) AS t
      |  FROM documents WHERE doc_id IS NOT NULL
      |), o AS (
      |  -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back for schema parity
      |  SELECT lang, doc_id, t,
      |    CAST(COALESCE(SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
      |  FROM t
      |)
      |SELECT lang, doc_id, t, "offset",
      |  CAST("offset" // 512 AS BIGINT) AS bin_first,
      |  CAST(("offset" + t - 1) // 512 AS BIGINT) AS bin_last,
      |  ("offset" // 512) <> (("offset" + t - 1) // 512) AS straddles
      |FROM o ORDER BY lang, doc_id""".stripMargin

  /** q103 — EXACT-k per-stratum sample (k = 5 per source): rank each
    * stratum by a portable multiplicative hash of the doc id (the q58/
    * q78 split-hash idiom — engine-identical integer arithmetic, no
    * engine RNG) and keep the first k. Complements q58's rate-based
    * per-mille sampling: rates give proportional splits, exact-k gives
    * fixed-size eval/holdout sets that stay STABLE as the corpus grows
    * (a doc's rank only changes if an earlier-hashed doc arrives in
    * its stratum).
    *
    * Scale shape: one shuffle on the stratum key, per-stratum sort of
    * hash-typed longs, rank filter — the same bounded-window cost as
    * any per-group top-k; no global sort, no RNG state.
    */
  def q103ExactKSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      .orderBy((($"doc_id" % 1000003L) * 2654435761L % 1000000007L).asc, $"doc_id".asc)
    documents(s, d)
      .filter($"doc_id".isNotNull)
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .orderBy($"source", $"rk")
  }

  val q103Sql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS rk
      |  FROM documents WHERE doc_id IS NOT NULL)
      |SELECT doc_id, source, lang, n_chars, rk
      |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** q140 — T5-style span-corruption mask PLAN (Raffel et al. 2020,
    * §3.1.4 denoising objective): for each document, a deterministic
    * set of NON-OVERLAPPING 3-token spans covering ~15% of positions
    * (n div 20 spans of length 3). Non-overlap by construction: the
    * doc partitions into n_spans equal segments (each ≥ 20 tokens) and
    * span i lands at a fixed-constant affine hash of (doc_id, i)
    * inside segment i — no rejection sampling, no RNG state, the same
    * plan reproducible in any engine and on any partitioning. This is
    * the objective-side sibling of q81/q82's chunk/pack plumbing: a
    * training job joins these (doc, start, len) rows against the
    * tokenized corpus to build inputs/targets.
    *
    * Scale shape: pure map + bounded explode (one row per span, ~n/20
    * per doc); no join, no shuffle except the output sort.
    */
  def q140SpanCorruption(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 1000000007L
    val a = 2654435761L % P
    documents(s, d).filter($"doc_id".isNotNull)
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n"))
      .withColumn("n_spans", expr("n div 20"))
      .filter($"n_spans" >= 1L)
      .withColumn("seg_len", expr("n div n_spans"))
      .select($"doc_id", $"n", $"n_spans", $"seg_len",
        explode(sequence(lit(0L), $"n_spans" - 1L)).as("span_idx"))
      // seg_len ≥ 20, so the modulus seg_len − 2 keeps the 3-token span
      // strictly inside its segment: off ∈ [0, seg_len − 3]
      .withColumn("off",
        ((($"doc_id" % P) * a + $"span_idx" * 97003L + 131L) % P) % ($"seg_len" - 2L))
      .select($"doc_id", $"span_idx",
        ($"span_idx" * $"seg_len" + $"off").as("start"),
        lit(3L).as("span_len"),
        expr("(n_spans * 3 * 1000) div n").as("masked_permille"))
      .orderBy($"doc_id", $"span_idx")
  }

  val q140Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+')) AS BIGINT) AS n
      |  FROM documents WHERE doc_id IS NOT NULL
      |), planned AS (
      |  SELECT doc_id, n, n // 20 AS n_spans, n // (n // 20) AS seg_len
      |  FROM docs WHERE n // 20 >= 1
      |), spans AS (
      |  SELECT doc_id, n, n_spans, seg_len, CAST(i AS BIGINT) AS span_idx
      |  FROM planned, UNNEST(RANGE(0, n_spans)) t(i)
      |)
      |SELECT doc_id, span_idx,
      |  CAST(span_idx * seg_len
      |    + ((doc_id % 1000000007) * (2654435761 % 1000000007) + span_idx * 97003 + 131)
      |      % 1000000007 % (seg_len - 2) AS BIGINT) AS start,
      |  CAST(3 AS BIGINT) AS span_len,
      |  CAST((n_spans * 3 * 1000) // n AS BIGINT) AS masked_permille
      |FROM spans ORDER BY doc_id, span_idx""".stripMargin

  /** q155 — Heaps-law vocabulary-growth curve over 3-shingle TYPES:
    * cumulative distinct-type count after each decile of the corpus (by
    * doc_id order) — the diminishing-returns diagnostic behind "is more
    * of this source still adding new content?" (Heaps' law V(n) ≈
    * K·n^β; a curve that flattens early means the source is saturated
    * and further ingestion mostly re-sees known types — a data-mixing
    * signal alongside q86's OOV ratio and q112's entropy). Shingle
    * types, not unigrams: a corpus's unigram vocabulary saturates
    * almost immediately (every decile after the first adds ~nothing),
    * while the n-gram type space keeps discriminating.
    *
    * The naive formulation — distinct-count per growing prefix — is
    * 10 corpus passes. One pass suffices: a type enters the vocabulary
    * at its FIRST document, so vocab(≤ t) = #{types: min(doc_id) ≤ t}.
    * Scale shape: the only corpus shuffle is the shingle-hash →
    * min(doc_id) aggregate (map-side partial min, type-space-bounded
    * output; 8-byte hashed keys, the text never shuffles — per-decile
    * counts over hashes equal counts over strings by the q134/q56
    * collision-free argument); the decile bucketing is a pure map off
    * a 1-row broadcast max, and the cumulative sum is a 10-row bounded
    * window. Integer decile arithmetic (`div` ≡ DuckDB `//` on
    * non-negatives) keeps the bucket boundary engine-exact.
    */
  def q155HeapsLaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val docs = documents(s, d)
      .filter($"doc_id".isNotNull && $"text".isNotNull)
    val mx = docs.agg(max($"doc_id").as("max_id"))
    docs.select($"doc_id",
        explode(call_function("shingle_hashes", $"text", lit(3))).as("sh"))
      .groupBy($"sh").agg(min($"doc_id").as("first_doc"))
      .crossJoin(broadcast(mx))
      .select(least(expr("(first_doc * 10) div (max_id + 1)"), lit(9L)).as("decile"))
      .groupBy($"decile").agg(count(lit(1)).as("new_types"))
      .withColumn("cum_vocab",
        sum($"new_types").over(BoundedWindow.ordered($"decile", $"decile")))
      .orderBy($"decile")
  }

  val q155Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
      |), sh AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
      |  FROM docs
      |), fs AS (
      |  SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
      |), mx AS (SELECT MAX(doc_id) AS max_id FROM docs),
      |b AS (
      |  SELECT LEAST((first_doc * 10) // (max_id + 1), 9) AS decile,
      |    COUNT(*) AS n
      |  FROM fs, mx GROUP BY 1
      |)
      |SELECT decile, CAST(n AS BIGINT) AS new_types,
      |  CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_vocab
      |FROM b ORDER BY decile""".stripMargin

  /** q160 — batch-expressible sibling of the streaming first-wins merge
    * ([[graft.streaming.CorpusIngest.mergeDocs]]): replay the corpus as
    * four ingest micro-batches (batch = doc_id % 4, dates spread as
    * 20240101 + doc_id % 3) with simulated AT-LEAST-ONCE delivery —
    * every third document is delivered a second time in batch
    * (doc_id div 3) % 4 — through the REAL merge (write, re-read,
    * re-merge), then return the final lake row set. This closes the one
    * streaming-tier semantic with no oracle row: FIRST-wins polarity
    * (a re-delivered document is interchangeable, so the lake must
    * carry the EARLIEST delivery's ingest_seq), vs the candle sink's
    * keep-LAST (a re-fetch is a correction — crypto_collector.py:548–553).
    * The corpus has no byte-exact text duplicates, so the re-delivery
    * schedule is what puts each fingerprint in front of the merge
    * twice; a keep-last bug flips ingest_seq on every re-delivered row
    * and the hash catches it. The oracle is the equivalent window over
    * the same delivery schedule: per (source, date, text_md5) keep min
    * batch, then min doc_id (the within-batch gate is the stream's
    * first-occurrence dedup made deterministic).
    *
    * Scale: each merge reads only the touched (source, date)
    * partitions via the static-pruned MergeWriter shape, so a replayed
    * batch costs O(batch + touched partitions), never O(lake); the
    * gate is one shuffle on the dedup key. The replay lake is
    * appId-unique, fresh per call (the replay IS the operator), and
    * swept at application end.
    */
  def q160FirstWinsReplay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val deliveries = documents(s, d)
      .filter($"doc_id".isNotNull && $"text".isNotNull && $"source".isNotNull)
      .select($"doc_id", $"text", $"source",
        ($"doc_id" % 3 + lit(20240101L)).cast("string").as("date"),
        md5($"text").as("text_md5"),
        explode(when($"doc_id" % 3 === 0,
            array($"doc_id" % 4, expr("(doc_id div 3) % 4")))
          .otherwise(array($"doc_id" % 4))).as("batch"))
    val gated = KeepLast.dedup(deliveries,
        Seq($"batch", $"source", $"date", $"text_md5"), Seq(-$"doc_id"))
      .localCheckpoint() // computed once, filtered four times
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val lake = s"$wh/graft_firstwins_${graft.lake.AppState.tag(s, d)}_" +
      java.util.UUID.randomUUID().toString.take(8)
    graft.lake.AppState.register(s, lake)
    (0L to 3L).foreach { b =>
      graft.streaming.CorpusIngest.mergeDocs(
        s, gated.filter($"batch" === b).drop("batch"), lake, b)
    }
    s.read.parquet(lake)
      .select($"source", $"date".cast("string").as("date"), $"text_md5",
        $"doc_id", $"ingest_seq")
      .orderBy($"source", $"date", $"text_md5")
  }

  val q160Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, CAST(20240101 + doc_id % 3 AS VARCHAR) AS date,
      |    MD5(text) AS text_md5
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL
      |), deliv AS (
      |  SELECT doc_id, source, date, text_md5,
      |    UNNEST(CASE WHEN doc_id % 3 = 0
      |                THEN [doc_id % 4, (doc_id // 3) % 4]
      |                ELSE [doc_id % 4] END) AS batch
      |  FROM docs
      |)
      |SELECT source, date, text_md5, doc_id, CAST(batch AS BIGINT) AS ingest_seq
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, date, text_md5
      |                               ORDER BY batch, doc_id) AS rn
      |  FROM deliv)
      |WHERE rn = 1
      |ORDER BY source, date, text_md5""".stripMargin

  /** q167 — batch replay of the streaming incremental near-dup gate
    * ([[MinHashLsh.incrementalNearDupGate]], wired live in
    * [[graft.streaming.CorpusIngest.startNearDupGated]]): the corpus
    * arrives as four micro-batches (batch = doc_id % 4) and each batch
    * is gated against the maintained survivor state — dropped iff
    * near-dup (exact 3-shingle Jaccard ≥ 0.5 over banding candidates)
    * of an earlier-batch SURVIVOR or of a smaller-id doc in its own
    * batch. Output is every doc's verdict (doc_id, batch, survived).
    *
    * This is the q160 discipline applied to the last dedup family with
    * no streaming form: the oracle simulates the same four-stage gate
    * relationally (brute pair relation + four unrolled NOT-EXISTS
    * survivor stages — banding recall is structurally 1 at τ = 0.5,
    * the q36 argument, and banding is per-doc so the pair relation is
    * population-independent), which hash-checks both the candidate
    * recall and the state discipline: a keep-vs-dropped polarity bug
    * (state accumulating dropped docs, or in-batch rule consulting
    * survival) flips verdicts on the planted chains and the hash
    * catches it.
    *
    * Scale: state grows with survivors; each batch costs
    * O(batch × bands + candidates); nothing rescans prior batches —
    * the four gate calls are genuinely incremental, not a replayed
    * corpus-wide dedup.
    */
  def q167StreamNearDupGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).filter($"doc_id".isNotNull)
      .select($"doc_id", $"text", ($"doc_id" % 4).as("batch"))
      .localCheckpoint() // one corpus scan feeds the four batch filters
    var state: Option[GateState] = None
    val verdicts = (0L to 3L).map { b =>
      val (flags, delta) = MinHashLsh.incrementalNearDupGate(
        docs.filter($"batch" === b).select($"doc_id", $"text"), state)
      state = Some(state match {
        case None => delta
        case Some(st) => GateState(
          st.bands.unionByName(delta.bands).localCheckpoint(),
          st.docs.unionByName(delta.docs).localCheckpoint())
      })
      flags.withColumn("batch", lit(b))
    }
    verdicts.reduce(_.unionByName(_))
      .select($"doc_id", $"batch", $"survived")
      .orderBy($"doc_id")
  }

  /** Brute-force relational simulation: the full τ-pair relation (the
    * q36 oracle's chain), symmetric edges, then the four gate stages
    * unrolled — stage b's NOT EXISTS clauses are exactly rule (a)
    * (edge from a PRIOR-STAGE SURVIVOR) and rule (b) (edge from a
    * smaller-id same-batch doc).
    */
  val q167Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, doc_id % 4 AS batch,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL)
      |), ex AS (
      |  SELECT doc_id, UNNEST(sh) AS shingle FROM docs WHERE LEN(sh) > 0
      |), sz AS (
      |  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id
      |), cm AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT da, db FROM cm
      |  JOIN sz sa ON sa.doc_id = cm.da JOIN sz sb ON sb.doc_id = cm.db
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
      |), e AS (
      |  SELECT da AS u, db AS v FROM pairs
      |  UNION ALL SELECT db AS u, da AS v FROM pairs
      |), bt AS (
      |  SELECT doc_id, batch FROM docs
      |), s0 AS (
      |  SELECT d.doc_id FROM bt d WHERE d.batch = 0 AND NOT EXISTS (
      |    SELECT 1 FROM e JOIN bt a ON a.doc_id = e.u
      |    WHERE e.v = d.doc_id AND a.batch = 0 AND e.u < d.doc_id)
      |), s1 AS (
      |  SELECT d.doc_id FROM bt d WHERE d.batch = 1
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN s0 p ON p.doc_id = e.u
      |                    WHERE e.v = d.doc_id)
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN bt a ON a.doc_id = e.u
      |                    WHERE e.v = d.doc_id AND a.batch = 1 AND e.u < d.doc_id)
      |), p1 AS (
      |  SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1
      |), s2 AS (
      |  SELECT d.doc_id FROM bt d WHERE d.batch = 2
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN p1 p ON p.doc_id = e.u
      |                    WHERE e.v = d.doc_id)
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN bt a ON a.doc_id = e.u
      |                    WHERE e.v = d.doc_id AND a.batch = 2 AND e.u < d.doc_id)
      |), p2 AS (
      |  SELECT doc_id FROM p1 UNION ALL SELECT doc_id FROM s2
      |), s3 AS (
      |  SELECT d.doc_id FROM bt d WHERE d.batch = 3
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN p2 p ON p.doc_id = e.u
      |                    WHERE e.v = d.doc_id)
      |    AND NOT EXISTS (SELECT 1 FROM e JOIN bt a ON a.doc_id = e.u
      |                    WHERE e.v = d.doc_id AND a.batch = 3 AND e.u < d.doc_id)
      |), surv AS (
      |  SELECT doc_id FROM p2 UNION ALL SELECT doc_id FROM s3
      |)
      |SELECT d.doc_id, CAST(d.batch AS BIGINT) AS batch,
      |  d.doc_id IN (SELECT doc_id FROM surv) AS survived
      |FROM bt d ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_stream_neardup_gate" -> (q167StreamNearDupGate _),
    "q160_first_wins_replay" -> (q160FirstWinsReplay _),
    "q155_heaps_law" -> (q155HeapsLaw _),
    "q103_exact_k_sample" -> (q103ExactKSample _),
    "q71_repetition_signals" -> (q71RepetitionSignals _),
    "q72_ngram_topk" -> (q72NgramTopk _),
    "q73_text_scrub" -> (q73TextScrub _),
    "q81_doc_chunks" -> (q81DocChunks _),
    "q82_sequence_pack" -> (q82SequencePack _),
    "q140_span_corruption" -> (q140SpanCorruption _),
  )

  val oracles: Map[String, String] = Map(
    "q167_stream_neardup_gate" -> q167Sql,
    "q160_first_wins_replay" -> q160Sql,
    "q155_heaps_law" -> q155Sql,
    "q103_exact_k_sample" -> q103Sql,
    "q71_repetition_signals" -> q71Sql,
    "q72_ngram_topk" -> q72Sql,
    "q73_text_scrub" -> q73Sql,
    "q81_doc_chunks" -> q81Sql,
    "q82_sequence_pack" -> q82Sql,
    "q140_span_corruption" -> q140Sql,
  )
}
