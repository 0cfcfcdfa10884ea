package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** MinHash + LSH banding built ENTIRELY from portable integer arithmetic
  * — the oracle-checkable sibling of [[MinHashLsh]] (q36).
  *
  * q36's tier is the production shape (one codegen'd xxhash64 per
  * shingle + affine rehashes) but its seeds are engine-specific, so for
  * five rounds the MinHash row carried a justified `no_oracle`. This
  * variant swaps exactly one ingredient — the shingle hash becomes a
  * base-31 polynomial mod M = 9007199254740881 (< 2⁵³, so acc·31+c
  * never leaves int64), evaluated per character with `aggregate`/
  * `list_reduce` in Spark/DuckDB — and the K permutations become
  * explicit universal-hash rehashes (a_k·h + b_k) mod P with fixed
  * constants. Every stage is then bit-reproducible in DuckDB:
  * signatures, band md5s, buckets, candidate pairs, and the exact
  * Jaccard verify — a full hash-checked oracle row for the MinHash/LSH
  * semantics themselves.
  *
  * Scale shape is q36's: the corpus reduces to one exploded
  * (doc_id, shingle-hash) relation (repartition materialization point,
  * consumed by the signature aggregation and the per-doc hash-set
  * build); signatures are K min-aggregates in ONE groupBy pass (no K×
  * row blowup); banding shuffles (band, md5) keys; buckets are capped
  * (`collect_capped` ≤ 50) so no boilerplate bucket goes quadratic;
  * the tiny candidate set broadcasts into the verify joins.
  */
object PortableMinHash {
  private val M = 9007199254740881L // poly-hash modulus, < 2^53
  private val P = 1000000007L       // permutation modulus
  val K = 16                        // minhash functions
  val BandRows = 4                  // 4 bands x 4 rows

  /** Portable per-string polynomial hash: fold (acc·31 + codepoint) mod M
    * over the characters — identical in any engine with exact int64.
    */
  def polyHash(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % M)

  def q79MinhashPortable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.GraftExtensions.register(s) // poly_shingle_hashes, collect_capped
    // per-doc distinct portable shingle hashes via the fused codegen'd
    // [[graft.functions.PolyShingleHashes]] kernel — scan → project, NO
    // shuffle (the relational explodedShingles + per-char HOF fold cost
    // 4 s at sf0.1; same single-payload-column + repartition reuse
    // discipline as q35/q36). Bit parity with the HOF fold is asserted
    // in PortableMinHashSpec.
    val hs = documents(s, d)
      .filter($"doc_id".isNotNull)
      .select($"doc_id", call_function("poly_shingle_hashes", $"text", lit(3)).as("hl"))
      .filter(size($"hl") > 0)
      // explicit N: see TextOps winnowNearDupPairs — AQE otherwise
      // coalesces this tiny exchange to one task and serializes the
      // K-min aggregate pass downstream
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
    val ex = hs.select($"doc_id", explode($"hl").as("h"))
    // K min-aggregates in one pass; permutation constants fixed and
    // reproduced literally in the oracle
    val hP = $"h" % P
    val minCols = (0 until K).map { k =>
      val a = (2654435761L * (k + 1)) % P
      val b = (40503L * (k + 1) * (k + 1)) % P
      min((hP * a + b) % P).as(s"mh$k")
    }
    val sig = ex.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
    val nBands = K / BandRows
    val bandCols = (0 until nBands).map { bd =>
      struct(lit(bd.toLong).as("band"),
        md5(concat_ws(":", (0 until BandRows).map(i =>
          col(s"mh${bd * BandRows + i}").cast("string")): _*)).as("bsig"))
    }
    val bands = sig
      .select($"doc_id", explode(array(bandCols: _*)).as("bs"))
      .select($"doc_id", $"bs.band".as("band"), $"bs.bsig".as("bsig"))
    val cand = bands.groupBy($"band", $"bsig")
      .agg(call_function("collect_capped", $"doc_id", lit(50)).as("ids"))
      .filter(size($"ids").between(2, 50))
      .select(explode($"ids").as("doc_a"), $"ids")
      .select($"doc_a", explode($"ids").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared_bands"))
    broadcast(broadcast(cand)
        .join(hs.select($"doc_id".as("doc_a"), $"hl".as("ha")), Seq("doc_a")))
      .join(hs.select($"doc_id".as("doc_b"), $"hl".as("hb")), Seq("doc_b"))
      .withColumn("common", size(array_intersect($"ha", $"hb")).cast("long"))
      .withColumn("jaccard",
        $"common".cast("double") / (size($"ha") + size($"hb") - $"common"))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"n_shared_bands", $"common", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** The oracle reproduces every stage: q35's shingle-string CTE, the
    * polynomial hash via list_reduce, the K permutations from the same
    * literal constants, band md5s via ordered STRING_AGG, capped
    * buckets, and the hash-set Jaccard verify.
    */
  val q79Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id IS NOT NULL)
      |), hsets AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT(LIST_TRANSFORM(sh, s ->
      |      list_reduce(list_transform(string_split(s, ''), c -> CAST(ord(c) AS BIGINT)),
      |                  (a, b) -> (a * 31 + b) % 9007199254740881))) AS hl
      |  FROM docs WHERE LEN(sh) > 0
      |), ex AS (
      |  SELECT doc_id, UNNEST(hl) AS h FROM hsets
      |), sig AS (
      |  SELECT doc_id, k,
      |    MIN((((2654435761 * (k + 1)) % 1000000007) * (h % 1000000007)
      |         + (40503 * (k + 1) * (k + 1)) % 1000000007) % 1000000007) AS mh
      |  FROM ex CROSS JOIN (SELECT UNNEST(RANGE(16)) AS k)
      |  GROUP BY doc_id, k
      |), bands AS (
      |  SELECT doc_id, k // 4 AS band,
      |    MD5(STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY k)) AS bsig
      |  FROM sig GROUP BY doc_id, k // 4
      |), buckets AS (
      |  SELECT band, bsig FROM bands GROUP BY band, bsig
      |  HAVING COUNT(*) BETWEEN 2 AND 50
      |), cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
      |  FROM bands a
      |  JOIN buckets u ON a.band = u.band AND a.bsig = u.bsig
      |  JOIN bands b ON b.band = a.band AND b.bsig = a.bsig AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, n_shared_bands, common, jaccard FROM (
      |  SELECT c.doc_a, c.doc_b, c.n_shared_bands,
      |    LEN(LIST_FILTER(ha.hl, x -> LIST_CONTAINS(hb.hl, x))) AS common,
      |    CAST(LEN(LIST_FILTER(ha.hl, x -> LIST_CONTAINS(hb.hl, x))) AS DOUBLE)
      |      / (LEN(ha.hl) + LEN(hb.hl)
      |         - LEN(LIST_FILTER(ha.hl, x -> LIST_CONTAINS(hb.hl, x)))) AS jaccard
      |  FROM cand c
      |  JOIN hsets ha ON ha.doc_id = c.doc_a
      |  JOIN hsets hb ON hb.doc_id = c.doc_b)
      |WHERE jaccard >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_minhash_portable" -> (q79MinhashPortable _),
  )

  val oracles: Map[String, String] = Map(
    "q79_minhash_portable" -> q79Sql,
  )
}
