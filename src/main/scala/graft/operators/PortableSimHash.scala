package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** SimHash near-dup detection built ENTIRELY from portable integer
  * arithmetic — the oracle-checkable sibling of [[SimHash]] (q37), and
  * the last sketch family to get one (MinHash→q79, SRP-ANN→q80,
  * Count-Min→q113, KMV→q116).
  *
  * q37 is the production shape (xxhash64 token hashes folded by the
  * codegen'd `simhash_sig` 64-bit kernel) but its hash is
  * engine-specific, so its row is a justified rows-only check. This
  * variant swaps the ingredients for the q79 idiom: token hashes come
  * from the base-31 polynomial mod M = 9007199254740881 (the
  * `poly_shingle_hashes` kernel at w = 1 — same distinct-per-doc
  * semantics as the MinHash tier), and each of the 48 signature bits is
  * a fixed universal-hash SIGN vote — bit k of doc D is 1 iff
  * Σ_{h ∈ D} (±1 by parity of (a_k·(h mod P) + b_k) mod P) > 0, with
  * the same literal (a_k, b_k) constants the q79 permutations use
  * (Charikar's random-hyperplane votes discretized to per-bit hash
  * parities). Every stage — signatures, 12-bit chunk blocking,
  * bucket caps, Hamming verify — is exact int64 arithmetic DuckDB
  * replays bit-for-bit.
  *
  * Scale shape is q37's: one scan → per-doc hash arrays (codegen'd
  * kernel, NO shuffle), a 48-column partial+final vote aggregate keyed
  * on doc_id, chunk blocking via `collect_capped` (≤ 100 per bucket, so
  * no degenerate chunk value goes quadratic — over-cap buckets drop,
  * reproduced by the oracle's HAVING bound), double-explode pairing on
  * the capped members, and a Hamming ≤ 3 verify on the pair relation.
  * 4 chunks × 12 bits over a 48-bit signature give pigeonhole recall:
  * any pair within Hamming 3 shares at least one exact chunk.
  */
object PortableSimHash {
  private val P = 1000000007L // universal-hash modulus (odd prime)
  val Bits = 48               // signature width (stays positive in int64: DuckDB >> is arithmetic)
  val Chunks = 4              // 12-bit blocking chunks
  val MaxBucket = 100         // quadratic-bucket guard, mirrored in the oracle

  /** Near-dup pairs (Hamming ≤ 3) over any (idCol: long, textCol:
    * string) relation — DataFrame-level so specs can run planted
    * corpora through the exact query shape.
    */
  def pairs(docs0: DataFrame): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    graft.plans.GraftExtensions.register(s)
    val hs = docs0.filter($"doc_id".isNotNull)
      .select($"doc_id", call_function("poly_shingle_hashes", $"text", lit(1)).as("hl"))
      .filter(size($"hl") > 0)
    val ex = hs.select($"doc_id", explode($"hl").as("h"))
      .select($"doc_id", ($"h" % P).as("hp"))
    // 48 sign-vote sums in ONE partial+final aggregate pass (the q37
    // lesson: per-bit lambdas re-walk the array; aggregate columns
    // combine map-side). Constants are the q79 universal-hash family.
    val voteCols = (0 until Bits).map { k =>
      val a = (2654435761L * (k + 1)) % P
      val b = (40503L * (k + 1) * (k + 1)) % P
      sum(when((($"hp" * a + b) % P) % 2 === 1, 1L).otherwise(-1L)).as(s"v$k")
    }
    val sigBits = (0 until Bits)
      .map(k => when(col(s"v$k") > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val sigs = ex.groupBy($"doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select($"doc_id", sigBits.as("sig"))
    // chunk blocking + capped buckets + double-explode pairing — the
    // q37/q79 candidate shape, never all-pairs
    sigs
      .select($"doc_id", $"sig",
        posexplode(array((0 until Chunks).map(c =>
          shiftrightunsigned($"sig", c * 12).bitwiseAND(lit(0xFFFL))): _*))
          .as(Seq("chunk_idx", "chunk")))
      .groupBy($"chunk_idx", $"chunk")
      .agg(call_function("collect_capped", struct($"doc_id", $"sig"), lit(MaxBucket)).as("members"))
      .filter(size($"members").between(2, MaxBucket))
      .select(explode($"members").as("x"), $"members")
      .select($"x", explode($"members").as("y"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.sig".as("sig_a"), $"y.sig".as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count($"sig_a".bitwiseXOR($"sig_b")).cast("long"))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"sig_a", $"sig_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  def q115SimhashPortable(s: SparkSession, d: String): DataFrame =
    pairs(documents(s, d))

  /** The oracle replays every stage: w=1 portable token hashes (the
    * q79 list_reduce fold, empty token → 0 like the kernel's empty
    * fold), the 48 sign votes from the same literal constants, the
    * bit-OR signature, 12-bit chunks, the BETWEEN 2 AND 100 bucket cap,
    * and the Hamming ≤ 3 verify.
    */
  /** The signature→blocking→pair pipeline as oracle CTEs, shared by
    * q115 (pair output) and q118 (cluster rollup).
    */
  val pairCtes: String =
    """toks AS (
      |  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+') AS tl
      |  FROM documents WHERE doc_id IS NOT NULL
      |), hsets AS (
      |  SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(tl, s ->
      |    CASE WHEN s = '' THEN 0
      |    ELSE list_reduce(list_transform(string_split(s, ''), c -> CAST(ord(c) AS BIGINT)),
      |                     (a, b) -> (a * 31 + b) % 9007199254740881) END)) AS hl
      |  FROM toks WHERE LEN(tl) > 0
      |), ex AS (
      |  SELECT doc_id, UNNEST(hl) % 1000000007 AS hp FROM hsets
      |), votes AS (
      |  SELECT doc_id, k,
      |    SUM(CASE WHEN ((hp * ((2654435761 * (k + 1)) % 1000000007)
      |          + (40503 * (k + 1) * (k + 1)) % 1000000007) % 1000000007) % 2 = 1
      |        THEN 1 ELSE -1 END) AS v
      |  FROM ex CROSS JOIN (SELECT UNNEST(RANGE(48)) AS k)
      |  GROUP BY doc_id, k
      |), sigs AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT) AS sig
      |  FROM votes GROUP BY doc_id
      |), chunks AS (
      |  SELECT doc_id, sig, c AS chunk_idx, (sig >> (c * 12)) & 4095 AS chunk
      |  FROM sigs CROSS JOIN (SELECT UNNEST(RANGE(4)) AS c)
      |), buckets AS (
      |  SELECT chunk_idx, chunk FROM chunks GROUP BY chunk_idx, chunk
      |  HAVING COUNT(*) BETWEEN 2 AND 100
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.sig AS sig_a, b.sig AS sig_b
      |  FROM chunks a
      |  JOIN buckets u ON a.chunk_idx = u.chunk_idx AND a.chunk = u.chunk
      |  JOIN chunks b ON b.chunk_idx = a.chunk_idx AND b.chunk = a.chunk
      |    AND a.doc_id < b.doc_id
      |), near AS (
      |  SELECT doc_a, doc_b, sig_a, sig_b,
      |    CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
      |  FROM pairs
      |  WHERE bit_count(xor(sig_a, sig_b)) <= 3
      |)""".stripMargin

  val q115Sql: String =
    s"""WITH $pairCtes
       |SELECT doc_a, doc_b, sig_a, sig_b, hamming
       |FROM near
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q118 — near-dup CLUSTERS over the q115 pair relation: the cluster
    * rollup every dedup family here ends in (winnow→q59, SemDeDup→q88,
    * now SimHash), via the same large-star/small-star connected
    * components. Output: one row per cluster with its representative
    * (min doc id), size, and id span — the relation a curation job
    * consumes to keep one doc per cluster.
    *
    * Scale shape: pairs are the capped q115 relation (never all-pairs),
    * CC rounds checkpoint bounded edge lists, and the rollup is one
    * partial+final agg on the component key. The oracle replays the
    * pair CTEs and closes them with the q88 recursive-CTE closure.
    */
  def q118SimhashClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = pairs(documents(s, d)).select($"doc_a", $"doc_b")
    ConnectedComponents.labels(s, p, "doc_a", "doc_b")
      .groupBy($"component")
      .agg(count(lit(1)).as("n_docs"), max($"node").as("max_doc"))
      .select($"component".as("cluster_rep"), $"n_docs", $"max_doc")
      .orderBy($"cluster_rep")
  }

  val q118Sql: String =
    s"""WITH RECURSIVE $pairCtes,
       |sym AS (
       |  SELECT doc_a AS u, doc_b AS v FROM near
       |  UNION ALL SELECT doc_b, doc_a FROM near
       |), r(u, v) AS (
       |  SELECT u, u FROM sym
       |  UNION
       |  SELECT r.u, s2.v FROM r JOIN sym s2 ON r.v = s2.u
       |), comp AS (
       |  SELECT u AS node, MIN(v) AS component FROM r GROUP BY u
       |)
       |SELECT component AS cluster_rep,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MAX(node) AS BIGINT) AS max_doc
       |FROM comp GROUP BY component
       |ORDER BY cluster_rep""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_simhash_portable" -> (q115SimhashPortable _),
    "q118_simhash_clusters" -> (q118SimhashClusters _),
  )

  val oracles: Map[String, String] = Map(
    "q115_simhash_portable" -> q115Sql,
    "q118_simhash_clusters" -> q118Sql,
  )
}
