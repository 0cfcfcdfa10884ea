package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** MinHash + LSH near-duplicate detection — the unblocked-corpus scale
  * path for dedup (Broder's MinHash; banding per Leskovec et al., "Mining
  * of Massive Datasets" ch. 3).
  *
  * Pipeline (all relational, no driver-side state):
  *  1. shingle → distinct word-3-shingles per doc
  *  2. minhash: k=32 signatures; hash_i(sh) = xxhash64(shingle, seed=i),
  *     signature_i = min over shingles — computed columnar with
  *     `transform` + `array_min` over the shingle array, no explode of the
  *     k× space.
  *  3. banding: 8 bands × 4 rows; docs sharing a band signature become
  *     candidates — a groupBy join on (band_idx, band_sig), so candidate
  *     generation is one shuffle whose key cardinality grows with corpus
  *     size (no all-pairs anywhere).
  *  4. verify: exact Jaccard on the candidates only.
  *
  * At 100 TB: signatures are 32×8 bytes/doc; the band shuffle keys are
  * ~uniform (hash values), so no skew; hot buckets (boilerplate docs) are
  * capped per-bucket before pairing (`maxBucket`), the standard guard
  * against quadratic blowup inside a single bucket.
  *
  * Not DuckDB-oracle-able (xxhash64 seeds are engine-specific); covered by
  * the rows-only driver check + ScalaTest planted-duplicate specs.
  */
object MinHashLsh {
  val K = 32          // minhash functions
  val Bands = 8       // bands (K / Bands rows per band)
  val RowsPerBand: Int = K / Bands

  /** doc_id + minhash signature array (length K). */
  def signatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sh = array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), 3))
    val sig = transform(sequence(lit(0), lit(K - 1)),
      i => array_min(transform(col("__sh"), s => xxhash64(s, i))))
    docs.withColumn("__sh", sh)
      .withColumn("sig", when(size(col("__sh")) === 0, lit(null)).otherwise(sig))
      .drop("__sh")
  }

  /** Candidate near-dup pairs (doc_a < doc_b) via banding; each pair also
    * gets `n_shared_bands`. `maxBucket` drops pathological buckets.
    */
  def candidates(sigs: DataFrame, idCol: String, maxBucket: Int = 1000): DataFrame = {
    val banded = sigs.filter(col("sig").isNotNull)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(Bands - 1)),
          b => slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))).as(Seq("band", "band_sig")))
    val bucketed = banded
      .groupBy(col("band"), col("band_sig"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    bucketed
      .select(col("band"), explode(col("ids")).as("a"), col("ids"))
      .select(col("band"), col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Full pipeline over `documents`: candidates verified with exact
    * Jaccard ≥ `minJaccard`. Spark-only driver query (rows-only check).
    */
  def q36MinhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select($"doc_id", $"text")
    val sh = docs.select($"doc_id",
      array_distinct(TextOps.shingles(TextOps.tokens($"text"), 3)).as("sh"))
    val cand = candidates(signatures(docs), "doc_id")
    val verified = cand
      .join(sh.select($"doc_id".as("a"), $"sh".as("sh_a")), Seq("a"))
      .join(sh.select($"doc_id".as("b"), $"sh".as("sh_b")), Seq("b"))
      .withColumn("common", size(array_intersect($"sh_a", $"sh_b")).cast("long"))
      .withColumn("jaccard",
        $"common".cast("double") / (size($"sh_a") + size($"sh_b") - $"common"))
      .filter($"jaccard" >= 0.5)
    verified.select($"a".as("doc_a"), $"b".as("doc_b"), $"n_shared_bands", $"common", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }
}

/** SimHash near-dup detection (Charikar; used at web scale by Manku et
  * al., WWW'07): one 64-bit signature per doc from per-token hash bit
  * votes; near-dups = signatures within small Hamming distance. Candidate
  * generation blocks on 4×16-bit signature chunks (two chunks must match
  * exactly for Hamming ≤ 3 at 64 bits when split into 4 — pigeonhole), so
  * again: shuffle on chunk values, never all-pairs.
  */
object SimHash {
  private val Bits = 64

  /** 64-bit simhash of the token array: sum ±1 votes per bit position,
    * weighted by token frequency, sign → bit. Columnar: per-token
    * xxhash64, then 64 `when` sums — no explode.
    */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until Bits).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with Hamming ≤ 3, blocked on 16-bit chunks. */
  def q37SimhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
      .select($"doc_id", simhash(TextOps.tokens($"text")).as("sig"))
    val chunked = docs.select($"doc_id", $"sig",
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned($"sig", c * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk_idx", "chunk")))
    val pairs = chunked.as("x")
      .join(chunked.as("y"),
        $"x.chunk_idx" === $"y.chunk_idx" && $"x.chunk" === $"y.chunk" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.sig".as("sig_a"), $"y.sig".as("sig_b"))
      .distinct()
    pairs.withColumn("hamming", hamming($"sig_a", $"sig_b").cast("long"))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }
}
