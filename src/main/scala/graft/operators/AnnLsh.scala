package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Approximate nearest neighbour via sign-random-projection LSH
  * (Charikar'02 SRP): 16 deterministic pseudo-random hyperplanes → a
  * 16-bit bucket id per vector; neighbour candidates live in the same
  * bucket (plus multi-probe in the Hamming-1 ring); exact cosine re-rank
  * inside the candidate set only.
  *
  * Hyperplane weights are derived from `xxhash64(plane, dim)` mapped into
  * [-1, 1] — fully deterministic, no RNG state, identical on every
  * executor with zero broadcast. At 100 TB: the bucket id is one shuffle
  * key (2^16 buckets → salt-free balance for natural embeddings), the
  * re-rank is per-bucket quadratic but bucket-capped — the same guard as
  * [[MinHashLsh.candidates]].
  *
  * Spark-only (rows-only driver check): the recall-vs-brute-force property
  * is asserted in ScalaTest against [[VectorOps.q41CosineTopk]] instead.
  */
object AnnLsh {
  val Planes = 16

  /** Pseudo-random plane weight in [-1, 1] for (plane p, dimension i). */
  private def weight(p: Int, i: Column): Column =
    (xxhash64(lit(p), i).cast("double") / lit(Long.MaxValue.toDouble))

  /** 16-bit SRP bucket id for an `array<float>` embedding column. */
  def bucket(emb: Column): Column = {
    val dims = sequence(lit(0), size(emb) - 1)
    val bits = (0 until Planes).map { p =>
      val dot = aggregate(
        zip_with(emb, dims, (v, i) => v.cast("double") * weight(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: top-`k` same-bucket neighbours per query by exact
    * cosine. Vectors in singleton buckets yield no rows (the multi-probe
    * extension would widen to Hamming-1 buckets).
    */
  def ann(embs: DataFrame, k: Int = 3, maxBucket: Int = 2000): DataFrame = {
    val b = embs.select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    val capped = b.withColumn("__n", count(lit(1)).over(Window.partitionBy(col("bkt"))))
      .filter(col("__n").between(2, maxBucket)).drop("__n")
    val pairs = capped.as("q").join(capped.as("c"),
      col("q.bkt") === col("c.bkt") && col("q.vec_id") =!= col("c.vec_id"))
    val dot = aggregate(zip_with(col("q.embedding"), col("c.embedding"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)
    def n2(e: Column) = aggregate(transform(e, x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, x) => a + x)
    val scored = pairs.select(
      col("q.vec_id").as("qid"), col("c.vec_id").as("cid"), col("q.bkt").as("bkt"),
      (dot / (sqrt(n2(col("q.embedding"))) * sqrt(n2(col("c.embedding"))))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Driver query: bucketed ANN top-3 over `embeddings`. */
  def q43AnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ann(embeddings(s, d))
      .select($"qid", $"rk".cast("long").as("rk"), $"cid", $"bkt", $"cos")
      .orderBy($"qid", $"rk")
  }
}
