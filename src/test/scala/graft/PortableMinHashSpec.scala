package graft

import org.apache.spark.sql.functions.col
import graft.operators.PortableMinHash

/** The portable (oracle-checkable) MinHash tier must behave like a
  * MinHash: planted near-duplicates pair, unrelated docs don't, and the
  * polynomial hash matches a direct JVM computation.
  */
class PortableMinHashSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash equals a direct fold, bit-for-bit") {
    val M = 9007199254740881L
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % M)
    val inputs = Seq("hello world span", "a b c", "the quick brown fox")
    val got = inputs.toDF("s").select(PortableMinHash.polyHash(col("s")))
      .as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("poly_shingle_hashes kernel matches the relational HOF pipeline per doc") {
    graft.plans.GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id".isNotNull)
    val kernel = docs
      .select($"doc_id", call_function("poly_shingle_hashes", $"text", lit(3)).as("hl"))
      .filter(size($"hl") > 0)
      .as[(Long, Seq[Long])].collect().map { case (d, hl) => d -> hl.sorted.toSeq }.toMap
    val pipeline = graft.operators.TextOps
      .explodedShingles(docs, Seq("doc_id"), "text", 3)
      .select($"doc_id", PortableMinHash.polyHash(col("shingle")).as("h"))
      .groupBy($"doc_id").agg(collect_set($"h").as("hl"))
      .as[(Long, Seq[Long])].collect().map { case (d, hl) => d -> hl.sorted.toSeq }.toMap
    assert(kernel == pipeline)
  }

  test("planted near-dup pairs; unrelated docs do not") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = base.replace("token60", "changed")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val docsDir = java.nio.file.Files.createTempDirectory("pmh").toString
    Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$docsDir/documents.parquet")
    val out = PortableMinHash.q79MinhashPortable(spark, docsDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)), "planted near-dup must surface")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L), "unrelated must not pair")
  }
}
