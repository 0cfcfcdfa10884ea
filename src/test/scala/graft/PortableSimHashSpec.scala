package graft

import org.apache.spark.sql.functions._
import graft.operators.{PortableSimHash, SimHash}

/** The portable (oracle-checkable) SimHash tier must behave like a
  * SimHash: identical distinct-token sets collide at Hamming 0,
  * unrelated vocabularies never pair, the w=1 kernel hash matches the
  * relational fold, and the production q37 tier agrees on planted
  * duplicates.
  */
class PortableSimHashSpec extends SparkSpec {
  import spark.implicits._

  test("poly_shingle_hashes(w=1) matches distinct polyHash over the token pipeline") {
    graft.plans.GraftExtensions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id".isNotNull)
    val kernel = docs
      .select($"doc_id", call_function("poly_shingle_hashes", $"text", lit(1)).as("hl"))
      .filter(size($"hl") > 0)
      .as[(Long, Seq[Long])].collect().map { case (d, hl) => d -> hl.sorted.toSeq }.toMap
    val pipeline = docs
      .select($"doc_id", explode(graft.operators.TextOps.tokens($"text")).as("tok"))
      .select($"doc_id", graft.operators.PortableMinHash.polyHash($"tok").as("h"))
      .groupBy($"doc_id").agg(collect_set($"h").as("hl"))
      .as[(Long, Seq[Long])].collect().map { case (d, hl) => d -> hl.sorted.toSeq }.toMap
    assert(kernel == pipeline)
  }

  test("same distinct token set (reordered, repeated) pairs at Hamming 0; unrelated never pairs") {
    val vocabA = (1 to 120).map(i => s"alpha$i")
    val corpus = Seq(
      1L -> vocabA.mkString(" "),
      2L -> (vocabA.reverse ++ vocabA.take(30)).mkString(" "), // same SET
      3L -> (1 to 120).map(i => s"omega$i").mkString(" "))
      .toDF("doc_id", "text")
    val got = PortableSimHash.pairs(corpus)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Long)].collect()
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L),
      s"set-identical docs must pair at Hamming 0, got ${got.toSeq}")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "orthogonal-vocabulary doc must not pair")
  }

  test("pigeonhole: any two 48-bit signatures within Hamming 3 share a 12-bit chunk") {
    // the blocking recall guarantee: 3 differing bits touch at most 3 of
    // the 4 chunks, so one chunk always matches exactly — checked over a
    // deterministic sweep of signatures and 3-bit perturbations
    val rng = new scala.util.Random(42)
    def chunks(sig: Long): Seq[Long] = (0 until 4).map(c => (sig >>> (c * 12)) & 0xFFFL)
    for (_ <- 1 to 500) {
      val sig = rng.nextLong() & 0xFFFFFFFFFFFFL // 48 bits
      val flips = Seq.fill(rng.nextInt(3) + 1)(rng.nextInt(48))
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      val ham = java.lang.Long.bitCount(sig ^ other)
      if (ham <= 3)
        assert(chunks(sig).zip(chunks(other)).exists(p => p._1 == p._2),
          f"sig=$sig%x other=$other%x ham=$ham must share a chunk")
    }
  }

  test("q118 clusters: planted families roll up to one row each; singletons absent") {
    val famA = (1 to 100).map(i => s"alpha$i").mkString(" ")
    val famB = (1 to 100).map(i => s"beta$i").mkString(" ")
    val lone = (1 to 100).map(i => s"gamma$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("pshc").toString
    Seq((1L, famA), (2L, famA), (3L, famA), (10L, famB), (11L, famB), (99L, lone))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = PortableSimHash.q118SimhashClusters(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 3L), (10L, 2L, 11L)),
      s"expected clusters {1:(3 docs ≤3), 10:(2 docs ≤11)}, got $got")
  }

  test("q37 and q115 agree on a planted duplicate through their full pairing pipelines") {
    val base = (1 to 150).map(i => s"tok$i").mkString(" ")
    val unrelated = (1 to 150).map(i => s"other$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("psh").toString
    Seq((1L, base), (2L, base), (3L, unrelated))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val portable = PortableSimHash.q115SimhashPortable(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val production = SimHash.foundPairs(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(portable.contains((1L, 2L)) && production.contains((1L, 2L)),
      s"both tiers must surface the planted dup: portable=$portable production=$production")
    assert(!portable.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!production.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
