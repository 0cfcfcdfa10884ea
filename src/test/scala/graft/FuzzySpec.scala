package graft

import org.apache.spark.sql.functions._

/** q154–q157 — the round-10 additions: cluster-safe split leakage
  * invariant, Heaps-curve shape, SymSpell deletion-blocking recall
  * (vs an in-suite brute force), containment directionality (the case
  * symmetric Jaccard is blind to).
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("q154: near-dup cluster members always share a split (leakage invariant)") {
    val out = graft.operators.Curation.q154ClusterSafeSplit(spark, sf)
      .localCheckpoint()
    // every doc assigned exactly once
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id".isNotNull).count()
    assert(out.count() == docs)
    // clustered docs: one distinct split per group_rep
    val leaky = out.filter($"clustered")
      .groupBy($"group_rep").agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(leaky == 0, "a near-dup cluster straddles the train/val/test boundary")
    // and the clusters are non-trivial at this SF (the invariant is exercised)
    assert(out.filter($"clustered").count() > 0)
    // all three splits exist and bucket arithmetic is the q128 convention
    val splits = out.select($"split").distinct().as[String].collect().sorted
    assert(splits.sameElements(Array("test", "train", "val")))
  }

  test("q155: Heaps curve is cumulative, positive, and totals the distinct type count") {
    val r = graft.operators.CorpusOps.q155HeapsLaw(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty && r.forall(_._2 > 0))
    // deciles ascend, cum strictly increases by new_types
    r.sliding(2).foreach {
      case Array((d0, _, c0), (d1, n1, c1)) =>
        assert(d1 > d0 && c1 == c0 + n1)
      case _ =>
    }
    graft.plans.GraftExtensions.register(spark)
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
      .select(explode(call_function("shingle_hashes", $"text", lit(3))).as("sh"))
      .select(countDistinct($"sh")).as[Long].head()
    assert(r.last._3 == total, "final cumulative vocab must equal the distinct type count")
  }

  test("q156: deletion-neighborhood blocking equals brute-force lev<=2 on an adversarial vocab") {
    // crafted vocab hitting every edit shape at distance 1 and 2:
    // substitution, insertion, deletion, and their combinations, plus
    // pairs at distance 3 that any sloppy blocking would over-admit
    val words = Seq(
      "color", "colour", "colors", "kolor", "colr", "coulor",
      "table", "cable", "tables", "tale", "stable",
      "spark", "shark", "spars", "sprak", // transposition = lev 2
      "zebra", "quartz")
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, (w + " ") * 3) }
      .toDF("doc_id", "text")
    // run the engine path on a temp parquet dir masquerading as a dataset
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Fuzzy.q156TokenVariants(spark, dir)
      .select($"token_a", $"token_b", $"dist")
      .as[(String, String, Long)].collect().toSet
    // brute force over the same universe (length >= 3)
    val uni = words.filter(_.length >= 3)
    val expected = (for {
      a <- uni; b <- uni if a < b
      d = levDist(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("q158: weighted Jaccard separates mass from types — exact dup scores 1000, doubled copy half") {
    graft.plans.GraftExtensions.register(spark)
    val phrase = (1 to 20).map(i => s"p$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_wj").toString
    Seq(
      (1L, phrase),                      // single copy
      (2L, phrase + " " + phrase),       // SAME token types, double mass
      (3L, phrase), (4L, phrase))        // exact dup pair
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Fuzzy.q158WeightedJaccard(spark, dir)
      .select($"doc_a", $"doc_b", $"wj_milli")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, m) => ((a, b), m) }.toMap
    // exact duplicates: full mass overlap
    assert(got((3L, 4L)) == 1000L && got((1L, 3L)) == 1000L)
    // type-identical but mass-doubled: multiset J = 20/40 = 0.5 → below
    // the 600 bar, EXCLUDED — the case set-Jaccard scores as 1.0
    assert(!got.contains((1L, 2L)) && !got.contains((2L, 3L)),
      s"doubled copy must fall under the weighted bar: $got")
  }

  test("q157: containment sees a short doc pasted into a long one; Jaccard at the same bar does not") {
    graft.plans.GraftExtensions.register(spark)
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val host = quote + " " + (1 to 200).map(i => s"h$i").mkString(" ")
    val noise = (1 to 50).map(i => s"n$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_contain").toString
    Seq((1L, quote), (2L, host), (3L, noise))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Fuzzy.q157ContainmentJoin(spark, dir)
      .select($"contained_doc", $"container_doc", $"containment_milli")
      .as[(Long, Long, Long)].collect()
    // doc1's 8 shingles all appear in doc2 → containment 1000, directed 1→2 only
    assert(got.toSeq == Seq((1L, 2L, 1000L)), got.mkString(","))
    // symmetric Jaccard on the same pair is far below any dedup bar
    val pairs = graft.operators.TextOps.prefixJaccardPairs(
      spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
        .filter(size($"hs") > 0),
      "doc_id", 0.8)
    assert(pairs.count() == 0, "Jaccard@0.8 must be blind to the inclusion")
  }
}
