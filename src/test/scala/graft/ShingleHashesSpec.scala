package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.plans.GraftExtensions

/** `shingle_hashes` kernel: per-doc bit-exact parity with the relational
  * pipeline (`explodedShingles` → `xxhash64(shingle)`) over the real
  * corpus, plus the tokenization edge cases and codegen participation.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("hash sets match explodedShingles ∘ xxhash64 per doc over the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val viaExpr = docs
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .filter(size($"hs") > 0)
    val viaPipeline = TextOps.explodedShingles(docs, Seq("doc_id"), "text", 3)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(xxhash64($"shingle"))).as("ref"))
    val joined = viaExpr.join(viaPipeline, Seq("doc_id"), "full")
    assert(joined.filter($"hs".isNull || $"ref".isNull).count() == 0,
      "same docs must survive (≥3 tokens) in both formulations")
    assert(joined.filter($"hs" =!= $"ref").count() == 0)
  }

  test("token_hashes: per-token xxhash64 with multiplicity AND order, over the corpus") {
    // the SimHash vote input — must match transform(tokens(text),
    // xxhash64) ELEMENTWISE (no sort, no dedup: each occurrence votes)
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"text".isNotNull)
    val viaExpr = docs.select($"doc_id",
      call_function("token_hashes", $"text").as("hs"))
    val viaLambda = docs.select($"doc_id",
      transform(TextOps.tokens($"text"), t => xxhash64(t)).as("ref"))
    val joined = viaExpr.join(viaLambda, Seq("doc_id"))
    assert(joined.filter($"hs" =!= $"ref").count() == 0,
      "kernel must be elementwise-identical to the interpreted HOF form")
    // duplicates preserved: a repeated token hashes once per occurrence
    val rep = Seq(("a b a b a", 5)).toDF("text", "n")
      .select(call_function("token_hashes", $"text").as("hs"))
      .select(size($"hs").as("n"), size(array_distinct($"hs")).as("nd"))
      .as[(Int, Int)].head()
    assert(rep == ((5, 2)), s"multiplicity lost: $rep")
  }


  test("ordered_shingle_hashes: positional grams match the window-lead pipeline elementwise") {
    // the q125/q145 positional relation: element k = xxhash64 of the
    // 3-gram at token position k, duplicates and order kept — must
    // equal the posexplode + lead + concat_ws construction exactly
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"text".isNotNull)
    val viaExpr = docs.select($"doc_id",
      call_function("ordered_shingle_hashes", $"text", lit(3)).as("ghs"))
    val byPos = Window.partitionBy($"doc_id").orderBy($"pos")
    val viaPipeline = docs
      .select($"doc_id", posexplode(TextOps.tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("l1", lead($"tok", 1).over(byPos))
      .withColumn("l2", lead($"tok", 2).over(byPos))
      .filter($"l2".isNotNull)
      .withColumn("gh", xxhash64(concat_ws(" ", $"tok", $"l1", $"l2")))
      .groupBy($"doc_id")
      .agg(array_agg(struct($"pos", $"gh")).as("ps"))
      .select($"doc_id",
        transform(array_sort($"ps"), x => x("gh")).as("ref"))
    val joined = viaExpr.filter(size($"ghs") > 0)
      .join(viaPipeline, Seq("doc_id"), "full")
    assert(joined.filter($"ghs".isNull =!= $"ref".isNull).count() == 0)
    assert(joined.filter($"ghs".isNotNull && $"ghs" =!= $"ref").count() == 0)
  }

  test("tokenization edges: leading whitespace, repeated separators, short docs") {
    val cases = Seq(
      (1L, "One two three four"),     // fold + plain
      (2L, "\tab cd ef"),             // leading tab → leading empty token
      (3L, "  a  bc   d  "),    // 0x20-trim, mixed separators
      (4L, "one two"),                // < w tokens → empty
      (5L, ""),                       // empty text
      (6L, "x\ny\rz\fw"),             // every separator class
      (7L, "ab cd ef\t"),             // trailing tab → trailing empty token
      (8L, "ab cd ef\r\n"),           // trailing CRLF run → ONE trailing empty
      (9L, "\tab cd\n"),              // leading AND trailing empties
      (10L, "\t \t"),                 // ws-only: 0x20-trim leaves "\t \t" → ["",""]
      (11L, "ab cd ef \t "))          // 0x20-trim exposes the tab → trailing empty
    val df = cases.toDF("doc_id", "text")
    val viaExpr = df
      .select($"doc_id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
    val viaPipeline = TextOps.explodedShingles(df, Seq("doc_id"), "text", 3)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(xxhash64($"shingle"))).as("ref"))
    val merged = viaExpr.join(viaPipeline, Seq("doc_id"), "left")
      .select($"doc_id", $"hs", coalesce($"ref", array().cast("array<bigint>")).as("ref"))
      .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
    merged.foreach { case (id, hs, ref) =>
      assert(hs == ref, s"doc $id: $hs vs $ref")
    }
    // the fold actually folds: "One two three four" ≡ "one TWO THREE FOUR"
    val a = ShingleHashesSpecHelper.hashes("One two three four")
    val b = ShingleHashesSpecHelper.hashes("one TWO THREE FOUR")
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }

  test("stays in whole-stage codegen and does not corrupt the input column") {
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").createOrReplaceTempView("sh_docs")
    val df = spark.sql(
      "SELECT doc_id, text, shingle_hashes(text, 3) AS hs FROM sh_docs")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
    // in-place fold must work on a COPY: text read back unchanged
    val texts = df.select($"text").as[String].collect()
    val orig = graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    assert(texts.count(_.exists(_.isUpper)) == orig.count(_.exists(_.isUpper)),
      "source text must keep its original case")
  }
}

object ShingleHashesSpecHelper {
  def hashes(s: String): Array[Long] =
    graft.functions.ShingleHashes
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), 3)
      .toLongArray()
}
