package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** `token_tf_enc` / `sorted_tf_minsum` kernels (q158's verify stage):
  * the encoded multiset must match the relational tf form bit-for-bit,
  * the merge walk must equal the exploded Σmin, and both must codegen.
  */
class TokenTfSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val TfBits = graft.functions.TokenTfEnc.TfBits
  private val TfMask = graft.functions.TokenTfEnc.TfMask

  test("token_tf_enc equals the relational explode→filter→groupBy tf form on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id".isNotNull)
    val kernel = docs.select($"doc_id",
      call_function("token_tf_enc", $"text").as("enc"))
    val relational = docs
      .select($"doc_id", explode(graft.operators.TextOps.tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id",
        shiftrightunsigned(xxhash64($"tok"), graft.functions.TokenTfEnc.KeyShift).as("key"))
      .agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(
        shiftleft($"key", TfBits).bitwiseOR(least($"tf", lit(TfMask))))).as("enc"))
    val joined = kernel.join(relational.withColumnRenamed("enc", "enc_ref"), Seq("doc_id"))
    assert(joined.count() > 0)
    assert(joined.filter(not($"enc" <=> $"enc_ref")).count() == 0,
      "kernel encoding diverged from the relational tf form")
    // docs absent from the relational side (no nonempty tokens) must
    // encode empty, not diverge silently
    val onlyKernel = kernel.join(relational.select($"doc_id"), Seq("doc_id"), "left_anti")
    assert(onlyKernel.filter(size($"enc") =!= 0).count() == 0)
  }

  test("token_tf_enc tokenizer edges match the relational form (whitespace, casing, empty)") {
    // the ShingleHashesSpec edge discipline: leading/trailing non-0x20
    // whitespace, mixed case folding, repeats, and the empty string
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "\ta b\n"), (4L, "A A a"), (5L, "x"),
      (6L, " spaced  out "), (7L, "ab\fc\rd"), (8L, "ZZZ zzz Zzz"))
      .toDF("doc_id", "text")
    val kernel = docs.select($"doc_id",
      call_function("token_tf_enc", $"text").as("enc"))
    val relational = docs
      .select($"doc_id", explode(graft.operators.TextOps.tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id",
        shiftrightunsigned(xxhash64($"tok"), graft.functions.TokenTfEnc.KeyShift).as("key"))
      .agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(
        shiftleft($"key", TfBits).bitwiseOR(least($"tf", lit(TfMask))))).as("enc"))
    val got = kernel.join(relational.withColumnRenamed("enc", "enc_ref"), Seq("doc_id"), "left")
      .select($"doc_id", $"enc", coalesce($"enc_ref", typedLit(Seq.empty[Long])).as("enc_ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: kernel ${r.getSeq[Long](1)} != relational ${r.getSeq[Long](2)}")
    }
    // tf of the case-folded repeat: "A A a" → one key with tf 3
    val d4 = got.find(_.getLong(0) == 4L).get.getSeq[Long](1)
    assert(d4.length == 1 && (d4.head & TfMask) == 3L)
  }

  test("sorted_tf_minsum equals the exploded Σmin on random multisets; edges") {
    val rnd = new scala.util.Random(13)
    def enc(m: Map[Long, Long]): Seq[Long] =
      m.toSeq.sortBy(_._1).map { case (k, tf) => (k << TfBits) | math.min(tf, TfMask) }
    def multiset() = (0 until rnd.nextInt(40))
      .map(_ => rnd.nextInt(60).toLong -> (rnd.nextInt(5) + 1).toLong).toMap
    val rows = Seq.fill(300) { (multiset(), multiset()) }
    val want = rows.map { case (a, b) =>
      a.keySet.intersect(b.keySet).toSeq.map(k => math.min(a(k), b(k))).sum
    }
    val got = rows.map { case (a, b) => (enc(a), enc(b)) }
      .toDF("a", "b")
      .withColumn("ms", call_function("sorted_tf_minsum", $"a", $"b"))
      .select($"ms").as[Long].collect().toSeq
    assert(got == want)
    val edges = Seq(
      (Seq.empty[Long], Seq((1L << TfBits) | 3L)),
      (Seq((1L << TfBits) | 3L), Seq((2L << TfBits) | 3L)),
      (Seq((5L << TfBits) | 7L), Seq((5L << TfBits) | 2L)))
      .toDF("a", "b")
      .withColumn("ms", call_function("sorted_tf_minsum", $"a", $"b"))
      .select($"ms").as[Long].collect().toSeq
    assert(edges == Seq(0L, 0L, 2L))
    val withNull = spark.sql(
      "SELECT sorted_tf_minsum(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c")
    assert(withNull.head.isNullAt(0))
  }

  test("both kernels participate in whole-stage codegen") {
    graft.sources.Tables.documents(spark, sf)
      .createOrReplaceTempView("ttf_docs")
    val df = spark.sql(
      """SELECT doc_id, sorted_tf_minsum(token_tf_enc(text), token_tf_enc(text)) AS s
        |FROM ttf_docs WHERE doc_id IS NOT NULL""".stripMargin)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
