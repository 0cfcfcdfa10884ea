package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Custom Catalyst expression tests: `cosine_sim` value correctness vs a
  * reference computation, SQL registration via extensions, null/zero
  * semantics, and use on the real embeddings table.
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("cosine_sim equals reference computation on random-ish vectors") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6) * 0.1f))
    }
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        expr("cosine_sim(a.v, b.v)").as("cos"))
      .as[(Long, Long, Option[Double])].collect()

    def ref(x: Array[Float], y: Array[Float]): Option[Double] = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val nx = x.map(a => a.toDouble * a.toDouble).sum
      val ny = y.map(a => a.toDouble * a.toDouble).sum
      if (nx == 0 || ny == 0) None else Some(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    val byId = vecs.toMap
    pairs.foreach { case (ia, ib, got) =>
      val want = ref(byId(ia), byId(ib))
      (got, want) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-12, s"($ia,$ib): $g vs $w")
        case (g, w) => assert(g == w, s"($ia,$ib): $g vs $w")
      }
    }
  }

  test("self-similarity is 1; zero vector yields null") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = df.select($"id", expr("cosine_sim(v, v)").as("c"))
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-15)
    assert(out(2L).isEmpty)
  }

  test("works via SQL with session extensions and stays in codegen") {
    graft.sources.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_cs")
    val df = spark.sql(
      "SELECT vec_id, cosine_sim(embedding, embedding) AS self FROM emb_cs ORDER BY vec_id")
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    // expression must not force the plan out of whole-stage codegen
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "cosine_sim should run inside WholeStageCodegen")
  }

  test("type check rejects non-float arrays") {
    val err = intercept[Exception] {
      Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
        .select(expr("cosine_sim(v, v)")).collect()
    }
    assert(err.getMessage.contains("cosine_sim") || err.getMessage.contains("DATATYPE"),
      err.getMessage)
  }
}
