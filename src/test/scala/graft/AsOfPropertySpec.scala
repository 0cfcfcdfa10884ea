package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.AsOfJoin

/** Property-based parity for the round-5 as-of rework: over generated
  * key/time distributions and bucket widths, the bucketed and
  * single-scan-self formulations must equal the naive per-key window
  * join exactly — including empty buckets, no-match lefts, and ties.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // sparse times and few keys maximize empty-bucket and tie coverage
  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 5000L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })
  private val widthGen: Gen[Long] = Gen.oneOf(7L, 100L, 700L, 10000L)

  test("joinBucketed and joinBucketedSelf equal the naive window join") {
    check(Prop.forAll(rowsGen, rowsGen, widthGen) { (ls, rs, width) =>
      val left = ls.toDF("l_id", "k", "t")
      val right = rs.map { case (id, k, t) => (id + 1000L, k, t, id * 1.5) }
        .toDF("r_id", "rk", "rt", "payload")
      val naive = AsOfJoin.join(left, right, "k", "rk", "t", "rt",
          payload = Seq("r_id", "payload"), tieBreak = "r_id")
        .select($"l_id", $"asof_r_id").as[(Long, Option[Long])].collect().toMap
      val bucketed = AsOfJoin.joinBucketed(left, right, "k", "rk", "t", "rt",
          payload = Seq("r_id", "payload"), tieBreak = "r_id", widthSeconds = width)
        .select($"l_id", $"asof_r_id").as[(Long, Option[Long])].collect().toMap
      val src = left.select($"l_id", $"k", $"t", lit("L").as("side"),
          lit(null).cast("long").as("r_id"), lit(null).cast("double").as("payload"))
        .unionByName(right.select(lit(null).cast("long").as("l_id"),
          $"rk".as("k"), $"rt".as("t"), lit("R").as("side"), $"r_id", $"payload"))
      val self = AsOfJoin.joinBucketedSelf(src, isLeft = $"side" === "L",
          key = "k", time = "t", leftCols = Seq("l_id", "k", "t"),
          payload = Seq("r_id", "payload"), tieBreak = "r_id", widthSeconds = width)
        .select($"l_id", $"asof_r_id").as[(Long, Option[Long])].collect().toMap
      bucketed == naive && self == naive
    })
  }

  test("image header synthesis/decode round-trips for arbitrary dimensions") {
    import graft.operators.Multimodal
    check(Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535)) { (w, h) =>
      // PNG carries 32-bit dims; JPEG SOF dims are 16-bit
      val png = Multimodal.decodeImageHeader(Multimodal.syntheticPng(w, h))
      val jpg = Multimodal.decodeImageHeader(Multimodal.syntheticJpeg(w, h))
      png != null && png.getInt(0) == w && png.getInt(1) == h &&
        png.getString(3) == "png" &&
        jpg != null && jpg.getInt(0) == w && jpg.getInt(1) == h &&
        jpg.getString(3) == "jpeg"
    })
  }
}
