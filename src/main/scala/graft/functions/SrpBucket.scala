package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd sign-random-projection bucket id for an `array<float>`
  * embedding (Charikar'02 SRP LSH; used by [[graft.operators.AnnLsh]]).
  *
  * Bit p of the result is the sign of the dot product between the
  * embedding and pseudo-random hyperplane p, whose weight for dimension i
  * is `xxhash64(p, i) / Long.MaxValue` ∈ [-1, 1] — fully deterministic,
  * no RNG state, zero broadcast; identical on every executor.
  *
  * This replaces an `aggregate(zip_with(...))` formulation that Spark
  * evaluates INTERPRETED per element, with Catalyst inlining the child
  * into every lambda reference — `planes` interpreted array walks per
  * row. Here: one fused two-level loop, one xxhash per (plane, dim),
  * inside whole-stage codegen. Bit-for-bit parity with the lambda form
  * is asserted in SrpBucketSpec (same seed chain — xxhash64's seed-42
  * fold — and same left-to-right double accumulation order).
  */
case class SrpBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects (array<float>, planes in [1,63]), got " +
        s"(${child.dataType.sql}, $planes)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "srp_bucket"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      // same hash chain as xxhash64(lit(p), i): seed 42, fold p then i
      val seedP = XXH64.hashInt(p, 42L)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += arr.getFloat(i).toDouble *
          (XXH64.hashInt(i, seedP).toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val seedP = ctx.freshName("seedP")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $x.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $seedP = $xxh.hashInt($p, 42L);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $x.getFloat($i) *
         |      ((double) $xxh.hashInt($i, $seedP) / (double) Long.MAX_VALUE);
         |  }
         |  if ($dot > 0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
