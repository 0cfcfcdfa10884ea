package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd one-hash-K-rehashes MinHash signature (Broder; the
  * single-hash variant analyzed by Li & König, "b-Bit Minwise Hashing")
  * over a document's 64-bit shingle-hash array: signature element i is
  * `min over h of ((a_i·h31 + b_i) mod P)` with `h31 = h & 0x7FFFFFFF`,
  * P = 2³¹−1 (Mersenne prime) and the same affine coefficients as
  * [[graft.operators.MinHashLsh]] (a is 30-bit so products stay < 2⁶¹ —
  * no ANSI-mode overflow — and a mod P is never 0).
  *
  * THE MODULO IS LOAD-BEARING: without it the rehash `a·h + b` is
  * MONOTONE in h (a > 0), so all K functions share one argmin — the
  * doc's minimum base hash — and the "K permutations" collapse to a
  * single Bernoulli(J) trial per pair. Measured on the shipped corpus
  * before the fix: banding missed 5 of 256 J ≥ 0.89 pairs at sf0.1
  * (expected miss rate (1−J) ≈ 11% per pair), where honest 16×2 banding
  * predicts ~10⁻¹¹. The mod folds the order back over itself, restoring
  * per-function independence.
  *
  * Why an Expression and not K aggregate columns: computing the signature
  * FROM the collected hash array lets the per-doc relation carry exactly
  * one payload column (`hs`), so every downstream branch (banding, exact
  * verify) consumes identical columns — which is what lets Spark's
  * exchange-reuse fire and run the expensive shingle pipeline once. The
  * lambda alternative (`transform` + `array_min` × K) evaluates
  * interpreted per element; this is one fused two-level loop inside
  * whole-stage codegen. Parity with the aggregate formulation is asserted
  * in MinHashSigSpec.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 && k <= 512 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<bigint>, k in [1,512]), got " +
        s"(${child.dataType.sql}, $k)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullable even over non-null input: an EMPTY shingle array yields null
  // (no minimum exists). The alternative — k copies of Long.MaxValue —
  // would band every empty doc into one giant spurious candidate bucket
  // for SQL users who don't replicate q36's size(hs) > 0 pre-filter.
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val ai = (((2L * i + 1L) * 0x9E3779B97F4A7C15L) & 0x3FFFFFFFL) | 1L
      val bi = (i * 0xBF58476D1CE4E5B9L) & 0x3FFFFFFFL
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = arr.getLong(j) & 0x7FFFFFFFL
        val v = (ai * h + bi) % 2147483647L
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ai = ctx.freshName("ai")
      val bi = ctx.freshName("bi")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $ai = (((2L * $i + 1L) * 0x9E3779B97F4A7C15L) & 0x3FFFFFFFL) | 1L;
         |    long $bi = (((long) $i) * 0xBF58476D1CE4E5B9L) & 0x3FFFFFFFL;
         |    long $m = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $v = ($ai * ($x.getLong($j) & 0x7FFFFFFFL) + $bi) % 2147483647L;
         |      if ($v < $m) $m = $v;
         |    }
         |    $out[$i] = $m;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
