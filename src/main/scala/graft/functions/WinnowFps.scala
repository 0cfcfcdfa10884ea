package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing document fingerprints (Schleimer, Wilkerson &
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03): character k-gram ROLLING hashes → sliding-window-of-w
  * minima → sorted distinct selection. Winnowing guarantees any shared
  * substring of length ≥ k + w − 1 contributes at least one common
  * fingerprint, which is what makes the selected set a dedup signal.
  *
  * One fused per-row kernel, O(n) per document:
  *  - the k-gram hash is a TRUE rolling polynomial hash — base-31 over
  *    code points, O(1) per slide (`h' = (h − c_out·31^(k−1))·31 + c_in`)
  *    instead of re-hashing k chars per position;
  *  - window minima come from a monotonic deque (amortized O(1) per
  *    window), not an O(w) rescan.
  *
  * The hash is EXACT integer arithmetic with no modulus: code points are
  * ≤ 0x10FFFF and k ≤ 8, so the largest value (≈ 3.2·10^16, and ≤
  * 7.7·10^18 mid-update) fits a 64-bit long — which is what makes the
  * fingerprints reproducible in portable SQL (the DuckDB oracle computes
  * the identical polynomial with LEAD windows; q56). Engine-specific
  * seeds (xxhash64) would have forced a rows-only check.
  *
  * Input normalization matches the corpus conventions elsewhere
  * ([[graft.operators.TextOps.tokens]]): ASCII A–Z fold (≡ DuckDB LOWER
  * on ASCII text) and 0x20-only trim. Unlike the token-level shingles,
  * whitespace inside the text is hashed as ordinary characters —
  * winnowing is a character-stream scheme.
  *
  * Returns the ascending distinct fingerprint array; empty when fewer
  * than k + w − 1 characters remain after trimming; null for null input.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 2 && k <= 8 && w >= 1 && w <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects (string, k in [2,8], w in [1,64]), got (${other.sql}, $k, $w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(t: Any): Any =
    WinnowFps.compute(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WinnowFps.compute($x, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** The per-row kernel (static so generated code calls it directly). */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    // 0x20-only trim, matching trim()/DuckDB TRIM
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    // code points with ASCII A-Z fold (≡ translate(text, A-Z, a-z))
    val cps = new Array[Int](hi - lo)
    var n = 0
    var i = lo
    while (i < hi) {
      val cp = s.codePointAt(i)
      cps(n) = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
      n += 1
      i += Character.charCount(cp)
    }
    val grams = n - k + 1          // k-gram count
    val windows = grams - w + 1    // complete winnowing windows
    if (windows < 1) return new GenericArrayData(Array.empty[Long])
    // base-31 polynomial rolling hash over the code points
    var pow = 1L                   // 31^(k-1)
    var j = 1
    while (j < k) { pow *= 31L; j += 1 }
    var h = 0L
    j = 0
    while (j < k) { h = h * 31L + cps(j); j += 1 }
    // sliding-window minimum via monotonic deque over gram positions;
    // ring buffers sized at the gram count (w can exceed it only when
    // windows < 1, already handled)
    val hashes = new Array[Long](grams)
    hashes(0) = h
    var p = 1
    while (p < grams) {
      h = (h - cps(p - 1) * pow) * 31L + cps(p + k - 1)
      hashes(p) = h
      p += 1
    }
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](windows)
    var nOut = 0
    p = 0
    while (p < grams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (deque(head) <= p - w) head += 1
      if (p >= w - 1) { out(nOut) = hashes(deque(head)); nOut += 1 }
      p += 1
    }
    java.util.Arrays.sort(out)
    var unique = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(unique) = out(i); unique += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, unique))
  }
}
