package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct word-w-shingle hashes for a text column: ASCII-fold
  * → whitespace-split → w-gram → xxhash64 → sorted distinct, as ONE fused
  * per-row kernel.
  *
  * This replaces the relational shingle pipeline
  * ([[graft.operators.TextOps.explodedShingles]]: posexplode tokens →
  * window `lead`s → distinct) for consumers that only need the hashes —
  * that pipeline's first shuffle carries every (doc, pos, token) row
  * through a per-doc sort, which is the single biggest intermediate in
  * the dedup queries. Here the corpus is scanned, hashed and reduced to
  * one compact `array<bigint>` per doc with NO shuffle at all.
  *
  * Bit-exact parity with the pipeline (asserted per-doc in
  * ShingleHashesSpec): tokenization replicates
  * `split(trim(translate(text, A-Z, a-z)), "\\s+")` exactly — trim strips
  * 0x20 only, and Spark's split passes limit -1, so a leading OR trailing
  * run of other whitespace keeps an empty token — and each shingle hashes
  * the same bytes as `xxhash64(concat_ws(" ", tokens…))` (seed 42).
  * Output order is ascending (the pipeline's row order is arbitrary;
  * every consumer is order-independent).
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 && w <= 16 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, w in [1,16]), got (${other.sql}, $w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($x, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** POSITIONAL sibling of [[ShingleHashes]]: the same fused
  * tokenize/shingle/xxhash64 kernel but with hashes in TOKEN-POSITION
  * order, duplicates kept — element k is the hash of the w-gram starting
  * at token k, so `posexplode` over the result replaces the positional
  * gram pipeline (posexplode tokens → window `lead`s → concat) the
  * span-level queries (q125 coverage, q145 removal) previously ran:
  * that shape shuffles every (doc, pos, token) row through a per-doc
  * sort just to build strings that immediately become group/join keys;
  * here gram identity is an 8-byte hash born directly in the scan.
  */
case class OrderedShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 && w <= 16 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_shingle_hashes expects (string, w in [1,16]), got (${other.sql}, $w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ordered_shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.computeOrdered(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.computeOrdered($x, $w);")

  override protected def withNewChildInternal(newChild: Expression): OrderedShingleHashes =
    copy(child = newChild)
}

/** Portable-hash sibling of [[ShingleHashes]]: identical tokenize/shingle
  * kernel, base-31-mod-M polynomial hash instead of xxhash64 — the
  * oracle-reproducible variant q79 builds its MinHash on. ASCII corpus
  * assumption: the fold is over bytes (matching the kernel's byte-level
  * ASCII tokenizer); on multi-byte text it would diverge from a
  * codepoint-level fold.
  */
case class PolyShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 && w <= 16 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_shingle_hashes expects (string, w in [1,16]), got (${other.sql}, $w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poly_shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.computePoly(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.computePoly($x, $w);")

  override protected def withNewChildInternal(newChild: Expression): PolyShingleHashes =
    copy(child = newChild)
}

/** Per-token xxhash64 hashes with MULTIPLICITY AND ORDER preserved —
  * the SimHash vote input ([[SimHashSig]] needs one vote per token
  * OCCURRENCE, so [[ShingleHashes]]' sorted-distinct output is the
  * wrong relation). Same tokenizer, same per-token bytes and seed as
  * `xxhash64(token)` over `TextOps.tokens(text)` — bit-identical to
  * the retired `transform(tokens(text), t -> xxhash64(t))` form, but
  * codegen'd: higher-order functions evaluate interpreted (~1 µs per
  * token of expression-eval overhead — measured as a full second of
  * serial scan-stage time at sf0.1), while this is one static kernel
  * call per row inside the WholeStageCodegen span.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.computeTokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.computeTokens($x);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** The per-row kernel (static so generated code calls it directly —
    * one call per row inside the WholeStageCodegen span).
    */
  def compute(text: UTF8String, w: Int): GenericArrayData =
    computeImpl(text, w, poly = false)

  /** [[TokenHashes]]' kernel: 1-shingles, duplicates and order kept. */
  def computeTokens(text: UTF8String): GenericArrayData =
    computeImpl(text, 1, poly = false, sortedDistinct = false)

  /** [[OrderedShingleHashes]]' kernel: w-shingles in token-position
    * order, duplicates kept (element k = hash of the gram at token k).
    */
  def computeOrdered(text: UTF8String, w: Int): GenericArrayData =
    computeImpl(text, w, poly = false, sortedDistinct = false)

  /** [[PolyShingleHashes]]' kernel: same tokenize/shingle pass, but each
    * shingle hashes via the PORTABLE base-31 polynomial mod 2⁵³-range M
    * (fold (acc·31 + byte) mod M over the shingle bytes) — bit-equal to
    * the relational `aggregate(split(s,""), …)` form on ASCII text and
    * reproducible in any engine with exact int64 (DuckDB list_reduce).
    */
  def computePoly(text: UTF8String, w: Int): GenericArrayData =
    computeImpl(text, w, poly = true)

  private val PolyM = 9007199254740881L

  private def computeImpl(text: UTF8String, w: Int, poly: Boolean,
                          sortedDistinct: Boolean = true): GenericArrayData = {
    // getBytes may return the UTF8String's BACKING array — copy before
    // the in-place fold or we'd corrupt the row's data
    val shared = text.getBytes
    val raw = java.util.Arrays.copyOf(shared, shared.length)
    // ASCII fold (exactly translate(text, A-Z, a-z): the 26 ASCII letters)
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (b >= 'A' && b <= 'Z') raw(i) = (b + 32).toByte
      i += 1
    }
    // trim: 0x20 only, matching trim()/DuckDB TRIM
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == ' ') lo += 1
    while (hi > lo && raw(hi - 1) == ' ') hi -= 1
    // Java split("\s+", -1) semantics over [lo, hi) — Spark's split()
    // passes limit = -1, so BOTH a leading separator run AND a trailing
    // one yield an empty token, and the empty string splits to [""].
    // Token spans as (start, end) offset pairs.
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (lo < hi && isWs(raw(lo))) { starts.add(lo); ends.add(lo) } // leading ""
    i = lo
    while (i < hi) {
      while (i < hi && isWs(raw(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isWs(raw(i))) i += 1
        starts.add(s); ends.add(i)
      }
    }
    // trailing "" when the trimmed text ends in non-0x20 whitespace;
    // [""] for the empty string (split("") = [""] at limit -1)
    if (lo == hi || isWs(raw(hi - 1))) { starts.add(hi); ends.add(hi) }
    val n = starts.size()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    // one scratch buffer reused across shingles; hash the exact bytes of
    // concat_ws(" ", tok_i … tok_{i+w-1})
    var maxLen = 0
    var k = 0
    while (k <= n - w) {
      var len = w - 1
      var j = 0
      while (j < w) { len += ends.get(k + j) - starts.get(k + j); j += 1 }
      if (len > maxLen) maxLen = len
      k += 1
    }
    val scratch = new Array[Byte](maxLen)
    val hashes = new Array[Long](n - w + 1)
    k = 0
    while (k <= n - w) {
      var p = 0
      var j = 0
      while (j < w) {
        if (j > 0) { scratch(p) = ' '; p += 1 }
        val s = starts.get(k + j)
        val e = ends.get(k + j)
        System.arraycopy(raw, s, scratch, p, e - s)
        p += e - s
        j += 1
      }
      if (poly) {
        var acc = 0L
        var q = 0
        while (q < p) { acc = (acc * 31 + scratch(q)) % PolyM; q += 1 }
        hashes(k) = acc
      } else {
        hashes(k) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, p, 42L)
      }
      k += 1
    }
    if (!sortedDistinct) return new GenericArrayData(hashes)
    java.util.Arrays.sort(hashes)
    var unique = 0
    i = 0
    while (i < hashes.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { hashes(unique) = hashes(i); unique += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, unique))
  }
}
