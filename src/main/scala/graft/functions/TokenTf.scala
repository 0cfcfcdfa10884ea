package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token TERM-FREQUENCY encoding for a text column: ASCII-fold
  * → whitespace-split → xxhash64 per nonempty token → run-length-encode
  * into one sorted `array<bigint>` of (key « 20 | tf) entries, key =
  * hash ⋙ 21 (top 43 bits — one bit shy of 44 so the encoded long
  * stays NON-NEGATIVE and signed array order equals key order), tf
  * capped at 2²⁰−1 — the per-doc token MULTISET as a compact join
  * payload.
  *
  * This is [[ShingleHashes]]' pure-map discipline applied to weighted
  * (multiset) similarity: the relational form — explode tokens, filter,
  * groupBy (doc, tok) — shuffles every token occurrence of the corpus
  * twice before the verify stage can start, and the verify itself
  * (pair ⋈ tf ⋈ tf + Σmin aggregate) explodes to Σ_pairs |tokens| rows
  * (74.6 M at sf0.1 — measured as q158's 17.8 s). Here the multiset is
  * born in the scan and pairs score via ONE [[SortedTfMinSum]] merge
  * walk each, no aggregation.
  *
  * Collision posture: keys are 43-bit. A collision only perturbs a
  * result if two DIFFERENT tokens collide within one document (merging
  * their tf entries) or across one scored pair — both bounded by doc
  * LENGTH, not corpus size: P ≈ |doc-vocab|²/2⁴³ ≈ 10⁻⁷ for a
  * 1000-type doc, independent of how many docs the corpus holds. The
  * tf cap at 2²⁰−1 saturates only past a million repeats of one token
  * in one document.
  */
case class TokenTfEnc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_tf_enc expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_tf_enc"

  override def nullSafeEval(t: Any): Any =
    TokenTfEnc.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenTfEnc.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): TokenTfEnc =
    copy(child = newChild)
}

object TokenTfEnc {
  final val TfBits = 20
  final val TfMask = (1L << TfBits) - 1
  /** hash ⋙ KeyShift = the 43-bit key: TfBits + 1 so key « TfBits never
    * reaches the sign bit (signed sort order must equal key order).
    */
  final val KeyShift = TfBits + 1

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static per-row kernel (generated code calls it directly). Same
    * fold/trim/tokenize contract as [[ShingleHashes]] (exactly
    * `split(trim(translate(text, A-Z, a-z)), "\\s+")`), but EMPTY tokens
    * are skipped — the tf relation every oracle mirrors filters
    * `tok <> ''`.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val shared = text.getBytes
    val raw = java.util.Arrays.copyOf(shared, shared.length)
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (b >= 'A' && b <= 'Z') raw(i) = (b + 32).toByte
      i += 1
    }
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == ' ') lo += 1
    while (hi > lo && raw(hi - 1) == ' ') hi -= 1
    // nonempty token spans only (leading/trailing empty tokens of the
    // split(-1) contract carry no mass and are filtered in the mirrored
    // relational form)
    var n = 0
    i = lo
    while (i < hi) {
      while (i < hi && isWs(raw(i))) i += 1
      if (i < hi) { n += 1; while (i < hi && !isWs(raw(i))) i += 1 }
    }
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val keys = new Array[Long](n)
    var k = 0
    i = lo
    while (i < hi) {
      while (i < hi && isWs(raw(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isWs(raw(i))) i += 1
        keys(k) = XXH64.hashUnsafeBytes(
          raw, Platform.BYTE_ARRAY_OFFSET + s, i - s, 42L) >>> KeyShift
        k += 1
      }
    }
    java.util.Arrays.sort(keys)
    // RLE over equal keys → (key << TfBits | tf)
    var unique = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && keys(j) == keys(i)) j += 1
      val tf = math.min((j - i).toLong, TfMask)
      keys(unique) = (keys(i) << TfBits) | tf
      unique += 1
      i = j
    }
    new GenericArrayData(java.util.Arrays.copyOf(keys, unique))
  }
}

/** Codegen'd Σ min(tf) over two [[TokenTfEnc]]-encoded arrays: one
  * O(n+m) merge walk comparing the 43-bit key parts, accumulating the
  * smaller tf on a match — the weighted-Jaccard intersection mass
  * without the pair × |doc-tokens| join explosion. The multiset union
  * mass never needs its own walk: Σmax = tot_a + tot_b − Σmin.
  */
case class SortedTfMinSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_tf_minsum expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_tf_minsum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      val kx = xv >>> TokenTfEnc.TfBits
      val ky = yv >>> TokenTfEnc.TfBits
      if (kx == ky) {
        acc += math.min(xv & TokenTfEnc.TfMask, yv & TokenTfEnc.TfMask)
        i += 1; j += 1
      } else if (kx < ky) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val kx = ctx.freshName("kx")
      val ky = ctx.freshName("ky")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  long $kx = $xv >>> ${TokenTfEnc.TfBits};
         |  long $ky = $yv >>> ${TokenTfEnc.TfBits};
         |  if ($kx == $ky) {
         |    $acc += Math.min($xv & ${TokenTfEnc.TfMask}L, $yv & ${TokenTfEnc.TfMask}L);
         |    $i++; $j++;
         |  } else if ($kx < $ky) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedTfMinSum =
    copy(left = newLeft, right = newRight)
}
