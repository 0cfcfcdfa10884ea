package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.sql.{Encoder, expressions}

/** Bloom-filter runtime join filter — the engine capability behind
  * "build a compact membership sketch on the dim side, prune the fact
  * side BEFORE its shuffle". Spark injects these itself for some joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); graft carries
  * its own pair so the pruning is available as an explicit, composable
  * operator (q89) with deterministic hashing:
  *
  *   - [[BloomAgg]]: a typed aggregate folding int64 keys into a
  *     fixed 2¹⁶-bit filter (1024 longs ≈ 8 KiB — broadcast-trivial).
  *     Map-side partials OR together, so the build is ONE pass with a
  *     constant-size shuffle payload per partition.
  *   - [[BloomContains]]: a codegen'd scalar probe (k = 4 double-hashed
  *     bit tests per row) — false positives possible (the exact join
  *     behind it removes them), false negatives impossible.
  *
  * Hashing is the splitmix64 finalizer (public-domain constants;
  * Steele et al., "Fast Splittable Pseudorandom Number Generators",
  * OOPSLA'14) in double-hashing form h1 + i·h2 — deterministic across
  * engines, partitionings, and re-runs.
  *
  * At 2¹⁶ bits / k=4 the filter holds ~5 000 keys at ≲1% false-positive
  * rate (n/m ≈ 0.08); a 100 TB build would size m from the dim-side
  * count the same way Spark's own runtime filter does — m is a
  * constructor parameter, not a constant.
  */
object BloomUtil {
  val NumBits = 1 << 16
  val NumWords: Int = NumBits / 64
  val NumHashes = 4

  /** splitmix64 finalizer — avalanches all 64 bits. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5bf03635dc1c7f8aL) | 1L
    var i = 0
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, NumBits).toInt
      bits(idx >> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Driver-side probe over a plain array (file-skipping sidecars —
    * [[graft.lake.FileStats]] — deserialize blooms outside any plan).
    */
  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5bf03635dc1c7f8aL) | 1L
    var i = 0
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, NumBits).toInt
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe entry shared by interpreted eval and generated code (the
    * static forwarder makes it callable from codegen'd Java).
    */
  def mightContain(bits: ArrayData, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5bf03635dc1c7f8aL) | 1L
    var i = 0
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, NumBits).toInt
      if ((bits.getLong(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Typed aggregate building the filter: buffer = the bit words, reduce
  * = set k bits, merge = bitwise OR. Commutative and idempotent, so
  * partial aggregation and speculative re-execution are both safe.
  */
class BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](BloomUtil.NumWords)
  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomUtil.add(buf, key); buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BloomAgg {
  /** Column-level entry: `bloomAgg(col("o_orderkey"))` in an `agg`. */
  def apply(): expressions.UserDefinedFunction =
    udaf(new BloomAgg, ExpressionEncoder[Long]())
}

/** `bloom_contains(bits, key)` — codegen'd membership probe. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (array<bigint>, bigint), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(bits: Any, key: Any): Any =
    BloomUtil.mightContain(bits.asInstanceOf[ArrayData], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($bits, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
