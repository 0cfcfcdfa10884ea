package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whole-string portable polynomial hash: fold
  * (acc·31 + codepoint) mod 9007199254740881 (the < 2^53 prime the
  * portable sketch tier standardized on — [[graft.operators
  * .PortableMinHash.polyHash]] is the HOF twin, `list_reduce` over
  * `ord()` the DuckDB twin). Unlike xxhash64 (engine-specific seed and
  * internals) this is reproducible in ANY engine with exact int64 —
  * the property a cross-system integrity digest (q178) depends on.
  *
  * Folding over CODEPOINTS, not bytes, to stay bit-identical with the
  * `split('')`/`ascii()` HOF form and DuckDB's `ord()`; the fold never
  * overflows (acc < 2^53, ·31 < 2^58). Empty string hashes to 0 (the
  * HOF's init accumulator; NOTE DuckDB's init-less `list_reduce`
  * errors on '' — feed NULL-guarded non-empty canonical strings).
  * One static call per row inside the WholeStageCodegen span — the
  * HOF evaluates one interpreted lambda per character.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(t: Any): Any =
    PolyHash.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PolyHash.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val M = 9007199254740881L

  def compute(s: UTF8String): Long = {
    var acc = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) acc = (acc * 31 + it.nextInt()) % M
    acc
  }
}
