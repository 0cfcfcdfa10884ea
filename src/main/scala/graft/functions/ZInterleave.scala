package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 16+16-bit Morton (Z-order) interleave: bit b of `x` lands
  * at result bit 2b, bit b of `y` at 2b+1 — the space-filling-curve key
  * behind multi-dimensional data clustering (Morton 1966; the layout
  * technique Delta/Iceberg expose as Z-ORDER BY). Sorting a table by
  * this key gives every contiguous row range (= every output file)
  * bounded min/max spans in BOTH dimensions, so file-level statistics
  * prune scans for predicates on either dimension — where a
  * single-column sort only ever prunes its leading column.
  *
  * Inputs are masked to their low 16 bits (callers normalize dims into
  * [0, 65535] first — q171 derives a relative hour bucket); the result
  * is a non-negative 32-bit value in a LongType, so downstream integer
  * `div` bucketing is sign-safe. Pure bit math — engine-exact against
  * the oracle's arithmetic expansion of the same definition.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave16 expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "z_interleave16"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & 0xFFFFL
    val y = b.asInstanceOf[Long] & 0xFFFFL
    var z = 0L
    var bit = 0
    while (bit < 16) {
      z |= ((x >> bit) & 1L) << (2 * bit)
      z |= ((y >> bit) & 1L) << (2 * bit + 1)
      bit += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val bit = ctx.freshName("bit")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $z = 0L;
         |for (int $bit = 0; $bit < 16; $bit++) {
         |  $z |= (($x >> $bit) & 1L) << (2 * $bit);
         |  $z |= (($y >> $bit) & 1L) << (2 * $bit + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}
