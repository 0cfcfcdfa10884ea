package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** N-ary codegen'd Morton (Z-order) interleave — [[ZInterleave]]'s
  * 2×16-bit layout generalized to k dimensions (round-11 verdict item
  * 7: a (user, hour, symbol) clustering needs 3 dims). Bit b of
  * dimension i lands at result bit `k*b + i`; each input is masked to
  * its low `63/k` bits (k=3 → 21 bits/dim, top occupied position
  * 3·20+2 = 62 — below the sign bit, so downstream `div` bucketing
  * stays sign-safe; callers normalize dims into [0, 2^(63/k)) first,
  * the same contract as z_interleave16).
  *
  * Sorting by this key gives every contiguous row range bounded
  * min/max spans in ALL k dimensions at once, so file statistics prune
  * for a predicate on ANY of them — each extra dimension trades some
  * per-dimension tightness (fewer bits each) for coverage, the
  * standard Z-ORDER BY trade-off. Pure bit math, engine-exact against
  * an oracle's arithmetic expansion of the same definition.
  */
case class ZInterleaveN(children: Seq[Expression]) extends Expression {

  private def k = children.size
  private def bitsPerDim = 63 / k

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("z_interleave_n needs at least 2 dims")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave_n expects bigint dims, got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "z_interleave_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val dims = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      dims(i) = v.asInstanceOf[Long] & ((1L << bitsPerDim) - 1)
      i += 1
    }
    var z = 0L
    var bit = 0
    while (bit < bitsPerDim) {
      var d = 0
      while (d < k) {
        z |= ((dims(d) >> bit) & 1L) << (k * bit + d)
        d += 1
      }
      bit += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val dims = ctx.freshName("dims")
    val z = ctx.freshName("z")
    val bit = ctx.freshName("bit")
    val d = ctx.freshName("d")
    val mask = (1L << bitsPerDim) - 1
    val loadDims = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $dims[$i] = ${e.value} & ${mask}L; }
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = 0L;
         |long[] $dims = new long[$k];
         |$loadDims
         |if (!${ev.isNull}) {
         |  long $z = 0L;
         |  for (int $bit = 0; $bit < $bitsPerDim; $bit++) {
         |    for (int $d = 0; $d < $k; $d++) {
         |      $z |= (($dims[$d] >> $bit) & 1L) << ($k * $bit + $d);
         |    }
         |  }
         |  ${ev.value} = $z;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleaveN =
    copy(children = newChildren)
}
