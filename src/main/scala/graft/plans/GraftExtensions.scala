package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{BloomContains, CollectCapped, CosineSim, FxpDot, MinHashSig, OrderedShingleHashes, PolyShingleHashes, ShingleHashes, SimHashSig, SortedIntersectCount, SortedTfMinSum, SrpBucket, TokenHashes, TokenTfEnc, WinnowFps}

/** SparkSessionExtensions wiring for graft's custom Catalyst surface
  * (currently one codegen'd expression; the injection point generalizes
  * to optimizer `Rule`s / `SparkStrategy`s — SURVEY.md §4 concluded none
  * are needed for reference parity, so none are injected).
  *
  * Activate with `spark.sql.extensions=graft.plans.GraftExtensions`
  * ([[graft.Session.build]] does), or call [[GraftExtensions.register]]
  * on an existing session (used by queries so they work under any
  * driver-provided session too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val cosineSimDescriptor = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)): Expression)

  private val srpBucketDescriptor = (
    new FunctionIdentifier("srp_bucket"),
    new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
    (children: Seq[Expression]) => {
      // plane count must be a compile-time literal: it shapes the
      // generated loop, so a runtime column makes no sense here
      val planes = children.lift(1) match {
        case None => graft.operators.AnnLsh.DefaultPlanes
        case Some(Literal(v: Int, IntegerType)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"srp_bucket: planes must be an integer literal, got $other")
      }
      SrpBucket(children.head, planes): Expression
    })

  private val minhashSigDescriptor = (
    new FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      // k must be a literal: it sizes the generated signature loop
      val k = children.lift(1) match {
        case None => graft.operators.MinHashLsh.K
        case Some(Literal(v: Int, IntegerType)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"minhash_sig: k must be an integer literal, got $other")
      }
      MinHashSig(children.head, k): Expression
    })

  private val simhashSigDescriptor = (
    new FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
    (children: Seq[Expression]) => SimHashSig(children.head): Expression)

  private val shingleHashesDescriptor = (
    new FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (children: Seq[Expression]) => {
      val w = children.lift(1) match {
        case None => 3
        case Some(Literal(v: Int, IntegerType)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"shingle_hashes: w must be an integer literal, got $other")
      }
      ShingleHashes(children.head, w): Expression
    })

  private val polyShingleHashesDescriptor = (
    new FunctionIdentifier("poly_shingle_hashes"),
    new ExpressionInfo(classOf[PolyShingleHashes].getName, "poly_shingle_hashes"),
    (children: Seq[Expression]) => {
      val w = children.lift(1) match {
        case None => 3
        case Some(Literal(v: Int, IntegerType)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"poly_shingle_hashes: w must be an integer literal, got $other")
      }
      PolyShingleHashes(children.head, w): Expression
    })

  private val orderedShingleHashesDescriptor = (
    new FunctionIdentifier("ordered_shingle_hashes"),
    new ExpressionInfo(classOf[OrderedShingleHashes].getName, "ordered_shingle_hashes"),
    (children: Seq[Expression]) => {
      val w = children.lift(1) match {
        case None => 3
        case Some(Literal(v: Int, IntegerType)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"ordered_shingle_hashes: w must be an integer literal, got $other")
      }
      OrderedShingleHashes(children.head, w): Expression
    })

  private val tokenHashesDescriptor = (
    new FunctionIdentifier("token_hashes"),
    new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
    (children: Seq[Expression]) => TokenHashes(children.head): Expression)

  private val fxpDotDescriptor = (
    new FunctionIdentifier("fxp_dot"),
    new ExpressionInfo(classOf[FxpDot].getName, "fxp_dot"),
    (children: Seq[Expression]) => FxpDot(children.head, children(1)): Expression)

  private val collectCappedDescriptor = (
    new FunctionIdentifier("collect_capped"),
    new ExpressionInfo(classOf[CollectCapped].getName, "collect_capped"),
    (children: Seq[Expression]) => {
      // the cap bounds the aggregation buffer, so it must be a plan-time
      // literal, not a runtime column
      val cap = children.lift(1) match {
        case Some(Literal(v: Int, IntegerType)) => v
        case other => throw new IllegalArgumentException(
          s"collect_capped: cap must be an integer literal, got $other")
      }
      CollectCapped(children.head, cap): Expression
    })

  private val winnowFpsDescriptor = (
    new FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (children: Seq[Expression]) => {
      // k and w shape the rolling-hash and deque loops: literals only
      def litArg(idx: Int, default: Int, name: String): Int =
        children.lift(idx) match {
          case None => default
          case Some(Literal(v: Int, IntegerType)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"winnow_fps: $name must be an integer literal, got $other")
        }
      WinnowFps(children.head, litArg(1, 8, "k"), litArg(2, 4, "w")): Expression
    })

  private val bloomContainsDescriptor = (
    new FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
    (children: Seq[Expression]) => BloomContains(children.head, children(1)): Expression)

  private val sortedIntersectCountDescriptor = (
    new FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
    (children: Seq[Expression]) =>
      SortedIntersectCount(children.head, children(1)): Expression)

  private val tokenTfEncDescriptor = (
    new FunctionIdentifier("token_tf_enc"),
    new ExpressionInfo(classOf[TokenTfEnc].getName, "token_tf_enc"),
    (children: Seq[Expression]) => TokenTfEnc(children.head): Expression)

  private val sortedTfMinSumDescriptor = (
    new FunctionIdentifier("sorted_tf_minsum"),
    new ExpressionInfo(classOf[SortedTfMinSum].getName, "sorted_tf_minsum"),
    (children: Seq[Expression]) =>
      SortedTfMinSum(children.head, children(1)): Expression)

  private val zInterleaveDescriptor = (
    new FunctionIdentifier("z_interleave16"),
    new ExpressionInfo(classOf[graft.functions.ZInterleave].getName, "z_interleave16"),
    (children: Seq[Expression]) =>
      graft.functions.ZInterleave(children(0), children(1)): Expression)

  private val polyHashDescriptor = (
    new FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "poly_hash"),
    (children: Seq[Expression]) =>
      graft.functions.PolyHash(children.head): Expression)

  private val zInterleaveNDescriptor = (
    new FunctionIdentifier("z_interleave_n"),
    new ExpressionInfo(classOf[graft.functions.ZInterleaveN].getName, "z_interleave_n"),
    (children: Seq[Expression]) =>
      graft.functions.ZInterleaveN(children): Expression)

  private val descriptors =
    Seq(cosineSimDescriptor, srpBucketDescriptor, minhashSigDescriptor,
      simhashSigDescriptor, shingleHashesDescriptor, polyShingleHashesDescriptor,
      orderedShingleHashesDescriptor,
      tokenHashesDescriptor, fxpDotDescriptor, collectCappedDescriptor,
      winnowFpsDescriptor, bloomContainsDescriptor, sortedIntersectCountDescriptor,
      tokenTfEncDescriptor, sortedTfMinSumDescriptor, zInterleaveDescriptor,
      polyHashDescriptor, zInterleaveNDescriptor)

  /** Idempotently register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
