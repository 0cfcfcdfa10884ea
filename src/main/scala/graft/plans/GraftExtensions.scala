package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSim

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
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
}

object GraftExtensions {
  private val cosineSimDescriptor = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)): Expression)

  /** Idempotently register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimDescriptor._1, cosineSimDescriptor._2, cosineSimDescriptor._3)
}
