package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan fan-out (round-15, guide §2.5 "input skew" /
  * optimization-round rule "derive partitioning from the input, not a
  * constant").
  *
  * The bench inputs are single-row-group parquet files, so Spark plans
  * every scan as ONE task — and whatever fuses into the scan stage
  * (exact-decimal partial aggregation, expand-based multi-distinct,
  * per-row kernels) serializes on one core while 31 idle. A real lake
  * scan plans ≥ cores splits, where redistributing the scan output
  * would be a pure pessimization (an extra full-data exchange).
  *
  * [[widen]] therefore gates on the PLANNED partition count of the
  * relation: below the session's parallelism it hash-redistributes on
  * the given high-cardinality keys (deterministic under task retries —
  * guide §2.5's warning about round-robin + rand; and hash repartition
  * skips the sort-before-repartition tax of SPARK-23207), otherwise it
  * is the identity. The exchange exists exactly where the work would
  * otherwise serialize, and vanishes at any real scale.
  *
  * Constraint: call it on SCAN-LEVEL relations only (scan + filter +
  * projection) — resolving the planned partition count materializes the
  * plan's RDD, which for a relation containing an exchange would
  * execute its upstream stages.
  */
object Fanout {
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
