package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key (SURVEY.md §2.4 — the one
  * domain-natural join the reference's data model invites: align candles
  * across exchanges at nearest ≤ timestamp).
  *
  * Spark has no built-in as-of join. Implemented as union + windowed
  * last-ignoreNulls: tag both sides, union, and carry the most recent right
  * payload forward over an ordered per-key window. This is a single shuffle
  * on the key + one per-key sort — the same cost profile as a sort-merge
  * join, and it never materializes the O(left × right) candidate pairs a
  * naive `t_r <= t_l` range-join would. At 100 TB both inputs
  * shuffle-partition by key; a hot key would be range-salted by time bucket
  * first (join each bucket against its own + previous bucket's right rows).
  */
object AsOfJoin {

  /** @param left     probe side (all rows kept; right columns null if no match)
    * @param right    reference side
    * @param keyL     left equality-key column name
    * @param keyR     right equality-key column name
    * @param timeL    left event-time column name
    * @param timeR    right event-time column name (comparable with timeL)
    * @param payload  right-side columns to attach, `asof_`-prefixed in output
    * @param tieBreak right-side numeric column; on equal timestamps the
    *                 greatest value wins (determinism)
    */
  def join(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String,
           timeL: String, timeR: String,
           payload: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val lRowType: StructType = left.schema
    val rPayType: StructType = right.select(payload.map(col): _*).schema

    // Right rows sort before left rows at the same instant (__side 0 < 1)
    // so a right row at exactly t is visible to a left row at t (≤ semantics).
    val rSide = right.select(
      col(keyR).as("__k"), col(timeR).as("__t"), lit(0).as("__side"),
      col(tieBreak).cast("long").as("__tb"),
      lit(null).cast(lRowType).as("__lrow"),
      struct(payload.map(col): _*).as("__rpay"))
    val lSide = left.select(
      col(keyL).as("__k"), col(timeL).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(rPayType).as("__rpay"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = rSide.unionByName(lSide)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      payload.map(p => col(s"__asof.$p").as(s"asof_$p"))
    joined.select(out: _*)
  }

  /** Time-bucketed as-of join — the scale formulation promised in the
    * class doc. The plain [[join]] windows over the key alone, so its
    * sort parallelism equals the key cardinality: for the reference's
    * natural key (6 symbols) that is 6 tasks however large the cluster.
    * Here both sides also partition by `floor(time / width)`, the union
    * window runs per (key, bucket) — parallelism = keys × buckets — and
    * cross-bucket visibility is restored by a carry-in relation: the
    * latest right payload per (key, bucket), prefix-scanned over the
    * SMALL (key, bucket) domain (one row per bucket, not per event),
    * left-joined back and coalesced under the in-bucket window result.
    * The carry prefix scan is the only per-key-ordered step and touches
    * #buckets rows per key; every event-sized step is (key, bucket)-
    * partitioned. Same two-pass shape as q26's distributed row_number.
    *
    * Output equals [[join]] exactly (OperatorsSpec "bucketed AsOfJoin
    * equals the naive formulation" asserts parity) with one
    * precondition: keys must be non-null — the naive window groups
    * null keys into one partition, while the carry JOIN (SQL null
    * semantics) cannot match them across buckets.
    *
    * @param widthSeconds bucket width in seconds of event time (cast of
    *   the time column to long; for timestamps that is epoch seconds)
    */
  def joinBucketed(left: DataFrame, right: DataFrame,
                   keyL: String, keyR: String,
                   timeL: String, timeR: String,
                   payload: Seq[String], tieBreak: String,
                   widthSeconds: Long): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    val leftCols = left.columns.toSeq
    val lRowType: StructType = left.schema
    val rPayType: StructType = right.select(payload.map(col): _*).schema

    def bucket(t: Column): Column = floor(t.cast("long") / widthSeconds).cast("long")

    val rSide = right.select(
      col(keyR).as("__k"), col(timeR).as("__t"), lit(0).as("__side"),
      col(tieBreak).cast("long").as("__tb"),
      lit(null).cast(lRowType).as("__lrow"),
      struct(payload.map(col): _*).as("__rpay"))
      .withColumn("__b", bucket(col("__t")))
    val lSide = left.select(
      col(keyL).as("__k"), col(timeL).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(rPayType).as("__rpay"))
      .withColumn("__b", bucket(col("__t")))
    bucketedTail(rSide.unionByName(lSide), leftCols, payload)
  }

  /** Self as-of join — both sides carved from ONE relation by a side
    * predicate (the common "align event type A to the latest prior
    * event type B by the same key" case, where left and right are
    * filters of the same table). Identical semantics to [[joinBucketed]]
    * with `left = src.filter(isLeft)` / `right = src.filter(!isLeft)`,
    * but the tagged relation is built in a single scan projection —
    * no two-branch union re-reading the source, and rows carry no
    * duplicate side copies.
    */
  def joinBucketedSelf(src: DataFrame, isLeft: Column,
                       key: String, time: String,
                       leftCols: Seq[String], payload: Seq[String],
                       tieBreak: String, widthSeconds: Long): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    val lRowType: StructType = src.select(leftCols.map(col): _*).schema
    val rPayType: StructType = src.select(payload.map(col): _*).schema
    val tagged = src.select(
      col(key).as("__k"), col(time).as("__t"),
      when(isLeft, 1).otherwise(0).as("__side"),
      when(!isLeft, col(tieBreak).cast("long")).as("__tb"),
      when(isLeft, struct(leftCols.map(col): _*))
        .otherwise(lit(null).cast(lRowType)).as("__lrow"),
      when(!isLeft, struct(payload.map(col): _*))
        .otherwise(lit(null).cast(rPayType)).as("__rpay"))
      .withColumn("__b", floor(col("__t").cast("long") / widthSeconds).cast("long"))
    bucketedTail(tagged, leftCols, payload)
  }

  private def bucketedTail(unioned: DataFrame,
                           leftCols: Seq[String], payload: Seq[String]): DataFrame = {
    // Shuffle budget: exactly ONE event-sized exchange — the (key,
    // bucket) partitioning for the in-bucket window. The carry side
    // aggregates BEFORE its exchange (partial max_by map-side), so only
    // |keys × buckets| summary rows ever move for it, and the carry
    // relation joins back by BROADCAST onto the already-partitioned
    // window output — no second event-sized exchange, no event-sized
    // branch recompute. (An explicit shared repartition was tried and
    // is worse: column pruning diverges the branch schemas so
    // ReuseExchange can't unify them, and pre-exchange repartition
    // forfeits the partial aggregation.)
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = unioned
      .withColumn("__inb", last(col("__rpay"), ignoreNulls = true).over(w))

    // carry-in: latest right payload strictly before each bucket. One
    // groupBy fuses the (key, bucket) domain (every bucket seen on
    // EITHER side — a left row's bucket may hold no right rows) with
    // the per-bucket newest right payload: max_by skips null ordering
    // keys, so left rows contribute the domain row but never the
    // payload. The prefix scan runs over the SMALL (key, bucket)
    // relation — one row per bucket, not per event.
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isR = col("__side") === 0
    val carry = unioned.groupBy(col("__k"), col("__b"))
      .agg(max_by(when(isR, col("__rpay")),
        when(isR, struct(col("__t"), col("__tb")))).as("__last"))
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__b"), col("__carry"))

    // the in-bucket winner (always newer than any carry) falls back to
    // the carry only when the bucket has no earlier right row. No
    // broadcast hint: AQE converts to broadcast at runtime while the
    // carry is small; at a scale where |keys × buckets| outgrows the
    // driver, SMJ aligns with the window's (k, b) partitioning and
    // costs a sort, not an exchange, on the event side.
    val joined = inBucket
      .join(carry, Seq("__k", "__b"), "left")
      .withColumn("__asof", coalesce(col("__inb"), col("__carry")))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      payload.map(p => col(s"__asof.$p").as(s"asof_$p"))
    joined.select(out: _*)
  }
}
