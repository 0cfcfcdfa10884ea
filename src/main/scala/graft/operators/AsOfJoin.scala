package graft.operators

import org.apache.spark.sql.DataFrame
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
}
