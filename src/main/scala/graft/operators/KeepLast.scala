package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed keep-last deduplication — the reference sink's merge semantic
  * (crypto_collector.py:548–553: sort by timestamp, drop_duplicates
  * keep='last' per timestamp key).
  *
  * `dropDuplicates` alone is order-nondeterministic under shuffle, so the
  * winner is chosen with row_number over an explicit total order
  * (SURVEY.md §7 hard part 3). One shuffle on the key columns; the window
  * sort is per-key and spills safely. At 100 TB the key set (symbol ×
  * interval × exchange × date) is high-cardinality and unskewed, so the
  * hash partitioning balances; a skewed key set would get salting upstream.
  */
object KeepLast {
  /** Keep, per distinct value of `keys`, the single row with the greatest
    * `order` tuple (later = wins; append unique tie-breaker to `order` for
    * full determinism).
    */
  def dedup(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
