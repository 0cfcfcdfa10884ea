package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance over the parquet lake —
  * the CDC sibling of [[MergeWriter]]'s keep-last upsert. The reference
  * keeps only the latest candle per key (crypto_collector.py:548–553);
  * a dimension consumer (e.g. "what priority tier was this customer in
  * when that order shipped?") needs the HISTORY, so each attribute
  * change opens a new version row and closes the previous one:
  *
  *   (entity_id, attr, valid_from, since_order, valid_to NULL = current)
  *
  * [[mergeScd2]] applies one micro-batch of events incrementally:
  *
  *  1. late/duplicate guard — only events strictly after the entity's
  *     current version start `(valid_from, since_order)` participate; a
  *     redelivered batch therefore produces the EXACT same version rows
  *     again (absorbed by the keyed merge) and a fully-stale redelivery
  *     is a no-op, which upgrades at-least-once delivery to
  *     effectively-exactly-once — the [[MergeWriter]] contract, carried
  *     to versioned dimensions.
  *  2. run collapse — consecutive equal attr values (ordered by
  *     `(ts, seq)`, seq a unique event id breaking same-timestamp ties)
  *     produce NO version; the batch's first change is also dropped
  *     when it merely continues the stored current attr, so batch
  *     boundaries are invisible in the history. Feeding batches in
  *     event-time order makes the incremental result provably equal to
  *     the one-pass full-history window — the equivalence q168 replays
  *     and hash-checks against a DuckDB window oracle.
  *  3. keyed merge — versions are identified by (entity_id,
  *     since_order); a version that closes is re-written with
  *     `valid_to` set and the keep-greatest order (closed beats
  *     current) retires the stale open row.
  *
  * Layout & scale: the dimension partitions on (state, bucket) where
  * state ∈ {current, closed} and bucket = pmod(hash(entity_id), 16).
  * A merge statically prunes its reads to state=current × the batch's
  * touched buckets — the ever-growing CLOSED history is never read and
  * only rewritten in the (batch-key-touched) buckets where a version
  * actually closes. Per-batch cost is one entity-key shuffle for the
  * window chain plus affected-bucket IO: O(|batch| + |current slice of
  * touched buckets|), independent of total history size. At 100 TB the
  * bucket count is the only knob (raise `buckets` so a bucket's current
  * slice fits an executor); everything else is bounded by the batch.
  */
object Scd2Writer {

  val DefaultBuckets = 16

  private val Cols = Seq("entity_id", "attr", "valid_from", "since_order", "valid_to")

  /** Incrementally apply `events` — columns (entity_id, attr, ts, seq),
    * all non-null, seq unique per event — to the SCD2 dimension at
    * `path`. Returns the merged dimension (version rows + partition
    * columns).
    */
  def mergeScd2(spark: SparkSession, events: DataFrame, path: String,
                buckets: Int = DefaultBuckets): DataFrame = {
    import spark.implicits._
    val ev = events.select($"entity_id", $"attr", $"ts", $"seq")
      .filter($"entity_id".isNotNull && $"attr".isNotNull &&
        $"ts".isNotNull && $"seq".isNotNull)
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      pmod(hash(c), lit(buckets)).cast("string")

    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current: DataFrame =
      if (!fs.exists(hPath)) {
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("entity_id", LongType),
            StructField("cur_attr", StringType),
            StructField("cur_from", TimestampType),
            StructField("cur_seq", LongType))))
      } else {
        // touched buckets are ≤ `buckets` distinct strings — a bounded
        // driver-side literal list, giving static partition pruning on
        // BOTH partition keys (the closed history is never scanned)
        val touched = ev.select(bucketOf($"entity_id").as("bucket"))
          .distinct().as[String].collect().toSeq
        MergeWriter.readLake(spark, path)
          .filter($"state" === "current" && $"bucket".isin(touched: _*))
          .select($"entity_id", $"attr".as("cur_attr"),
            $"valid_from".as("cur_from"), $"since_order".as("cur_seq"))
      }

    val w = Window.partitionBy($"entity_id").orderBy($"ts", $"seq")
    // one entity-key shuffle feeds both windows (same partitioning+sort)
    val changes = ev
      .join(current, Seq("entity_id"), "left")
      // late/duplicate guard: strictly after the current version start
      .filter($"cur_from".isNull || $"ts" > $"cur_from" ||
        ($"ts" === $"cur_from" && $"seq" > $"cur_seq"))
      .withColumn("prev", lag($"attr", 1).over(w))
      // a change = differs from the previous surviving event, with the
      // stored current attr seeding the chain for the batch's first event
      .filter(($"prev".isNull && ($"cur_attr".isNull || $"attr" =!= $"cur_attr")) ||
        ($"prev".isNotNull && $"attr" =!= $"prev"))
    val versioned = changes
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("chg_rn", row_number().over(w))
      // checkpoint BEFORE the emptiness probe: consumed three times (the
      // probe, new rows, first-change close) — probing the un-materialized
      // plan would execute the whole join+window chain once just to
      // answer "any changes?"
      .localCheckpoint()
    if (versioned.isEmpty)
      return if (fs.exists(hPath)) MergeWriter.readLake(spark, path)
      else spark.emptyDataFrame
    val newRows = versioned.select($"entity_id", $"attr",
      $"ts".as("valid_from"), $"seq".as("since_order"), $"valid_to")
    // close the stored current row of every entity that changed
    val closedOld = versioned.filter($"chg_rn" === 1 && $"cur_attr".isNotNull)
      .select($"entity_id", $"cur_attr".as("attr"), $"cur_from".as("valid_from"),
        $"cur_seq".as("since_order"), $"ts".as("valid_to"))
    val tagged = newRows.unionByName(closedOld)
      .withColumn("state", when($"valid_to".isNull, "current").otherwise("closed"))
      .withColumn("bucket", bucketOf($"entity_id"))
    // keep-greatest on valid_to presence: a closing rewrite of a version
    // beats its stale open row; identical redelivered rows tie harmlessly
    MergeWriter.mergeKeyed(spark, tagged, path, Seq("state", "bucket"),
      Seq($"entity_id", $"since_order"), Seq($"valid_to".isNotNull.cast("int")))
  }

  /** The dimension as consumers read it (partition columns dropped,
    * `is_current` derived).
    */
  def readDim(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    MergeWriter.readLake(spark, path)
      .select(Cols.map(col): _*)
      .withColumn("is_current", $"valid_to".isNull)
  }
}
