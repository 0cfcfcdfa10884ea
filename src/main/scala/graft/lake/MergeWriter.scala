package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.KeepLast

/** Partitioned Parquet upsert sink — the reference's `save_to_parquet`
  * merge (crypto_collector.py:523–558) re-expressed for a distributed
  * lake (SURVEY.md §2.2 K1/K2, §7 phase 2).
  *
  * Semantics preserved: last-writer-wins per `timestamp` key within a
  * (symbol, interval, data_type, exchange, date) partition; re-ingestion
  * of overlapping windows is idempotent.
  *
  * Spark shape: plain Parquet has no in-place upsert, so merge =
  * read-affected-partitions → unionByName → keep-last dedup → overwrite
  * with `partitionOverwriteMode=dynamic` (only touched partitions are
  * replaced — siblings survive, unlike a naive overwrite). Determinism:
  * the winner is picked by an explicit, monotonically increasing
  * `ingest_seq` carried on every batch — `dropDuplicates` alone is
  * shuffle-order-dependent (SURVEY.md §7 hard part 3).
  *
  * At 100 TB: the merge only ever reads/writes the partitions present in
  * the incoming batch (typically a handful of dates × exchanges), so cost
  * scales with batch size, not lake size; the dedup shuffle key
  * (partition cols + timestamp) is high-cardinality and unskewed.
  */
object MergeWriter {
  private val Keys = Seq("symbol", "interval", "data_type", "exchange", "date")

  /** Add the lake partition columns derived per the reference: `date` from
    * the candle timestamp (crypto_collector.py:533), constant interval +
    * data_type tags (611–613).
    */
  def withPartitionCols(batch: DataFrame, interval: String, dataType: String): DataFrame =
    batch
      .withColumn("interval", lit(interval))
      .withColumn("data_type", lit(dataType))
      .withColumn("date", date_format(col("timestamp"), "yyyyMMdd"))

  /** Merge `batch` (canonical candles + partition cols) into the lake at
    * `path`. `ingestSeq` orders writers: higher seq wins on key collision.
    */
  def merge(spark: SparkSession, batch: DataFrame, path: String, ingestSeq: Long): DataFrame = {
    val tagged = batch.withColumn("ingest_seq", lit(ingestSeq))
    // Scheme-aware existence check: java.io.File is silently false for
    // hdfs:///s3a:// paths, which would blind-overwrite a remote lake.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lakeExists = fs.exists(hPath)
    val combined =
      if (!lakeExists) tagged
      else {
        val existing = spark.read.parquet(path)
        // Prune the read to partitions the batch actually touches with a
        // STATIC filter on the partition columns: the touched key set is
        // bounded by the batch's distinct (symbol, interval, data_type,
        // exchange, date) combinations — a handful of rows — so it
        // collects to the driver and becomes an OR-of-equalities the
        // scan prunes at PLANNING time (directory-level pruning, zero
        // data files outside the touched partitions are opened).
        //
        // The previous formulation — a broadcast left-semi join on the
        // partition keys — claimed "metadata-only pruning" but measured
        // otherwise: dynamic partition pruning does not reliably fire
        // for it, and the merge read the ENTIRE lake per batch
        // (ScaleRehearsalSpec's 10× rehearsal: 212k records read
        // against a 200k-row lake for a 1k-row batch). At 100 TB that
        // is a lake scan per micro-batch — the exact failure the
        // "cost scales with batch size" contract forbids.
        val touched = tagged.select(Keys.map(col): _*).distinct().collect()
        if (touched.isEmpty) tagged
        else {
          val cond = touched.map { r =>
            Keys.zipWithIndex.map { case (k, i) => col(k) === lit(r.getString(i)) }
              .reduce(_ && _)
          }.reduce(_ || _)
          val affected = existing.filter(cond)
            // Materialize and cut lineage: Spark refuses to overwrite a
            // path its own read plan references. Affected partitions are
            // batch-sized, so executor-local checkpoint storage is
            // bounded.
            .localCheckpoint()
          affected.unionByName(tagged)
        }
      }
    val deduped = KeepLast.dedup(
      combined,
      (Keys :+ "timestamp").map(col),
      Seq(col("ingest_seq")))
    // Per-write option, NOT session conf: a session-global mutation here
    // would leak dynamic-overwrite semantics to every concurrent writer
    // sharing the session.
    deduped.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(Keys: _*)
      .parquet(path)
    deduped
  }
}
