package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bulk predicate DELETE over the partitioned lake — the data-governance
  * verb (GDPR/CCPA erasure, contract-expiry purges) next to
  * [[MergeWriter]]'s upsert and q182's keyed tombstones. Tombstones
  * suppress a KEY going forward; erasure must REMOVE matching rows from
  * history, which on an immutable-file lake means rewriting files — the
  * job is to rewrite as few as possible.
  *
  * The lake partitions on a hash bucket of the erasure key
  * (`bucket = pmod(hash(key), B)`), so an erasure list prunes to its
  * buckets' partitions statically: untouched partitions are NOT read,
  * NOT rewritten, and their files stay byte-identical (EraserSpec pins
  * that on real files). Inside a touched partition the surviving rows
  * are `left_anti` the erasure list and dynamic overwrite replaces just
  * that directory.
  *
  * Scale: cost is O(touched partitions' data), not lake size — with B
  * buckets an erasure list of any size touches at most B partitions,
  * and a single-user request touches exactly one. The anti join
  * broadcasts the erasure list when small (the common case) and
  * shuffle-joins co-partitioned otherwise — Spark's planner picks by
  * size. The erasure list is checkpointed BEFORE the overwrite because
  * it usually derives from the lake being rewritten (Spark refuses to
  * overwrite a path its read plan references — the MergeWriter lesson).
  */
object Eraser {

  /** Remove every row of `lake` whose `keyCol` appears in `ids`
    * (a one-column DataFrame named `keyCol`); returns per-bucket
    * (bucket, rows_removed) stats. The lake must be partitioned by
    * `bucket` as written by a `pmod(hash(keyCol), buckets)` writer.
    */
  def eraseKeys(spark: SparkSession, lake: String, keyCol: String,
                ids: DataFrame, buckets: Int = 16): DataFrame = {
    import spark.implicits._
    val eraseIds = ids.select(col(keyCol))
      .filter(col(keyCol).isNotNull).distinct()
      .localCheckpoint() // cut lineage: usually derived from `lake` itself
    val touched = eraseIds
      .select(pmod(hash(col(keyCol)), lit(buckets)).cast("string").as("bucket"))
      .distinct().as[String].collect().toSeq // bounded by `buckets`
    val affected = spark.read.parquet(lake)
      // partition-column inference types all-digit bucket values as int;
      // normalize to the writer's string so the prune and the rewrite
      // round-trip the directory names exactly
      .withColumn("bucket", col("bucket").cast("string"))
      .filter($"bucket".isin(touched: _*))
      .localCheckpoint()
    val before = affected.groupBy($"bucket").agg(count(lit(1)).as("n_before"))
    val surviving = affected.join(eraseIds, Seq(keyCol), "left_anti")
      .localCheckpoint() // materialize before overwriting what it read
    surviving.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(lake)
    // Dynamic overwrite only replaces partitions the write PRODUCES; a
    // touched bucket whose every row was erased produces nothing and
    // would silently keep its old files — the one failure mode an
    // erasure verb cannot have. Remove such directories explicitly.
    val survivingBuckets = surviving.select($"bucket").distinct()
      .as[String].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(survivingBuckets).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(lake, s"bucket=$b"), true)
    }
    surviving.groupBy($"bucket").agg(count(lit(1)).as("n_after"))
      .join(before, Seq("bucket"), "right") // a fully-erased bucket keeps its row
      .select($"bucket", ($"n_before" - coalesce($"n_after", lit(0L))).as("rows_removed"))
  }
}
