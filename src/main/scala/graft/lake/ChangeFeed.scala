package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change data feed over the manifest lake: the row-level delta between
  * two committed versions, classified as insert / delete /
  * update_preimage / update_postimage — Delta CDF / Iceberg
  * changelog-scan semantics reconstructed from the version chain the
  * manifest protocol already keeps, with no extra write-path cost.
  *
  * The key move is METADATA-FIRST pruning: the two versions' manifests
  * are diffed as maps, and only partitions whose (rel → txnDir) entry
  * CHANGED between the versions are read — on either side. A merge that
  * touched 3 of 10^5 partitions yields a feed that reads 6 partition
  * directories total, regardless of lake size; the downstream consumers
  * (incremental view maintenance — q203, replication, cache
  * invalidation) never rescan the lake. Within changed partitions the
  * old and new snapshots full-outer join on the row key (one shuffle of
  * changed rows only) and rows whose entire value struct is null-safe
  * equal are dropped — a partition rewrite that carried most rows
  * through unchanged contributes only its REAL changes.
  *
  * Requirements: `fromVersion`'s manifest must still exist (vacuum
  * `retainVersions` is the CDF retention knob, exactly Delta's
  * `delta.logRetentionDuration` trade), and `keyCols` must identify
  * rows uniquely in both snapshots (the merge's dedup keys — keep-last
  * guarantees at most one row per key per version). Schema evolution
  * between the versions aligns by name: a column born after
  * `fromVersion` reads as null on the old side, so an otherwise-
  * untouched row does NOT become an update merely because the schema
  * grew — unless a later merge actually wrote a value into it.
  */
object ChangeFeed {

  /** Row-level changes between committed versions `fromVersion`
    * (exclusive base, 0 = empty lake) and `toVersion` (inclusive).
    * Output: key columns + aligned value columns + `_change_type`.
    */
  def readChanges(spark: SparkSession, path: String, fromVersion: Long,
                  toVersion: Long, keyCols: Seq[String]): DataFrame = {
    require(ManifestLake.isManifestLake(spark, path),
      s"ChangeFeed: $path is not a manifest lake")
    require(keyCols.nonEmpty, "ChangeFeed: keyCols must name the row identity")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = ManifestLake.currentVersion(fs, path)
    require(fromVersion >= 0 && toVersion >= fromVersion && toVersion <= cur,
      s"ChangeFeed: bad version range [$fromVersion, $toVersion] (current $cur)")
    def manifestAt(v: Long): Map[String, String] =
      if (v == 0L) Map.empty
      else {
        require(fs.exists(new org.apache.hadoop.fs.Path(
          ManifestLake.manifestDir(path), s"m$v.txt")),
          s"ChangeFeed: manifest m$v.txt at $path was vacuumed — raise " +
            "vacuum's retainVersions to cover the feed's horizon")
        ManifestLake.readManifest(fs, path, v)
      }
    val mOld = manifestAt(fromVersion)
    val mNew = manifestAt(toVersion)

    // metadata diff: only partitions whose entry changed are read at all
    val changed = (mOld.keySet ++ mNew.keySet)
      .filter(rel => mOld.get(rel) != mNew.get(rel)).toSeq.sorted

    // one scan per txn on each side ([[ManifestLake.readEntriesGrouped]])
    // — planning stays O(txns) however many partitions a commit touched
    def side(m: Map[String, String]): Option[DataFrame] =
      ManifestLake.readEntriesGrouped(spark, path,
        changed.flatMap(rel => m.get(rel).map(rel -> _)).toMap)

    (side(mOld), side(mNew)) match {
      case (None, None) =>
        val schema = MergeWriter.readStoredSchema(fs, path).getOrElse(
          throw new IllegalStateException(
            s"ChangeFeed: no changed partitions and no tracked schema at $path"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema.add("_change_type", "string"))
      case (oldOpt, newOpt) =>
        val empty = oldOpt.orElse(newOpt).get.limit(0)
        // align both sides to the by-name union schema (evolution-safe)
        val oldA = oldOpt.getOrElse(empty)
          .unionByName(newOpt.getOrElse(empty).limit(0), allowMissingColumns = true)
        val newA = newOpt.getOrElse(empty)
          .unionByName(oldOpt.getOrElse(empty).limit(0), allowMissingColumns = true)
        val allCols = oldA.columns.toSeq
        val valueCols = allCols.filterNot(keyCols.contains)
        def packed(df: DataFrame, as: String): DataFrame =
          df.select(allCols.map(col): _*)
            .select(keyCols.map(col) :+
              struct(valueCols.map(col): _*).as(as): _*)
        // one shuffle of changed-partition rows on the row key; the four
        // classifications below filter this one materialized relation
        val j = packed(oldA, "_o")
          .join(packed(newA, "_n"), keyCols, "full_outer")
          .localCheckpoint()
        val o = col("_o"); val n = col("_n")
        def emit(cond: Column, s: String, t: String): DataFrame =
          j.where(cond).select(keyCols.map(col) :+ col(s"$s.*") :+
            lit(t).as("_change_type"): _*)
        val updated = o.isNotNull && n.isNotNull && !(o <=> n)
        emit(o.isNull, "_n", "insert")
          .unionByName(emit(n.isNull, "_o", "delete"))
          .unionByName(emit(updated, "_o", "update_preimage"))
          .unionByName(emit(updated, "_n", "update_postimage"))
    }
  }
}
