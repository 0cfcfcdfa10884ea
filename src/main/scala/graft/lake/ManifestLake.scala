package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.operators.KeepLast

/** Manifest-pointer commit protocol for the parquet lake — the
  * object-store-safe alternative to [[MergeWriter]]'s advisory writer
  * lock (round-10 verdict item 5).
  *
  * The lock path's failure mode on S3-class stores: `fs.create(lock,
  * overwrite=false)` is not atomic there, and dynamic partition
  * overwrite deletes-then-writes files IN PLACE — a reader racing a
  * merge (or a writer crash mid-overwrite) can observe a partition
  * half-replaced. The fix is the one every production table format
  * (Iceberg/Delta/Hive ACID) converged on: DATA FILES ARE IMMUTABLE,
  * and visibility is a single atomic METADATA operation.
  *
  * Layout:
  * {{{
  *   <path>/data/txn-<v>/<k1=v1>/…/<kN=vN>/part-*.parquet   — immutable
  *   <path>/_manifest/m<v>.txt    — "partitionRelPath \t txnId" lines
  * }}}
  * The CURRENT state is the highest-numbered manifest. A merge writes
  * its output partitions into a fresh `txn-<v+1>` directory (invisible:
  * nothing references it), then commits by creating `m<v+1>.txt` with
  * `overwrite = false` — one atomic create. Crash before the commit ⇒
  * readers still resolve m<v>, the torn txn directory is unreferenced
  * garbage (reclaimed by [[vacuum]] or overwritten by the next merge's
  * retry). Two concurrent writers ⇒ exactly one `m<v+1>` create
  * succeeds; the loser fails LOUD with nothing corrupted — optimistic
  * concurrency rather than an advisory lock. (On S3, conditional PUT /
  * If-None-Match gives the same primitive; older object stores should
  * front the create with a DynamoDB-style CAS — the caveat shrinks to
  * one metadata operation instead of every data file.)
  *
  * Readers ([[read]]) resolve the manifest and open exactly the
  * referenced partition directories, attaching partition values as
  * literals from the manifest entry — no directory LISTing of data
  * paths (an S3 LIST is both slow and only eventually consistent on
  * some stores) and no partition-type inference surprises. Partition
  * pruning is intrinsic: a filtered read opens only matching entries.
  *
  * Scale: the manifest is one small line-per-partition file (a 100 TB
  * candle lake is ~10^4–10^5 partitions — kilobytes to a few MB); each
  * merge reads only the touched partitions' directories (batch-bounded)
  * and writes one new txn directory. Nothing scales with lake size
  * except the manifest rewrite, which is linear in partition COUNT,
  * not data volume.
  *
  * Activation: set `spark.graft.lake.commit=manifest` for new lakes;
  * an existing manifest lake self-describes by layout and is always
  * written/read through this protocol regardless of the conf (a plain
  * dynamic-overwrite write into it would bypass visibility).
  */
object ManifestLake {

  /** Test failpoint: runs after a merge's data write and before its
    * manifest create — the torn-merge / commit-race window the protocol
    * exists to defend. Tests throw here (crash) or commit a competing
    * manifest here (race); production leaves the no-op.
    */
  @volatile private[graft] var beforeCommitHook: () => Unit = () => ()

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifest")
  private def dataDir(path: String) = new Path(path, "data")

  /** A lake is a manifest lake iff the `_manifest` directory exists. */
  def isManifestLake(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(manifestDir(path))

  private val ManifestName = """m(\d+)\.txt""".r

  /** Highest committed manifest version; 0 = empty lake. */
  private def currentVersion(fs: FileSystem, path: String): Long = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return 0L
    fs.listStatus(dir).map(_.getPath.getName).collect {
      case ManifestName(v) => v.toLong
    }.foldLeft(0L)(math.max)
  }

  /** partitionRelPath → txnId, from manifest version `v`. */
  private def readManifest(fs: FileSystem, path: String, v: Long): Map[String, Long] = {
    if (v == 0L) return Map.empty
    val in = fs.open(new Path(manifestDir(path), s"m$v.txt"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(rel, txn) = line.split("\t", 2)
      rel -> txn.toLong
    }.toMap
  }

  // Partition values must round-trip through directory names without
  // escaping — the same plain-string contract the lock path's
  // OR-of-equalities filter already imposes (symbols, intervals,
  // exchanges, yyyyMMdd dates, source tags all satisfy it).
  private val PlainValue = "^[0-9A-Za-z._+-]+$".r

  private def relPath(keys: Seq[String], values: Seq[String]): String =
    keys.zip(values).map { case (k, v) => s"$k=$v" }.mkString("/")

  private def parseRel(rel: String): Seq[(String, String)] =
    rel.split("/").toSeq.map { seg =>
      val Array(k, v) = seg.split("=", 2)
      (k, v)
    }

  /** Read one referenced partition directory, partition values attached
    * as string literals from the manifest entry (no dir inference).
    */
  private def readPartition(spark: SparkSession, path: String,
                            rel: String, txn: Long): DataFrame = {
    val df = spark.read.parquet(s"$path/data/txn-$txn/$rel")
    parseRel(rel).foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  /** The lake's current committed state. Planning cost is linear in the
    * partition count (one relation per manifest entry, unioned by name
    * so additively-evolved txns line up, missing columns null).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, path)
    readAt(spark, path, currentVersion(fs, path))
  }

  /** Time travel: the lake EXACTLY as of committed manifest version
    * `version` (1 = first commit). Immutable data files + per-version
    * manifests make this free — resolving an older manifest opens the
    * txn directories it referenced, which no later merge ever mutated
    * (they are only ever superseded, and reclaimed by [[vacuum]], whose
    * scaladoc carries the snapshot-reader grace-period caveat). This is
    * the audit/reproducibility primitive every table format exposes:
    * "which rows did the model see" is answerable after the fact by
    * version number (q175 proves snapshot ≡ the data delivered by the
    * first k merges, hash-exactly).
    */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = fsFor(spark, path)
    val cur = currentVersion(fs, path)
    require(version >= 1 && version <= cur,
      s"ManifestLake: version $version not committed at $path (current $cur)")
    val entries = readManifest(fs, path, version)
    require(entries.nonEmpty, s"ManifestLake: no committed manifest at $path")
    entries.toSeq.sortBy(_._1)
      .map { case (rel, txn) => readPartition(spark, path, rel, txn) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Keyed merge with manifest commit — same semantics as the lock
    * path's mergeKeyed (affected-partition read → union → explicit-order
    * dedup → replace touched partitions), different durability story:
    * the replace is a new immutable txn directory plus one atomic
    * manifest create, so a torn merge is INVISIBLE to readers and a
    * concurrent writer loses the commit race loudly.
    */
  private[graft] def mergeKeyed(spark: SparkSession, tagged: DataFrame, path: String,
                                keys: Seq[String], dedupKeys: Seq[org.apache.spark.sql.Column],
                                order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val fs = fsFor(spark, path)
    val v = currentVersion(fs, path)
    val manifest = readManifest(fs, path, v)
    val touched = tagged.select(keys.map(col): _*).distinct().collect().map { r =>
      val values = keys.indices.map { i =>
        if (r.isNullAt(i)) throw new IllegalArgumentException(
          s"ManifestLake: NULL value for partition key '${keys(i)}' — " +
            "partition keys must be non-null plain strings")
        val s = r.getString(i)
        if (PlainValue.findFirstIn(s).isEmpty) throw new IllegalArgumentException(
          s"ManifestLake: partition value '$s' for key '${keys(i)}' needs " +
            "path escaping — only [0-9A-Za-z._+-] values are supported")
        s
      }
      relPath(keys, values)
    }.toSet
    val affected = manifest.view.filterKeys(touched).toSeq.sortBy(_._1)
      .map { case (rel, txn) => readPartition(spark, path, rel, txn) }
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    val combined = affected match {
      case Some(a) => a.localCheckpoint().unionByName(tagged, allowMissingColumns = true)
      case None    => tagged
    }
    val deduped = KeepLast.dedup(combined, dedupKeys, order)

    // a txn directory for v+1 can only pre-exist as a previous torn
    // attempt's garbage (m<v+1> does not exist, or v would be higher);
    // Overwrite reclaims it
    val txnDir = s"$path/data/txn-${v + 1}"
    deduped.write.mode(SaveMode.Overwrite).partitionBy(keys: _*).parquet(txnDir)

    beforeCommitHook()

    // remap every touched partition to the new txn; new partitions are
    // whatever the write actually produced under txnDir
    val written = leafPartitions(fs, new Path(txnDir), new Path(txnDir))
    val next = manifest -- touched ++ written.map(_ -> (v + 1)).toMap
    val lines = next.toSeq.sorted.map { case (rel, txn) => s"$rel\t$txn" }
      .mkString("", "\n", "\n")
    val mPath = new Path(manifestDir(path), s"m${v + 1}.txt")
    fs.mkdirs(manifestDir(path))
    val out =
      try fs.create(mPath, /* overwrite = */ false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"ManifestLake: commit conflict — $mPath already exists (a concurrent " +
            "writer committed first). Nothing was corrupted; re-run the merge " +
            "against the new current version.", e)
      }
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    deduped
  }

  /** Recursively collect `k=v/…` leaf partition rel-paths under `dir`. */
  private def leafPartitions(fs: FileSystem, dir: Path, root: Path): Seq[String] = {
    val children = fs.listStatus(dir)
    val subdirs = children.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (subdirs.isEmpty) {
      if (children.exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
        Seq(dir.toString.stripPrefix(fs.makeQualified(root).toString).stripPrefix("/"))
      else Seq.empty
    } else subdirs.flatMap(s => leafPartitions(fs, s.getPath, root)).toSeq
  }

  /** Reclaim unreferenced storage: txn directories no current manifest
    * entry points into, partition dirs inside referenced txns that the
    * manifest has since remapped elsewhere, and superseded manifest
    * files. Safe with respect to the commit protocol (nothing reachable
    * from the current manifest is touched); a reader still resolving a
    * SUPERSEDED manifest version races this the same way every table
    * format's vacuum races time-travel readers — run it with a grace
    * period in deployments that snapshot-read.
    */
  def vacuum(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path)
    val v = currentVersion(fs, path)
    val manifest = readManifest(fs, path, v)
    var removed = 0L
    val live: Map[Long, Set[String]] =
      manifest.groupBy(_._2).map { case (txn, m) => txn -> m.keySet }
    val dd = dataDir(path)
    if (fs.exists(dd)) fs.listStatus(dd).foreach { s =>
      val name = s.getPath.getName
      val txn = if (name.startsWith("txn-")) name.stripPrefix("txn-").toLong else -1L
      live.get(txn) match {
        case None =>
          if (fs.delete(s.getPath, true)) removed += 1
        case Some(refs) =>
          leafPartitions(fs, s.getPath, s.getPath).foreach { rel =>
            if (!refs.contains(rel) && fs.delete(new Path(s.getPath, rel), true))
              removed += 1
          }
      }
    }
    val md = manifestDir(path)
    if (fs.exists(md)) fs.listStatus(md).foreach { s =>
      s.getPath.getName match {
        case ManifestName(mv) if mv.toLong < v =>
          if (fs.delete(s.getPath, false)) removed += 1
        case _ => ()
      }
    }
    removed
  }
}
