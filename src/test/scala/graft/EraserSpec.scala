package graft

import org.apache.spark.sql.functions._
import graft.lake.Eraser

/** Bulk erasure ([[graft.lake.Eraser]], q186): rows of erased keys
  * vanish from HISTORY, untouched bucket partitions keep byte-identical
  * files (the O(touched)-not-O(lake) claim on real files), and a bucket
  * whose every row is erased loses its directory (dynamic overwrite
  * alone would silently keep it — the one failure an erasure verb
  * cannot have).
  */
class EraserSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(rows: Seq[(Long, String)], buckets: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_eraser").toString + "/lake"
    rows.toDF("user_id", "payload")
      .withColumn("bucket", pmod(hash($"user_id"), lit(buckets)).cast("string"))
      .repartition($"bucket")
      .write.partitionBy("bucket").parquet(dir)
    dir
  }

  private def files(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  test("erasure removes full key history; untouched partitions keep byte-identical files") {
    val rows = (1L to 200L).map(u => (u, s"p$u")) ++
      (1L to 200L).map(u => (u, s"q$u")) // two rows per user
    val lake = freshLake(rows, buckets = 8)
    val before = files(lake)
    // erase three users — all buckets they hash into; other buckets untouched
    val ids = Seq(7L, 13L, 101L).toDF("user_id")
    val touched = Seq(7L, 13L, 101L)
      .map(u => pmod(hash(lit(u)), lit(8)).cast("string"))
    val touchedVals = spark.range(1).select(touched: _*).collect().head
      .toSeq.map(_.toString).toSet
    val stats = Eraser.eraseKeys(spark, lake, "user_id", ids, buckets = 8)
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(stats.values.sum == 6L, s"3 users x 2 rows must go: $stats")
    val after = spark.read.parquet(lake)
    assert(after.filter($"user_id".isin(7L, 13L, 101L)).count() == 0)
    assert(after.count() == 400 - 6)
    // untouched buckets: same file paths, same mtimes (never rewritten)
    val post = files(lake)
    val untouchedBefore = before.filter { case (p, _) =>
      !touchedVals.exists(b => p.contains(s"bucket=$b/")) }
    untouchedBefore.foreach { case (p, t) =>
      assert(post.get(p).contains(t), s"untouched file rewritten: $p") }
  }

  test("a fully-erased bucket loses its directory") {
    // single bucket => erasing every key must remove the whole partition
    val lake = freshLake((1L to 20L).map(u => (u, s"p$u")), buckets = 1)
    Eraser.eraseKeys(spark, lake, "user_id", (1L to 20L).toDF("user_id"), buckets = 1)
    val dir = new java.io.File(lake, "bucket=0")
    assert(!dir.exists(), "fully-erased bucket directory must be deleted")
    // the lake root still exists and reads as empty
    assert(new java.io.File(lake).exists())
  }
}
