package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry is assembled from the per-surface operator objects; each
  * object keeps its Spark implementation and DuckDB oracle SQL side by side.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++ EventOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ SeqOps.queries ++ CorpusOps.queries ++
      StatsOps.queries ++ Curation.queries ++ PortableMinHash.queries ++ PortableAnn.queries ++
      Mixing.queries ++ SemDedup.queries ++ RuntimeFilter.queries ++ Indicators.queries ++
      Drift.queries ++ GraphOps.queries ++ LmOps.queries ++ Sketches.queries ++
      Retrieval.queries ++ PortableSimHash.queries ++ Fuzzy.queries ++ DimOps.queries ++
      LakeOps.queries ++
      Map( // engine-hash pipelines (q36 oracle-checked end-to-end via the
        // recall-1 banding argument; q37/q43 via planted-invariant audits)
        "q36_minhash_dedup" -> (MinHashLsh.q36MinhashDedup _),
        "q37_simhash_dedup" -> (SimHash.q37SimhashDedup _),
        "q43_ann_lsh" -> (AnnLsh.q43AnnLsh _),
        "q50_blob_meta" -> (Multimodal.q50BlobMeta _),
        "q51_image_pipeline" -> (Multimodal.q51ImagePipeline _),
        "q117_audio_pipeline" -> (Multimodal.q117AudioPipeline _),
        "q119_video_pipeline" -> (Multimodal.q119VideoPipeline _),
        "q146_blob_dedup" -> (Multimodal.q146BlobDedup _),
        "q147_blob_attr_fingerprint" -> (Multimodal.q147BlobAttrFingerprint _),
        "q166_image_resize_plan" -> (Multimodal.q166ImageResizePlan _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ EventOps.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ SeqOps.oracles ++ CorpusOps.oracles ++
      StatsOps.oracles ++ Curation.oracles ++ PortableMinHash.oracles ++ PortableAnn.oracles ++
      Mixing.oracles ++ SemDedup.oracles ++ RuntimeFilter.oracles ++ Indicators.oracles ++
      Drift.oracles ++ GraphOps.oracles ++ LmOps.oracles ++ Sketches.oracles ++
      Retrieval.oracles ++ PortableSimHash.oracles ++ Fuzzy.oracles ++ DimOps.oracles ++
      LakeOps.oracles ++
      Map("q50_blob_meta" -> Multimodal.q50Sql,
        "q51_image_pipeline" -> Multimodal.q51Sql,
        "q117_audio_pipeline" -> Multimodal.q117Sql,
        "q119_video_pipeline" -> Multimodal.q119Sql,
        "q146_blob_dedup" -> Multimodal.q146Sql,
        "q147_blob_attr_fingerprint" -> Multimodal.q147Sql,
        "q166_image_resize_plan" -> Multimodal.q166Sql,
        // the LSH pipeline's verified OUTPUT is hash-free, so the oracle
        // checks it end to end (recall-1 banding argument in MinHashLsh);
        // q37/q43 are planted-invariant audits (ground truth + floors)
        "q36_minhash_dedup" -> MinHashLsh.q36Sql,
        "q37_simhash_dedup" -> SimHash.q37Sql,
        "q43_ann_lsh" -> AnnLsh.q43Sql)
}
