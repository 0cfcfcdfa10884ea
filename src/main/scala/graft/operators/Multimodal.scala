package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (builder prompt). The decode step is a
  * clearly-marked deterministic fake — the image/audio codecs aren't in
  * this container — but everything Spark-side is real: schema, batched
  * per-partition processing, partitioning behavior, and the metadata
  * contract a real decoder would fill.
  *
  * Testdata has no binary column, so `documents.text` is encoded to bytes
  * to stand in for a blob payload (UTF-8 — same bytes DuckDB's ENCODE
  * produces, so the plumbing query q50 is still oracle-checkable).
  */
object Multimodal {

  /** Typed metadata a real image decoder would emit. */
  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg.
    * Derives pseudo-dimensions from the byte length so tests are stable.
    * A real implementation would parse the codec header here; the Spark
    * contract (bytes in, struct out, executed per partition batch) is
    * unchanged by the stub.
    */
  def fakeDecodeImage(bytes: Array[Byte]): Row = {
    val n = if (bytes == null) 0 else bytes.length
    Row(64 + n % 512, 64 + (n * 7) % 512, 3, "fake/rgb8")
  }

  /** Decoded metadata via a per-partition batch pass (`mapPartitions` —
    * the Scala analog of `mapInPandas` batch decode): rows stream through
    * one partition at a time, the decoder amortizes per-batch setup, and
    * no driver collection happens anywhere.
    *
    * Only the projected columns cross the Row-encoder boundary — the
    * full-width formulation round-tripped EVERY column through
    * deserialization and broke codegen for the whole projection; here the
    * rest of the row never leaves Tungsten format. Callers that need
    * other columns keep them outside (as [[q51ImagePipeline]] does) or
    * join the result back on `idCol`.
    */
  def imageMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val slim = df.select(df.col(idCol), df.col(blobCol))
    val outSchema = StructType(slim.schema.fields :+ StructField("image_meta", ImageMetaSchema))
    slim.mapPartitions { it =>
      // per-partition setup (a real decoder would init its codec here)
      it.map { row =>
        val bytes = row.get(1).asInstanceOf[Array[Byte]]
        Row.fromSeq(row.toSeq :+ fakeDecodeImage(bytes))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Full-width convenience: all original columns plus `image_meta`,
    * via [[imageMeta]] and a join back on `idCol`. The join shuffles the
    * wide side — prefer [[imageMeta]] directly when the downstream only
    * needs (id, blob, meta).
    *
    * PRECONDITION: `idCol` must identify the blob — rows sharing an id
    * get the meta of an arbitrary one of their blobs. The meta side is
    * deduplicated on `idCol`, so output cardinality always equals
    * `df`'s (the pre-dedup join multiplied duplicate ids). Note `df` is
    * evaluated twice (meta pass + join probe); persist upstream if it is
    * expensive.
    */
  def withImageMeta(df: DataFrame, blobCol: String, idCol: String = "doc_id"): DataFrame =
    df.join(
      imageMeta(df, idCol, blobCol).drop(blobCol).dropDuplicates(idCol),
      Seq(idCol))

  /** Frame-sample analog: take every `stride`-th byte of the blob (stands
    * in for sampling video frames); pure columnar expression.
    */
  def sampleBytes(blob: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    filter(transform(sequence(lit(1), octet_length(blob)),
      i => when(pmod(i - 1, lit(stride)) === 0, blob.substr(i, lit(1)))),
      x => x.isNotNull)

  /** Oracle-checkable plumbing query: blob length, content hash, and a
    * hex head slice — the metadata extraction layer minus the stub.
    * (DuckDB 1.0 can't SUBSTRING a BLOB, so its head slice is text-side —
    * identical bytes on this ASCII corpus.)
    */
  def q50BlobMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .withColumn("blob", $"text".cast("binary"))
      .select($"doc_id",
        octet_length($"blob").cast("long").as("n_bytes"),
        md5($"blob").as("blob_md5"),
        hex(substring($"blob", 1, 8)).as("head_hex"))
      .orderBy($"doc_id")
  }

  val q50Sql: String =
    """SELECT doc_id,
      |  OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      |  MD5(text) AS blob_md5,
      |  HEX(ENCODE(SUBSTRING(text, 1, 8))) AS head_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Spark-only driver query exercising the stubbed decode path
    * end-to-end (rows-only check): decode metadata + byte sampling over
    * the blob column.
    */
  def q51ImagePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withBlob = documents(s, d).withColumn("blob", $"text".cast("binary"))
    imageMeta(withBlob, "doc_id", "blob")
      .select($"doc_id",
        $"image_meta.width".cast("long").as("width"),
        $"image_meta.height".cast("long").as("height"),
        $"image_meta.format".as("format"),
        size(sampleBytes($"blob", 16)).cast("long").as("n_sampled"))
      .orderBy($"doc_id")
  }
}
