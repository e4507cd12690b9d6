package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): media rides as an opaque
  * `binary` column with typed metadata; decode/feature-extract runs as a
  * typed `Dataset.mapPartitions` stage (the Scala analog of `mapInPandas` —
  * batch-shaped, schema-stable, partition-parallel).
  *
  * The actual codec is STUBBED (this container has no image/audio libs):
  * `StubDecoder.decode` derives deterministic fake dimensions from the
  * byte stream. The Spark-side plumbing — binary column handling, encoder
  * schema, partition iteration, metadata struct — is real and oracle-tested.
  */
object Multimodal {

  /** Opaque media record: bytes + source id. */
  final case class MediaRecord(media_id: Long, content: Array[Byte])

  /** Typed decode output. `format`/`width`/`height`/`channels` would come
    * from the codec; `byte_length` and `content_md5` are real.
    */
  final case class MediaMeta(
      media_id: Long,
      byte_length: Int,
      content_md5: String,
      format: String,
      width: Int,
      height: Int,
      channels: Int)

  /** STUB: deterministic fake decode — replace with a real codec
    * (javax.imageio / ffmpeg bindings) in production. Kept arithmetic-only
    * so the DuckDB oracle can reproduce it from octet_length.
    */
  object StubDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
      val n = bytes.length
      ("fake/raw", n % 640 + 1, n % 480 + 1, 3)
    }
  }

  /** binary column → typed metadata via mapPartitions. One pass over the
    * bytes per record; partition-local, no shuffle.
    */
  def extractMeta(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        md.reset()
        val digest = md.digest(rec.content).map(b => f"${b & 0xff}%02x").mkString
        val (fmt, w, h, c) = StubDecoder.decode(rec.content)
        MediaMeta(rec.media_id, rec.content.length, digest, fmt, w, h, c)
      }
    }(Encoders.product[MediaMeta]).toDF()
  }

  /** Demo source: documents' text bytes standing in for media blobs —
    * exercises the binary-column path end to end.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }
}
