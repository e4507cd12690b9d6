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
        val content = if (rec.content == null) Array.emptyByteArray else rec.content
        md.reset()
        val digest = md.digest(content).map(b => f"${b & 0xff}%02x").mkString
        val (fmt, w, h, c) = StubDecoder.decode(content)
        MediaMeta(rec.media_id, content.length, digest, fmt, w, h, c)
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

  /** One sampled frame: every `stride`-th fixed-size chunk of the stream.
    * `frame_sum` is the unsigned-byte sum — a cheap content checksum the
    * oracle recomputes.
    */
  final case class Frame(media_id: Long, frame_idx: Int, frame_len: Int, frame_sum: Long)

  /** Frame sampling for "video" blobs: treat the byte stream as consecutive
    * `frameSize`-byte frames and emit every `stride`-th one. A row-exploding
    * mapPartitions stage (1 record in → ~len/(frameSize·stride) rows out) —
    * the shape a real ffmpeg frame-grab stage has. Partition-local, no
    * shuffle; memory is bounded by one record at a time because the output
    * iterator is lazy.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
      frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    require(frameSize > 0 && stride > 0)
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val content = if (rec.content == null) Array.emptyByteArray else rec.content
        val n = content.length
        val numFrames = (n + frameSize - 1) / frameSize
        (0 until numFrames by stride).iterator.map { f =>
          val start = f * frameSize
          val end = math.min(start + frameSize, n)
          var s = 0L; var i = start
          while (i < end) { s += content(i) & 0xff; i += 1 }
          Frame(rec.media_id, f, end - start, s)
        }
      }
    }(Encoders.product[Frame]).toDF()
  }

  /** Resized record: stub nearest-neighbor "resample" of the 1-D byte
    * stream to exactly `target` bytes (out[i] = in[floor(i·len/target)]) —
    * the real thing would be a codec resize; the Spark shape (binary in,
    * binary out, 1:1 for non-empty media) is identical. `out_sum` checksums
    * the bytes. Empty/NULL media emit NO row (nothing to resample) —
    * consistent with the x13c oracle's `length(text) > 0` filter.
    */
  final case class Resized(media_id: Long, out_len: Int, out_sum: Long, content: Array[Byte])

  def resizeStub(spark: SparkSession, media: Dataset[MediaRecord],
      target: Int): DataFrame = {
    import spark.implicits._
    require(target > 0)
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val content = if (rec.content == null) Array.emptyByteArray else rec.content
        val n = content.length
        if (n == 0) Iterator.empty
        else {
          val out = new Array[Byte](target)
          var s = 0L; var i = 0
          while (i < target) {
            val b = content((i.toLong * n / target).toInt)
            out(i) = b; s += b & 0xff; i += 1
          }
          Iterator.single(Resized(rec.media_id, target, s, out))
        }
      }
    }(Encoders.product[Resized]).toDF()
  }

  /** Byte-histogram features: the stub feature-extraction stage. `counts`
    * is the per-bucket byte histogram (bucket = byte >> shift), `features`
    * the L1-normalized double vector — the same fixed-length-vector shape a
    * real embedding extractor emits.
    */
  final case class MediaFeatures(media_id: Long, counts: Array[Long], features: Array[Double])

  def byteHistogramFeatures(spark: SparkSession, media: Dataset[MediaRecord],
      buckets: Int = 8): DataFrame = {
    import spark.implicits._
    require(buckets > 0 && 256 % buckets == 0)
    val shift = Integer.numberOfTrailingZeros(256 / buckets)
    media.mapPartitions { it =>
      it.map { rec =>
        val content = if (rec.content == null) Array.emptyByteArray else rec.content
        val counts = new Array[Long](buckets)
        var i = 0
        while (i < content.length) {
          counts((content(i) & 0xff) >> shift) += 1
          i += 1
        }
        val total = math.max(1L, content.length.toLong)
        MediaFeatures(rec.media_id, counts, counts.map(_.toDouble / total))
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }
}
