package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/featurized per partition through a pluggable codec.
  *
  * The Spark-side contract — schema, partition-batched decode, typed
  * metadata struct — is real and tested; the actual image/audio decode is a
  * clearly-marked deterministic STUB (`StubCodec`) because no media codec
  * libraries exist in this environment. Swap [[MediaCodec]] for a JNI/codec
  * implementation in production; nothing else changes.
  *
  * Mirrors the reference's image-scoring surface (fetch → classify → labels
  * back to tables, `/root/reference/02_aml_address_verification.py:56-152`)
  * as a distributed operator instead of a driver loop.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, frames: Int)
  final case class DecodedMedia(id: Long, meta: MediaMeta, label: String)

  /** The pluggable decode/classify hook. Implementations must be
    * serializable (shipped to executors once per partition, not per row). */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
    def classify(bytes: Array[Byte], meta: MediaMeta): String
  }

  /** STUB: deterministic pseudo-decode from the byte stream itself (length
    * and first bytes). Stands in for a real image codec — do NOT interpret
    * its output as real media properties. */
  object StubCodec extends MediaCodec {
    private val formats = Array("jpeg", "png", "webp")
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      MediaMeta(n % 640 + 1, (n * 7) % 480 + 1, formats(n % 3), n % 16 + 1)
    }
    def classify(bytes: Array[Byte], meta: MediaMeta): String =
      if (meta.width % 2 == 0) "house" else "envelope"
  }

  /** Attach a binary media column (here derived from text; in production,
    * `spark.read.format("binaryFile")` or a blob-store path column). */
  def withMedia(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("media", col(sourceCol).cast("binary"))

  /** Partition-batched decode through the codec: the `mapPartitions` shape
    * a vectorized decoder needs (codec init amortized per partition, rows
    * streamed). Returns a typed Dataset. */
  def decodeAll(df: DataFrame, idCol: String, codec: MediaCodec): Dataset[DecodedMedia] = {
    implicit val enc: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]
    df.select(col(idCol).cast("long"), col("media"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val meta = codec.decode(bytes)
          DecodedMedia(id, meta, codec.classify(bytes, meta))
        }
      }
  }

  /** SQL-expressible mirror of StubCodec.decode (for the DuckDB oracle):
    * the same metadata as pure column arithmetic over octet_length. */
  def decodeStubSql(media: Column): Column = struct(
    (octet_length(media) % 640 + 1).as("width"),
    ((octet_length(media) * 7) % 480 + 1).as("height"),
    element_at(array(lit("jpeg"), lit("png"), lit("webp")),
      (octet_length(media) % 3) + 1).as("format"),
    (octet_length(media) % 16 + 1).as("frames"))

  def classifyStubSql(meta: Column): Column =
    when(meta.getField("width") % 2 === 0, lit("house")).otherwise(lit("envelope"))

  /** Resize stub: metadata-level resize (a real impl rewrites bytes). */
  def resizeMeta(meta: Column, maxW: Int): Column = {
    val w = meta.getField("width")
    val scale = when(w > maxW, lit(maxW).cast("double") / w).otherwise(lit(1.0))
    struct(
      (w * scale).cast("int").as("width"),
      (meta.getField("height") * scale).cast("int").as("height"),
      meta.getField("format").as("format"),
      meta.getField("frames").as("frames"))
  }

  /** Frame sampling stub for video-like media: pick every k-th frame index. */
  def sampleFrames(meta: Column, every: Int): Column =
    filter(sequence(lit(0), meta.getField("frames") - 1),
      i => i % every === 0)
}
