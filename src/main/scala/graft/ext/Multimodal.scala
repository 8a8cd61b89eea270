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

  /** REAL header-sniffing codec: container dimensions and frame count
    * parsed straight from the byte stream of the three public image
    * container formats — no image library involved, just the published
    * byte layouts:
    *
    *  - PNG (RFC 2083 / W3C spec): 8-byte signature, then the IHDR chunk —
    *    width/height are the two big-endian u32s at offsets 16/20.
    *  - JPEG (ITU T.81): marker scan from SOI; any SOFn marker
    *    (0xC0–0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC) carries
    *    [precision u8][height u16 BE][width u16 BE] after its length.
    *  - GIF (GIF89a spec): logical-screen width/height are little-endian
    *    u16s at offsets 6/8; frames = image-descriptor (0x2C) count from a
    *    full block walk (global/local color tables and data sub-blocks
    *    skipped by their declared sizes, extensions by sub-block chains).
    *
    * The distributed decode surface the reference drives through a
    * pretrained CNN (`02_aml_address_verification.py:107-132`) with the
    * per-image model swapped for byte arithmetic; [[StubCodec]] remains
    * for media types with no parseable container. Throws
    * IllegalArgumentException on bytes that are none of the three
    * containers — wrap in a try + null-meta at ingestion boundaries where
    * corrupt blobs are expected. */
  object HeaderCodec extends MediaCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    def decode(bytes: Array[Byte]): MediaMeta = try {
      if (bytes.length >= 24 && be32(bytes, 0) == 0x89504e47 &&
        be32(bytes, 4) == 0x0d0a1a0a)
        MediaMeta(be32(bytes, 16), be32(bytes, 20), "png", 1)
      else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
        decodeJpeg(bytes)
      else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F') // 13 = header + full logical screen descriptor
        decodeGif(bytes)
      else throw new IllegalArgumentException(
        s"not a PNG/JPEG/GIF container (${bytes.length} bytes)")
    } catch {
      // a container whose declared structure runs past the byte stream is
      // corrupt/truncated — surface it as the DOCUMENTED exception type, so
      // ingestion boundaries can catch one thing
      case _: ArrayIndexOutOfBoundsException => throw new IllegalArgumentException(
        s"truncated PNG/JPEG/GIF container (${bytes.length} bytes)")
    }

    private def decodeJpeg(b: Array[Byte]): MediaMeta = {
      var i = 2
      while (i + 4 <= b.length) {
        if (u8(b, i) != 0xff) throw new IllegalArgumentException(
          f"JPEG marker expected at $i%d, got 0x${u8(b, i)}%02x")
        val m = u8(b, i + 1)
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return MediaMeta(be16(b, i + 7), be16(b, i + 5), "jpeg", 1) // SOFn
        else if (m == 0xda || m == 0xd9) // SOS/EOI before any SOF
          throw new IllegalArgumentException("JPEG has no SOF before scan data")
        else i += 2 + be16(b, i + 2) // segment length includes its own bytes
      }
      throw new IllegalArgumentException("JPEG truncated before SOF")
    }

    private def decodeGif(b: Array[Byte]): MediaMeta = {
      val (w, h) = (le16(b, 6), le16(b, 8))
      // skip global color table if the LSD packed field flags one
      var i = 13 + (if ((u8(b, 10) & 0x80) != 0) 3 * (1 << ((u8(b, 10) & 7) + 1)) else 0)
      var frames = 0
      def skipSubBlocks(): Unit = {
        while (u8(b, i) != 0) i += 1 + u8(b, i)
        i += 1 // block terminator
      }
      while (i < b.length && u8(b, i) != 0x3b) u8(b, i) match {
        case 0x2c => // image descriptor: 9 fixed bytes, optional LCT, LZW data
          frames += 1
          val packed = u8(b, i + 9)
          i += 10 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
          i += 1 // LZW minimum code size
          skipSubBlocks()
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          skipSubBlocks()
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02x at $i%d")
      }
      // the walk must STOP ON the trailer — running off the end (e.g. a
      // declared color table longer than the stream) is a truncated file,
      // not a zero-frame GIF
      if (i >= b.length) throw new IllegalArgumentException(
        "GIF block walk ran past the byte stream (no trailer)")
      MediaMeta(w, h, "gif", frames)
    }

    /** Orientation from the parsed container geometry — the deterministic
      * stand-in for the reference's CNN label. */
    def classify(bytes: Array[Byte], meta: MediaMeta): String =
      if (meta.width >= meta.height) "landscape" else "portrait"
  }

  /** Fixture-side renderer: a REAL image byte stream (PNG/JPEG/GIF, the
    * multi-frame GIF via a sequence writer) through the JDK's own
    * javax.imageio. Fixture generation ONLY — [[HeaderCodec]] never
    * touches an image library; this exists so its byte-level parsers can
    * be exercised against genuinely-encoded containers (q179 + spec)
    * without media libraries in the environment. Deterministic for a
    * given (w, h, format, frames, seed). */
  def renderImage(width: Int, height: Int, format: String, frames: Int,
      seed: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    def frame(k: Int): BufferedImage = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((x * 31 + y * 17 + k * 7 + seed) % 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (format == "gif" && frames > 1) {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { k =>
        writer.writeToSequence(new IIOImage(frame(k), null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
    } else {
      require(frames == 1, s"$format supports 1 frame here, got $frames")
      ImageIO.write(frame(0), format, baos)
    }
    baos.toByteArray
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
