package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The IMAGE codec is real: `javax.imageio` (in the JDK — PNG/JPEG/BMP/GIF/
  * WBMP) decodes true dimensions and a 16-bin luminance histogram as the
  * feature vector. Audio/video decode is STUBBED with a deterministic fake
  * (this container ships no audio/video libraries); swap the fake branch of
  * `decodeBytes` for a real codec (e.g. via JNI) without touching the plan
  * shape.
  *
  * Scale notes: decode is per-row, zero-shuffle; binary payloads never pass
  * through a shuffle (metadata-only projections after decode); frame
  * sampling is an in-row `transform` over byte slices.
  */
object Multimodal {

  final case class MediaMeta(kind: String, sizeBytes: Long, width: Int,
      height: Int, durationMs: Long)
  final case class Decoded(mediaId: Long, meta: MediaMeta, features: Array[Float])

  /** Decode one payload. Image kind: real `ImageIO` decode — true
    * width/height from the codec, features = 16-bin luminance histogram
    * normalized to sum 1 (duration 0). Audio/video, and image bytes no
    * registered reader accepts, fall back to a deterministic pseudo-decode
    * so the pipeline stays testable end-to-end without native codecs. */
  private[pipeline] def decodeBytes(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    if (kind == "image") {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Float](16)
        // scanline-strip getRGB: per-pixel getRGB(x,y) pays a ColorModel
        // conversion call per pixel, while one whole-image bulk call would
        // allocate a second 4*w*h-byte ARGB copy (OOM on 100s-of-MP
        // images); a reused one-row buffer gets the bulk speed at O(w)
        // extra memory
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(lum >> 4) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        return Decoded(id, MediaMeta(kind, bytes.length.toLong, w, h, 0L),
          hist.map(_ / n))
      }
    }
    // audio/video (no codec shipped) + undecodable image bytes: the
    // deterministic fake keeps schema, batching and determinism real.
    val hc = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(hc % 1024)
    val height = 64 + math.abs((hc / 1024) % 1024)
    val features = Array.tabulate(16) { i =>
      val x = scala.util.hashing.MurmurHash3.productHash((hc, i))
      x.toFloat / Int.MaxValue
    }
    Decoded(id, MediaMeta(kind, bytes.length.toLong, width, height,
      math.abs(hc % 60000).toLong), features)
  }

  /** Decode a binary media column into metadata + features. mapPartitions so
    * a heavier codec can amortize per-partition init (model load, JNI
    * handles), exactly as a production decode stage would. */
  def decode(df: DataFrame, idCol: String = "media_id",
             binCol: String = "payload", kindCol: String = "kind"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src: Dataset[(Long, String, Array[Byte])] = df.select(
      col(idCol).cast("long"), col(kindCol), col(binCol)).as[(Long, String, Array[Byte])]
    src.mapPartitions { rows =>
      // per-partition codec init: in-memory ImageIO streams (the default
      // spools every read through a temp FILE — measured ~2x the whole
      // decode stage); a heavier codec would load its model/JNI here too
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, kind, bytes) => decodeBytes(id, kind, bytes) }
    }.toDF()
  }

  /** Frame sampling as in-row byte slicing: every `stride`-th window of
    * `frameLen` bytes (a real video pipeline would slice at keyframe offsets
    * from the container index — same plan shape). */
  def sampleFrames(df: DataFrame, binCol: String, frameLen: Int, stride: Int,
                   maxFrames: Int = 8): DataFrame = {
    val n = length(col(binCol))
    val frameCount = least(floor(n / lit(stride)).cast("int") + 1, lit(maxFrames))
    df.withColumn("frames",
      transform(sequence(lit(0), frameCount - 1),
        i => col(binCol).substr(i * stride + 1, lit(frameLen))))
      .withColumn("n_frames", size(col("frames")))
  }

  /** Deterministic tiny PNG derived from (id, text): dimensions vary with
    * the id, pixels with a text-seeded hash — a genuine encoded image the
    * real codec path decodes, with no RNG and no fixture files. Encoded by
    * hand (signature/IHDR/IDAT/IEND with Deflater + CRC32): ImageIO.write's
    * per-call plugin lookup and stream plumbing cost milliseconds per
    * image, which dominated the fixture-generation side of the bench. */
  private[pipeline] def pngPayload(id: Long, text: String): Array[Byte] = {
    val w = 4 + (id % 13).toInt
    val h = 4 + (id % 7).toInt
    val seed = scala.util.hashing.MurmurHash3.stringHash(text, (id & 0x7FFFFFFF).toInt)
    // raw scanlines: filter byte 0 + w RGB triples per row
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0; var p = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        val rgb = scala.util.hashing.MurmurHash3.productHash((seed, x, y))
        raw(p) = (rgb >> 16).toByte; raw(p + 1) = (rgb >> 8).toByte; raw(p + 2) = rgb.toByte
        p += 3; x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new Array[Byte](raw.length + 64)
    val zLen = deflater.deflate(zBuf)
    require(deflater.finished(), "png scanline deflate did not fit one buffer")
    deflater.end()
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + zLen + 12)
    out.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(tag: String, data: Array[Byte], len: Int): Unit = {
      out.putInt(len).put(tag.getBytes("ASCII")).put(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("ASCII")); crc.update(data, 0, len)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr, 13)
    chunk("IDAT", zBuf, zLen)
    chunk("IEND", Array.emptyByteArray, 0)
    out.array()
  }

  /** Wrap a text/documents table as a media table — test fixture path.
    * Image rows (doc_id % 3 == 0) carry a REAL PNG payload rendered
    * deterministically from the doc; audio/video rows carry opaque utf-8
    * bytes for the stub branch. */
  def asMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload =
          if (kind == "image") pngPayload(id, text)
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id, kind, payload)
      }.toDF("media_id", "kind", "payload")
  }
}
