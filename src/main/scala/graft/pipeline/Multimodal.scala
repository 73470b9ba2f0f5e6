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
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
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
      // per-partition codec init would happen here
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
    * real codec path decodes, with no RNG and no fixture files. */
  private[pipeline] def pngPayload(id: Long, text: String): Array[Byte] = {
    val w = 4 + (id % 13).toInt
    val h = 4 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val seed = scala.util.hashing.MurmurHash3.stringHash(text, (id & 0x7FFFFFFF).toInt)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, scala.util.hashing.MurmurHash3.productHash((seed, x, y)) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
