package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The IMAGE codec is real: `javax.imageio` (in the JDK — PNG/JPEG/BMP/GIF/
  * WBMP) decodes true dimensions and a 16-bin luminance histogram as the
  * feature vector. The AUDIO codec is real for WAV/AIFF/AU:
  * `javax.sound.sampled` (also in the JDK) recovers sample rate, channel
  * count and exact duration, and 16-bit PCM payloads get a 16-window RMS
  * envelope as the feature vector. Video decode is STUBBED with a
  * deterministic fake (this container ships no video codecs); swap the fake
  * branch of `decodeBytes` for a real codec (e.g. via JNI) without touching
  * the plan shape.
  *
  * Scale notes: decode is per-row, zero-shuffle; binary payloads never pass
  * through a shuffle (metadata-only projections after decode); frame
  * sampling is an in-row `transform` over byte slices.
  */
object Multimodal {

  final case class MediaMeta(kind: String, sizeBytes: Long, width: Int,
      height: Int, durationMs: Long, sampleRateHz: Int, channels: Int)
  final case class Decoded(mediaId: Long, meta: MediaMeta, features: Array[Float])

  /** Decode one payload. Image kind: real `ImageIO` decode — true
    * width/height from the codec, features = 16-bin luminance histogram
    * normalized to sum 1 (duration 0). Audio kind: real
    * `javax.sound.sampled` decode — sample rate / channels / exact duration
    * from the codec, features = 16-window RMS envelope (16-bit PCM; other
    * encodings keep the metadata with zero features). Video, and
    * image/audio bytes no registered reader accepts, fall back to a
    * deterministic pseudo-decode so the pipeline stays testable end-to-end
    * without native codecs. */
  private[pipeline] def decodeBytes(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    if (kind == "audio") {
      val decoded = decodeAudio(id, bytes)
      if (decoded != null) return decoded
    }
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
        return Decoded(id, MediaMeta(kind, bytes.length.toLong, w, h, 0L, 0, 0),
          hist.map(_ / n))
      }
    }
    // video (no codec shipped) + undecodable image/audio bytes: the
    // deterministic fake keeps schema, batching and determinism real.
    val hc = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(hc % 1024)
    val height = 64 + math.abs((hc / 1024) % 1024)
    val features = Array.tabulate(16) { i =>
      val x = scala.util.hashing.MurmurHash3.productHash((hc, i))
      x.toFloat / Int.MaxValue
    }
    Decoded(id, MediaMeta(kind, bytes.length.toLong, width, height,
      math.abs(hc % 60000).toLong, 0, 0), features)
  }

  /** Real audio decode via `javax.sound.sampled` (WAV/AIFF/AU in the JDK).
    * Metadata comes from the codec header; for 16-bit PCM the feature
    * vector is a 16-window RMS envelope of the channel-averaged signal,
    * normalized to full scale. Returns null when no installed reader
    * accepts the bytes (caller falls back to the deterministic fake). */
  private def decodeAudio(id: Long, bytes: Array[Byte]): Decoded = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => return null }
    try {
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val channels = fmt.getChannels
      val durationMs =
        if (frames >= 0 && fmt.getFrameRate > 0) (frames * 1000L / fmt.getFrameRate.toLong)
        else 0L
      val features = new Array[Float](16)
      val pcm16 = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && frames > 0 && frames <= Int.MaxValue / 4
      if (pcm16) {
        // stream one frame block at a time is overkill for the envelope:
        // read all PCM (frames * frameSize bytes, bounded by the payload
        // we already hold in memory), average channels, RMS per window
        val data = ais.readAllBytes()
        val be = fmt.isBigEndian
        val nFrames = (data.length / fmt.getFrameSize).toInt
        if (nFrames > 0) {
          val sumSq = new Array[Double](16)
          val cnt = new Array[Int](16)
          var f = 0
          while (f < nFrames) {
            val w = (f.toLong * 16 / nFrames).toInt
            var ch = 0; var acc = 0.0
            while (ch < channels) {
              val o = f * fmt.getFrameSize + ch * 2
              val s =
                if (be) ((data(o) << 8) | (data(o + 1) & 0xFF)).toShort
                else ((data(o + 1) << 8) | (data(o) & 0xFF)).toShort
              acc += s; ch += 1
            }
            val mono = acc / channels
            sumSq(w) += mono * mono; cnt(w) += 1
            f += 1
          }
          var w = 0
          while (w < 16) {
            if (cnt(w) > 0)
              features(w) = (math.sqrt(sumSq(w) / cnt(w)) / 32768.0).toFloat
            w += 1
          }
        }
      }
      Decoded(id, MediaMeta("audio", bytes.length.toLong, 0, 0, durationMs,
        fmt.getSampleRate.toInt, channels), features)
    } catch {
      case scala.util.control.NonFatal(_) => null
    } finally ais.close()
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

  /** Deterministic tiny PCM WAV derived from (id, text): 16-bit mono at
    * 8 kHz, frame count varying with the id, samples from a text-seeded
    * hash — a genuine RIFF/WAVE payload the real `javax.sound.sampled`
    * codec path decodes, with no RNG and no fixture files. */
  private[graft] def wavPayload(id: Long, text: String): Array[Byte] = {
    val sampleRate = 8000
    val nSamples = 160 + (id % 7).toInt * 80 // 20ms .. 80ms
    val seed = scala.util.hashing.MurmurHash3.stringHash(text, (id & 0x7FFFFFFF).toInt)
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      out.putShort((scala.util.hashing.MurmurHash3.productHash((seed, i)) >> 16).toShort)
      i += 1
    }
    out.array()
  }

  /** Wrap a text/documents table as a media table — test fixture path.
    * Image rows (doc_id % 3 == 0) carry a REAL PNG payload and audio rows
    * (doc_id % 3 == 1) a REAL PCM WAV payload, both rendered
    * deterministically from the doc; video rows carry opaque utf-8 bytes
    * for the stub branch. */
  def asMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => pngPayload(id, text)
          case "audio" => wavPayload(id, text)
          case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, kind, payload)
      }.toDF("media_id", "kind", "payload")
  }
}
