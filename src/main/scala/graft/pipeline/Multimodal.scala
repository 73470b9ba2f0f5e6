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
  * envelope as the feature vector. VIDEO container metadata is real for
  * MP4 (ISO BMFF boxes: moov/mvhd/tkhd — ISO/IEC 14496-12) and AVI
  * (RIFF avih header) via native byte parsing — width, height and duration
  * come from the container; only frame DECODE is stubbed (no video codec
  * ships in the JDK) — swap the fake branch of `decodeBytes` for a real
  * codec (e.g. via JNI) without touching the plan shape.
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
    * encodings keep the metadata with zero features). Video kind: real
    * container metadata from the MP4 box walk / AVI avih header, features
    * = byte-value histogram. Bytes no parser accepts fall back to a
    * deterministic pseudo-decode so the pipeline stays testable end-to-end
    * without native codecs. */
  private[pipeline] def decodeBytes(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    if (kind == "audio") {
      val decoded = decodeAudio(id, bytes)
      if (decoded != null) return decoded
    }
    if (kind == "video") {
      val decoded = decodeVideoContainer(id, bytes)
      if (decoded != null) return decoded
    }
    if (kind == "image") {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth; val h = img.getHeight
        // scanline-strip getRGB (inside addLuminance): per-pixel getRGB(x,y)
        // pays a ColorModel conversion call per pixel, while one whole-image
        // bulk call would allocate a second 4*w*h-byte ARGB copy (OOM on
        // 100s-of-MP images); a reused one-row buffer gets the bulk speed at
        // O(w) extra memory
        val hist = new Array[Float](16)
        addLuminance(img, hist)
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

  /** Real video decode, two tiers. Tier 1 — MJPEG-in-AVI: the '00dc'/'00db'
    * movi chunks of an MJPEG AVI are plain baseline JPEGs, which the JDK's
    * own ImageIO decodes — so for this (historically common capture) codec
    * the FRAME decode is fully real: width/height come from decoded pixels,
    * features are the average 16-bin luminance histogram over up to 8
    * sampled frames, duration from the avih header. Tier 2 — any other
    * MP4/AVI: real CONTAINER metadata (ISO/IEC 14496-12 box walk —
    * moov/mvhd for timescale+duration, moov/trak/tkhd for 16.16 fixed-point
    * dimensions; RIFF avih for AVI) with a 16-bin byte-value histogram as
    * the content signature — H.264/VP9 frame decode needs a codec the JDK
    * does not ship. Returns null when the bytes are neither container
    * (caller falls back to the fake). */
  private def decodeVideoContainer(id: Long, bytes: Array[Byte]): Decoded = {
    val jpegFrames = aviVideoChunks(bytes).filter(f =>
      f.length >= 2 && (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8)
    if (jpegFrames.nonEmpty) {
      // sample at most 8 frames evenly across the stream
      val n = jpegFrames.length
      val picks = (0 until math.min(8, n)).map(i => jpegFrames(i * n / math.min(8, n)))
      val imgs = picks.flatMap { f =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      if (imgs.nonEmpty) {
        val hist = new Array[Float](16)
        imgs.foreach(addLuminance(_, hist))
        val total = hist.sum
        val durMs = parseAvi(bytes).map(_._3).getOrElse(0L)
        return Decoded(id,
          MediaMeta("video", bytes.length.toLong, imgs.head.getWidth,
            imgs.head.getHeight, durMs, 0, 0),
          if (total > 0) hist.map(_ / total) else hist)
      }
    }
    val meta = parseMp4(bytes).orElse(parseAvi(bytes))
    meta match {
      case Some((w, h, durMs)) =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
        val n = math.max(bytes.length, 1).toFloat
        Decoded(id, MediaMeta("video", bytes.length.toLong, w, h, durMs, 0, 0),
          hist.map(_ / n))
      case None => null
    }
  }

  /** Accumulate an image's luminance counts into a 16-bin histogram (the
    * scanline-strip walk shared with the image branch — see the O(w) buffer
    * note there). */
  private def addLuminance(img: java.awt.image.BufferedImage, hist: Array[Float]): Unit = {
    val w = img.getWidth; val h = img.getHeight
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
  }

  /** The video stream payloads ('NNdc'/'NNdb' chunks inside LIST/movi) of a
    * RIFF AVI, in stream order; Nil when the bytes are not an AVI. */
  private[graft] def aviVideoChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return Nil
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val t = tag(bytes, off)
        val size = u32le(bytes, off + 4)
        if (size < 0 || off + 8 + size > to) return
        if (t == "LIST" && depth < 4) walk(off + 12, (off + 8 + size).toInt, depth + 1)
        else if (t.length == 4 && t.charAt(0).isDigit && t.charAt(1).isDigit &&
          (t.endsWith("dc") || t.endsWith("db")))
          out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size.toInt)
        off += 8 + size.toInt + (size.toInt & 1) // word-aligned
      }
    }
    walk(12, bytes.length, 0)
    out.toSeq
  }

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xFFL) << 24) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 1) & 0xFFL) << 8) | (b(o) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long = (u32(b, o) << 32) | u32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "ISO-8859-1") else ""

  /** (width, height, durationMs) from an ISO BMFF file, or None. */
  private[graft] def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    // a BMFF file starts with a well-formed box; require the conventional
    // ftyp leader so arbitrary bytes don't parse
    if (bytes.length < 16 || tag(bytes, 4) != "ftyp") return None
    var durMs = 0L; var w = 0; var h = 0
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        var size = u32(bytes, off.toInt)
        val t = tag(bytes, off.toInt + 4)
        var hdr = 8L
        if (size == 1 && off + 16 <= to) { size = u64(bytes, off.toInt + 8); hdr = 16L }
        else if (size == 0) size = to - off // box extends to end
        if (size < hdr || off + size > to) return // malformed: stop this level
        val p = (off + hdr).toInt
        t match {
          case "moov" | "trak" | "mdia" if depth < 8 => walk(off + hdr, off + size, depth + 1)
          case "mvhd" if p + 4 <= bytes.length =>
            val v = bytes(p) & 0xFF
            if (v == 1 && p + 28 + 4 <= bytes.length) {
              val timescale = u32(bytes, p + 20)
              val dur = u64(bytes, p + 24)
              if (timescale > 0) durMs = dur * 1000L / timescale
            } else if (v == 0 && p + 20 <= bytes.length) {
              val timescale = u32(bytes, p + 12)
              val dur = u32(bytes, p + 16)
              if (timescale > 0) durMs = dur * 1000L / timescale
            }
          case "tkhd" =>
            val v = bytes(p) & 0xFF
            val wOff = if (v == 1) p + 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                       else p + 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
            // width/height are 16.16 fixed point; keep the integer part,
            // preferring the first track that carries non-zero dimensions
            if (wOff + 8 <= bytes.length && w == 0) {
              val tw = (u32(bytes, wOff) >> 16).toInt
              val th = (u32(bytes, wOff + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th }
            }
          case _ => ()
        }
        off += size
      }
    }
    walk(0, bytes.length.toLong, 0)
    if (w > 0 || durMs > 0) Some((w, h, durMs)) else None
  }

  /** (width, height, durationMs) from a RIFF AVI main header, or None. */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    // walk RIFF chunks; avih lives inside LIST/hdrl
    def walk(from: Int, to: Int, depth: Int): Option[(Int, Int, Long)] = {
      var off = from
      while (off + 8 <= to) {
        val t = tag(bytes, off)
        val size = u32le(bytes, off + 4)
        if (size < 0 || off + 8 + size > to) return None
        if (t == "LIST" && depth < 4) {
          val r = walk(off + 12, (off + 8 + size).toInt, depth + 1)
          if (r.isDefined) return r
        } else if (t == "avih" && off + 8 + 40 <= to) {
          val p = off + 8
          val usPerFrame = u32le(bytes, p)
          val totalFrames = u32le(bytes, p + 16)
          val w = u32le(bytes, p + 32).toInt
          val h = u32le(bytes, p + 36).toInt
          return Some((w, h, totalFrames * usPerFrame / 1000L))
        }
        off += 8 + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
      }
      None
    }
    walk(12, bytes.length, 0)
  }

  /** Deterministic minimal MP4 derived from (id, text): a genuine ISO BMFF
    * layout (ftyp + moov[mvhd + trak[tkhd]] + mdat) with id-seeded
    * dimensions and duration, so the real container parser is exercised
    * with no fixture files. The mdat payload is text-seeded hash noise. */
  private[graft] def mp4Payload(id: Long, text: String): Array[Byte] = {
    val w = 160 + (id % 5).toInt * 80
    val h = 120 + (id % 3).toInt * 60
    val timescale = 1000
    val durMs = 500 + (id % 11).toInt * 250
    val seed = scala.util.hashing.MurmurHash3.stringHash(text, (id & 0x7FFFFFFF).toInt)
    val mdatLen = 64 + (seed & 0x3F)
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(t.getBytes("ASCII")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100) // version 0 mvhd
      b.putInt(0)                               // version + flags
      b.putInt(0).putInt(0)                     // creation/modification
      b.putInt(timescale).putInt(durMs)         // timescale, duration (ms)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      b.position(b.position() + 8 + 36)         // reserved + matrix
      b.position(b.position() + 24)             // pre_defined
      b.putInt(2)                               // next_track_ID
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84) // version 0 tkhd
      b.putInt(7)                              // version 0, flags: enabled
      b.putInt(0).putInt(0).putInt(1).putInt(0) // times, track id, reserved
      b.putInt(durMs)
      b.position(b.position() + 8 + 2 + 2 + 2 + 2 + 36) // reserved/layer/matrix
      b.putInt(w << 16).putInt(h << 16)        // 16.16 fixed point
      b.array()
    }
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    val mdat = box("mdat", Array.tabulate(mdatLen.toInt)(i =>
      scala.util.hashing.MurmurHash3.productHash((seed, i)).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Deterministic MJPEG AVI derived from (id, text): a genuine RIFF layout
    * (hdrl[avih + strl[strh 'MJPG' + strf]] + movi with real baseline-JPEG
    * '00dc' frames encoded via ImageIO) so the REAL frame-decode tier of
    * the video path is exercised with no fixture files. Frames are tiny
    * (8-23 px) and few (2-4) to keep fixture-side encode cost negligible. */
  private[graft] def mjpegAviPayload(id: Long, text: String): Array[Byte] = {
    val w = 8 + (id % 5).toInt * 3
    val h = 8 + (id % 3).toInt * 5
    val nFrames = 2 + (id % 3).toInt
    val usPerFrame = 40000L // 25 fps
    val seed = scala.util.hashing.MurmurHash3.stringHash(text, (id & 0x7FFFFFFF).toInt)
    javax.imageio.ImageIO.setUseCache(false)
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            scala.util.hashing.MurmurHash3.productHash((seed, f, x, y)) & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    def chunk(t: String, payload: Array[Byte]): Array[Byte] = {
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      val b = java.nio.ByteBuffer.allocate(8 + padded.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(t.getBytes("ASCII")).putInt(payload.length).put(padded)
      b.array()
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("ASCII") ++ payload)
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame.toInt) // dwMicroSecPerFrame
      b.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      b.putInt(nFrames) // dwTotalFrames
      b.putInt(0).putInt(1) // initialFrames, streams
      b.putInt(0) // suggestedBufferSize
      b.putInt(w).putInt(h) // dwWidth, dwHeight
      b.array() // + 16 reserved bytes of zero padding
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("ASCII")).put("MJPG".getBytes("ASCII"))
      b.putInt(0).putInt(0).putInt(0) // flags, priority+language, initialFrames
      b.putInt(1).putInt(25)          // scale, rate (25 fps)
      b.putInt(0).putInt(nFrames)     // start, length
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.put("MJPG".getBytes("ASCII"))
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(body.length).put(body)
    out.array()
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
    * Every kind carries a GENUINE container rendered deterministically
    * from the doc: image rows (doc_id % 3 == 0) a real PNG, audio rows
    * (doc_id % 3 == 1) a real PCM WAV, video rows alternate a real minimal
    * MP4 (container-metadata tier) and a real MJPEG AVI (full frame-decode
    * tier) — so every decode branch exercises its actual parser. */
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
          case _ =>
            if ((id / 3) % 2 == 0) mp4Payload(id, text)
            else mjpegAviPayload(id, text)
        }
        (id, kind, payload)
      }.toDF("media_id", "kind", "payload")
  }
}
