package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FIXTURE code, not product surface: deterministic synthetic media payloads
  * (genuine PNG / PCM WAV / ISO-BMFF MP4 / MJPEG AVI containers rendered
  * from (id, text) with no RNG and no fixture files) that exercise the real
  * codec paths of [[Multimodal]]. The product decode surface —
  * `Multimodal.decode` / `Multimodal.sampleFrames` — never depends on this
  * object; it exists so specs and driver queries can feed the decode stage
  * without shipping binary fixtures in the repo.
  */
object MediaFixtures {

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

  /** Deterministic tiny PNG derived from (id, text): dimensions vary with
    * the id, pixels with a text-seeded hash — a genuine encoded image the
    * real codec path decodes, with no RNG and no fixture files. Encoded by
    * hand (signature/IHDR/IDAT/IEND with Deflater + CRC32): ImageIO.write's
    * per-call plugin lookup and stream plumbing cost milliseconds per
    * image, which dominated the fixture-generation side of the bench. */
  private[graft] def pngPayload(id: Long, text: String): Array[Byte] = {
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

  /** Wrap a text/documents table as a media table. Every kind carries a
    * GENUINE container rendered deterministically from the doc: image rows
    * (doc_id % 3 == 0) a real PNG, audio rows (doc_id % 3 == 1) a real PCM
    * WAV, video rows alternate a real minimal MP4 (container-metadata tier)
    * and a real MJPEG AVI (full frame-decode tier) — so every decode branch
    * exercises its actual parser. */
  def asMediaTable(documents: DataFrame): DataFrame = {
    renders.incrementAndGet()
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

  // how many times a media-table RENDER plan was built — specs assert the
  // memoized path synthesizes once per sf dir
  private[graft] val renders = new java.util.concurrent.atomic.AtomicLong(0)

  private val materialized = scala.collection.concurrent.TrieMap[String, String]()

  /** [[asMediaTable]] rendered ONCE per sf dir to a temp parquet and read
    * back — so a measured decode query (q36) times DECODE, not fixture
    * synthesis (the MJPEG fixture's per-frame JPEG ENCODE otherwise
    * dominates the measurement). Bench warms this up outside the timings. */
  def materializedMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val path = materialized.getOrElseUpdate(sfDir, {
      val p = java.nio.file.Files.createTempDirectory("graft-media-")
        .resolve("media.parquet").toString
      asMediaTable(graft.Tables.documents(spark, sfDir))
        .write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }
}
