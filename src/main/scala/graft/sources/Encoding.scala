package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Charset sniffing for text sources (reference: io.detect_encoding
  * io.py:1579-1614, Reencoder io.py:183-285). A small driver-side sniff of
  * the file head feeds Spark's `encoding` reader option — the distributed
  * read itself stays native. The reference's mid-read re-open retry
  * (io.py:481-502) becomes a pre-read sniff: no Catalyst analogue exists for
  * mid-query re-execution, and none is needed when the charset is known up
  * front (SURVEY §4).
  */
object Encoding {

  /** Detect charset from BOM / byte patterns of the first `sniffBytes`. */
  def detect(path: String, sniffBytes: Int = 4096): String = {
    val in = Files.newInputStream(Paths.get(path))
    val head = try in.readNBytes(sniffBytes) finally in.close()
    detectBytes(head)
  }

  def detectBytes(b: Array[Byte]): String = {
    def u(i: Int): Int = b(i) & 0xFF
    if (b.length >= 3 && u(0) == 0xEF && u(1) == 0xBB && u(2) == 0xBF) "UTF-8"
    else if (b.length >= 2 && u(0) == 0xFE && u(1) == 0xFF) "UTF-16BE"
    else if (b.length >= 2 && u(0) == 0xFF && u(1) == 0xFE) "UTF-16LE"
    else if (b.length >= 4 && b.take(64).zipWithIndex.count { case (x, i) => x == 0 && i % 2 == 0 } > 8) "UTF-16BE"
    else if (b.length >= 4 && b.take(64).zipWithIndex.count { case (x, i) => x == 0 && i % 2 == 1 } > 8) "UTF-16LE"
    else if (isValidUtf8(b)) "UTF-8"
    else "windows-1252" // reference quirk: chardet maps this to mac-roman for
    // some fixtures (io.py:419-431); we return the modern superset instead
  }

  private def isValidUtf8(b: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
    catch { case _: java.nio.charset.CharacterCodingException =>
      // tolerate a multi-byte char truncated at the sniff boundary
      try { dec.reset(); dec.decode(java.nio.ByteBuffer.wrap(b.dropRight(4))); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    }
  }

  /** Read a whole small file with a detected or given charset (driver-side
    * path used by the eager readers: yaml/html/xml/xlsx). */
  def readString(path: String, charset: Option[String] = None): String = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val cs = charset.getOrElse(detectBytes(bytes.take(4096)))
    val s = new String(bytes, cs)
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }
}
