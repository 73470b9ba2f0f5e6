package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.time.LocalDate

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 read_xls for legacy binary .xls (meza/io.py:1033-1118): an OLE2
  * compound document containing a BIFF8 "Workbook" stream. Driver-side eager
  * parse like the reference (and like xlsx).
  *
  * Cell stringification follows sanitize_sheet (io.py:963-1022) exactly,
  * including its quirks: numbers render as Python-style floats ("234.0"),
  * date-formatted serials < 1 render as HH:MM:SS times, and — reproducing
  * the reference's `value.is_integer` bug (the method is never *called*, so
  * the truthy bound method always routes to the date branch) — fractional
  * serials >= 1 render as plain dates, dropping the time part.
  *
  * Supported: FAT + miniFAT streams incl. DIFAT spill sectors (files beyond
  * the header DIFAT's ~7 MB reach), SST incl. CONTINUE-record spill (large
  * shared-string tables; strings may split mid-characters with a changed
  * compression flag), LABELSST,
  * NUMBER, RK, MULRK, LABEL, BOOLERR, BLANK/MULBLANK, date/time format
  * detection via XF -> FORMAT (builtin ids + token scan of custom formats).
  */
object XlsReader {

  private val ExcelEpoch = LocalDate.of(1899, 12, 30)

  /** BIFF error codes -> display text (sanitize_sheet renders via xlrd's
    * error_text_from_code, io.py:1008). */
  private val errorText = Map(
    0x00 -> "#NULL!", 0x07 -> "#DIV/0!", 0x0F -> "#VALUE!", 0x17 -> "#REF!",
    0x1D -> "#NAME?", 0x24 -> "#NUM!", 0x2A -> "#N/A")

  def read(spark: SparkSession, path: String, sheet: Int = 0,
           sanitize: Boolean = true): DataFrame = {
    val grid = readGrid(Files.readAllBytes(Paths.get(path)), sheet)
      .filter(_.exists(_.trim.nonEmpty))
    require(grid.nonEmpty, s"no rows in $path sheet $sheet")
    // reference get_header drops blank names (io.py:1028-1033)
    val keep = grid.head.zipWithIndex.collect { case (h, i) if h.trim.nonEmpty => i }
    val rawNames = keep.map(i => grid.head(i).trim)
    val names = if (sanitize) Headers.sanitize(rawNames) else Headers.dedupe(rawNames)
    val body = grid.tail.map(r => keep.map(i => if (i < r.length) r(i) else ""))
    ReadersBridge.seqsToDf(spark, body, names)
  }

  // ------------------------------------------------------------- OLE2 layer
  private def readGrid(b: Array[Byte], sheetIdx: Int): Seq[Seq[String]] = {
    require(b.length > 512 &&
      (b(0) & 0xFF) == 0xD0 && (b(1) & 0xFF) == 0xCF, s"not an OLE2 file")
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val ssz = 1 << bb.getShort(30)
    val dirStart = bb.getInt(48)
    val miniCutoff = bb.getInt(56)
    val miniFatStart = bb.getInt(60)

    // FAT sector list: the 109 header DIFAT entries cover files < ~7 MB;
    // beyond that the header points at a chain of DIFAT spill sectors
    // (MS-CFB 2.5: header fields 68 = first DIFAT sector, 72 = count), each
    // holding ssz/4 - 1 FAT sector numbers plus a trailing next-DIFAT
    // pointer.
    val headerDifat = (0 until 109).map(i => bb.getInt(76 + i * 4))
    val difatSpill = {
      val nDifat = bb.getInt(72)
      val out = mutable.ArrayBuffer[Int]()
      var ds = bb.getInt(68)
      var seen = 0
      while (ds >= 0 && seen <= math.max(nDifat, 0)) {
        val base = 512 + ds * ssz
        require(base + ssz <= b.length, s"DIFAT sector $ds out of bounds")
        (0 until ssz / 4 - 1).foreach(i => out += bb.getInt(base + i * 4))
        ds = bb.getInt(base + ssz - 4)
        seen += 1
      }
      out.toSeq
    }
    val fatSectors = (headerDifat ++ difatSpill).filter(_ >= 0)
    val fat = fatSectors.flatMap { fs =>
      (0 until ssz / 4).map(i => bb.getInt(512 + fs * ssz + i * 4))
    }.toArray

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer[Int]()
      var s = start
      while (s >= 0 && out.length <= fat.length) { out += s; s = fat(s) }
      out.toSeq
    }
    def stream(start: Int, size: Int): Array[Byte] = {
      val out = new mutable.ArrayBuilder.ofByte
      chain(start).foreach(s => out ++= b.slice(512 + s * ssz, 512 + (s + 1) * ssz))
      out.result().take(size)
    }

    // directory entries
    final case class Entry(name: String, start: Int, size: Int)
    val entries = chain(dirStart).flatMap { ds =>
      (0 until ssz / 128).map { i =>
        val off = 512 + ds * ssz + i * 128
        val nlen = bb.getShort(off + 64) & 0xFFFF
        val name = if (nlen >= 2)
          new String(b.slice(off, off + nlen - 2), "UTF-16LE") else ""
        Entry(name, bb.getInt(off + 116), bb.getInt(off + 120))
      }
    }
    val root = entries.head
    val wbEntry = entries.find(e => e.name == "Workbook" || e.name == "Book")
      .getOrElse(throw new IllegalArgumentException("no Workbook stream"))

    val wb: Array[Byte] =
      if (wbEntry.size >= miniCutoff) stream(wbEntry.start, wbEntry.size)
      else {
        // ministream: chained in 64-byte sectors inside the root stream
        val mini = stream(root.start, root.size)
        val miniFat = chain(miniFatStart).flatMap { fs =>
          (0 until ssz / 4).map(i => bb.getInt(512 + fs * ssz + i * 4))
        }.toArray
        val out = new mutable.ArrayBuilder.ofByte
        var s = wbEntry.start
        while (s >= 0) { out ++= mini.slice(s * 64, (s + 1) * 64); s = miniFat(s) }
        out.result().take(wbEntry.size)
      }
    parseBiff(wb, sheetIdx)
  }

  // ------------------------------------------------------------- BIFF8 layer
  private def parseBiff(wb: Array[Byte], sheetIdx: Int): Seq[Seq[String]] = {
    val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    val sheetOffsets = mutable.ArrayBuffer[Int]()
    val formats = mutable.Map[Int, String]()
    val xfToFmt = mutable.ArrayBuffer[Int]()
    val sst = mutable.ArrayBuffer[String]()

    // ---- globals substream
    var inGlobals = true
    while (inGlobals && pos + 4 <= wb.length) {
      val rt = bb.getShort(pos) & 0xFFFF
      val rl = bb.getShort(pos + 2) & 0xFFFF
      val d = pos + 4
      rt match {
        case 0x0085 => sheetOffsets += bb.getInt(d) // BOUNDSHEET
        case 0x041E => // FORMAT
          val fid = bb.getShort(d) & 0xFFFF
          formats(fid) = readUnicodeString(wb, bb, d + 2)._1
        case 0x00E0 => xfToFmt += (bb.getShort(d + 2) & 0xFFFF) // XF
        case 0x00FC => // SST, with CONTINUE-record spill (io.py:1033-1118
          // capability via xlrd; BIFF8 strings may split mid-characters at a
          // record boundary, where a fresh option-flags byte is written)
          val unique = bb.getInt(d + 4)
          val segs = mutable.ArrayBuffer[(Int, Int)]((d + 8, rl - 8))
          var q = d + rl
          while (q + 4 <= wb.length && (bb.getShort(q) & 0xFFFF) == 0x003C) {
            val qlen = bb.getShort(q + 2) & 0xFFFF
            segs += ((q + 4, qlen)); q += 4 + qlen
          }
          val rd = new BiffSegReader(wb, segs.toSeq)
          var k = 0
          while (k < unique && rd.hasMore) { sst += rd.readString(); k += 1 }
        case 0x000A => inGlobals = false // EOF of globals
        case _ => ()
      }
      pos = d + rl
    }

    require(sheetIdx < sheetOffsets.length, s"no sheet $sheetIdx")
    val isDateFmt = (xf: Int) => {
      val fid = if (xf < xfToFmt.length) xfToFmt(xf) else 0
      (fid >= 14 && fid <= 22) || (fid >= 45 && fid <= 47) ||
        formats.get(fid).exists { f =>
          val bare = f.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
            .replaceAll("\\\\.", "")
          bare.exists(c => "ymdhs".contains(c.toLower))
        }
    }

    // ---- sheet substream
    val cells = mutable.Map[(Int, Int), String]()
    def put(r: Int, c: Int, xf: Int, num: Double): Unit =
      cells((r, c)) = renderNumber(num, isDateFmt(xf))
    var p = sheetOffsets(sheetIdx)
    var done = false
    while (!done && p + 4 <= wb.length) {
      val rt = bb.getShort(p) & 0xFFFF
      val rl = bb.getShort(p + 2) & 0xFFFF
      val d = p + 4
      rt match {
        case 0x00FD => // LABELSST
          cells((bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF)) =
            sst(bb.getInt(d + 6))
        case 0x0203 => // NUMBER
          put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF,
            bb.getShort(d + 4) & 0xFFFF, bb.getDouble(d + 6))
        case 0x027E => // RK
          put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF,
            bb.getShort(d + 4) & 0xFFFF, decodeRk(bb.getInt(d + 6)))
        case 0x00BD => // MULRK
          val row = bb.getShort(d) & 0xFFFF
          val colFirst = bb.getShort(d + 2) & 0xFFFF
          val n = (rl - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i, bb.getShort(d + 4 + i * 6) & 0xFFFF,
              decodeRk(bb.getInt(d + 6 + i * 6)))
          }
        case 0x0204 => // LABEL (inline string)
          cells((bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF)) =
            readUnicodeString(wb, bb, d + 6, len16 = true)._1
        case 0x0205 => // BOOLERR
          val v = wb(d + 6) & 0xFF
          val isErr = (wb(d + 7) & 0xFF) == 1
          cells((bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF)) =
            if (isErr) errorText.getOrElse(v, s"#ERR$v")
            else (if (v != 0) "True" else "False")
        case 0x000A => done = true
        case _ => ()
      }
      p = d + rl
    }
    if (cells.isEmpty) return Seq.empty
    val maxR = cells.keys.map(_._1).max
    val maxC = cells.keys.map(_._2).max
    (0 to maxR).map(r => (0 to maxC).map(c => cells.getOrElse((r, c), "")))
  }

  /** Cursor over a BIFF record's data split across CONTINUE records. Reads
    * scalars/skips byte-wise across segment boundaries; character data that
    * spans a boundary re-reads the option-flags byte the continuation
    * record starts with (the compression flag may change mid-string —
    * MS-XLS 2.5.293, xlrd book.py unpack_SST behavior).
    */
  private final class BiffSegReader(wb: Array[Byte], segs: Seq[(Int, Int)]) {
    private var si = 0
    private var off = 0
    private def base = segs(si)._1
    private def len = segs(si)._2
    private def ensure(): Unit = { while (si < segs.length && off >= len) { si += 1; off = 0 } }
    private def ensureHasMore(): Unit = {
      ensure()
      if (si >= segs.length) throw new IllegalArgumentException(
        "truncated SST/CONTINUE data: read past the last of " +
          s"${segs.length} record segments (corrupt string/rich-run/phonetic lengths?)")
    }
    def hasMore: Boolean = { ensure(); si < segs.length }
    def readU8(): Int = { ensureHasMore(); val v = wb(base + off) & 0xFF; off += 1; v }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readU32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = {
      var k = n
      while (k > 0) { ensureHasMore(); val t = math.min(k, len - off); off += t; k -= t }
    }
    private def readChars(n: Int, wideInit: Boolean): String = {
      val sb = new java.lang.StringBuilder(n)
      var wide = wideInit
      var rem = n
      while (rem > 0) {
        if (off >= len) { // boundary mid-char-data: continuation flags byte
          ensure()
          wide = (readU8() & 1) != 0
        }
        val avail = (len - off) / (if (wide) 2 else 1)
        val take = math.min(rem, math.max(avail, 0))
        if (take > 0) {
          if (wide) { sb.append(new String(wb, base + off, take * 2, "UTF-16LE")); off += take * 2 }
          else { sb.append(new String(wb, base + off, take, "ISO-8859-1")); off += take }
          rem -= take
        } else off = len // defensive: odd trailing byte before a wide char
      }
      sb.toString
    }
    def readString(): String = {
      val n = readU16()
      val opts = readU8()
      val rich = if ((opts & 0x08) != 0) readU16() else 0
      val phon = if ((opts & 0x04) != 0) readU32() else 0
      val s = readChars(n, (opts & 0x01) != 0)
      skip(rich * 4 + phon)
      s
    }
  }

  /** BIFF8 unicode string: u8 or u16 length, option flags, optional
    * richtext/phonetic blocks, compressed (latin1) or UTF-16LE payload. */
  private def readUnicodeString(wb: Array[Byte], bb: ByteBuffer, at: Int,
                                len16: Boolean = true): (String, Int) = {
    var p = at
    val n = if (len16) { val v = bb.getShort(p) & 0xFFFF; p += 2; v }
      else { val v = wb(p) & 0xFF; p += 1; v }
    val opts = wb(p) & 0xFF; p += 1
    val rich = if ((opts & 0x08) != 0) { val v = bb.getShort(p) & 0xFFFF; p += 2; v } else 0
    val phon = if ((opts & 0x04) != 0) { val v = bb.getInt(p); p += 4; v } else 0
    val s = if ((opts & 0x01) != 0) {
      val out = new String(wb.slice(p, p + 2 * n), "UTF-16LE"); p += 2 * n; out
    } else {
      val out = new String(wb.slice(p, p + n), "ISO-8859-1"); p += n; out
    }
    (s, p + rich * 4 + phon)
  }

  private def decodeRk(rk: Int): Double = {
    val div = if ((rk & 1) != 0) 100.0 else 1.0
    if ((rk & 2) != 0) (rk >> 2) / div
    else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32) / div
  }

  /** sanitize_sheet's cell-type switch (io.py:1002-1022). */
  private def renderNumber(v: Double, dateFmt: Boolean): String =
    if (dateFmt) {
      if (v < 1) { // time-of-day fraction
        val secs = math.round(v * 86400).toInt
        f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d"
      } else ExcelEpoch.plusDays(v.toLong).toString // date (reference's
      // is_integer bug: fractional serials also land here)
    } else if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
      s"${v.toLong}.0" // Python str(float) for integral values
    else v.toString
}

/** Access to Readers' private DataFrame builder. */
private[sources] object ReadersBridge {
  def seqsToDf(spark: SparkSession, rows: Seq[Seq[String]], names: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), numSlices = 1), schema)
  }
}
