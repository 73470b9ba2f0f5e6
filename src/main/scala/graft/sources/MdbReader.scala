package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S9 read_mdb (meza/io.py:598-674) as a NATIVE reader for Jet4 (Access
  * 2000-2003) files — the reference shells out to mdbtools' mdb-export; the
  * on-disk format those tools parse is public (mdbtools HACKING notes).
  * What we read: 4 KB pages; the system catalog MSysObjects (table
  * definition always at page 2) for table names; per-table TDEF pages
  * (25-byte column entries: type, column number, variable-column index,
  * fixed offset, length; then UCS-2 names); data pages located by their
  * owning-TDEF back-pointer; rows cracked via the trailing null bitmap,
  * variable-offset table, and fixed-column offsets, including rows written
  * under an older schema (extra trailing columns from since-deleted fields
  * are ignored — the fixture's rows carry 4 of those). Text is UCS-2 with
  * Jet's 0xFFFE "compressed" marker (0x00 bytes toggle 1-byte/2-byte mode);
  * memos ride LVAL pages (inline / single-page / chained).
  *
  * Values render as the strings mdb-export emits (the reference pipes its
  * CSV): ints plain, datetimes as MM/dd/yy HH:mm:ss from the 1899-12-30
  * double-serial epoch (negative serials = pre-1900 dates, e.g. the
  * fixture's 1660 livery records), NULLs as empty strings. Driver-side
  * eager parse like dbf/xls/sqlite — legacy interchange scale. Jet3
  * (Access 97, 2 KB pages, byte-sized row internals) is rejected with a
  * clear error; the reference's mdbtools path reads it, we document the
  * divergence.
  */
object MdbReader {

  private val PS = 4096
  private val Epoch = LocalDateTime.of(1899, 12, 30, 0, 0, 0)
  private val DateFmt = DateTimeFormatter.ofPattern("MM/dd/yy HH:mm:ss")

  private final case class Col(name: String, ty: Int, num: Int, varIdx: Int,
      fixOff: Int, len: Int, fixed: Boolean)

  def read(spark: SparkSession, path: String, table: Option[String] = None,
           sanitize: Boolean = false): DataFrame = {
    val db = new Jet4(Files.readAllBytes(Paths.get(path)))
    val tables = db.userTables
    require(tables.nonEmpty, s"no user tables in $path")
    val (name, tdefPg) = table.flatMap(t => tables.find(_._1 == t)).getOrElse(tables.head)
    val cols = db.tdefColumns(tdefPg)
    val rows = db.tableRows(tdefPg, cols).map(Row.fromSeq)
    val rawNames = cols.map(_.name)
    val names = if (sanitize) Headers.sanitize(rawNames) else Headers.dedupe(rawNames)
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 1), schema)
  }

  /** Table names in catalog order (mdb-tables equivalent). */
  def tableNames(path: String): Seq[String] =
    new Jet4(Files.readAllBytes(Paths.get(path))).userTables.map(_._1)

  /** MSysObjects.Flags rendered value → flag bits. Catalog values render
    * NULL as "" (crackRow); a NULL/garbled Flags means "no flags" rather
    * than a NumberFormatException that aborts the whole read. */
  private[sources] def catalogFlags(s: String): Long =
    Option(s).flatMap(_.toLongOption).getOrElse(0L)

  /** MSysObjects.Id rendered value → tdef page id; a row with a NULL Id
    * cannot point at a tdef page, so it is skipped (None) instead of thrown. */
  private[sources] def catalogId(s: String): Option[Int] =
    Option(s).flatMap(_.toIntOption)

  // ======================================================== Jet4 file layer
  private final class Jet4(b: Array[Byte]) {
    require(b.length >= PS &&
      new String(b.slice(4, 19), "ASCII") == "Standard Jet DB", "not an Access .mdb file")
    // documented divergence from the reference (io.py:598-674 reads anything
    // mdb-export handles): Jet3's 2 KB pages / different row format are not
    // implemented — fail with the workaround, not a garbled parse
    require((b(0x14) & 0xFF) >= 0x01,
      "Jet3 (Access 97) .mdb is not supported by the native reader: " +
        "convert the file to Jet4 (Access 2000+) with `mdb-export` or a " +
        "one-time Access save-as, then re-read")
    private val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)

    private def u16(o: Int): Int = bb.getShort(o) & 0xFFFF
    private def u32(o: Int): Int = bb.getInt(o)
    private def nPages: Int = b.length / PS

    /** (name, tdefPage) of user tables: MSysObjects rows with Type=1,
      * no system flags, name not MSys*/
    def userTables: Seq[(String, Int)] = {
      val catCols = tdefColumns(2)
      val byName = catCols.map(c => c.name -> catCols.indexOf(c)).toMap
      tableRows(2, catCols).flatMap { r =>
        val name = r(byName("Name"))
        val ty = r(byName("Type"))
        // catalog values render NULL as "" — a NULL Flags means "no flags",
        // and a row with no Id cannot point at a tdef page, so skip it rather
        // than aborting the whole read on NumberFormatException
        val flags = MdbReader.catalogFlags(r(byName("Flags")))
        val id = MdbReader.catalogId(r(byName("Id")))
        if (ty == "1" && name != null && name.nonEmpty &&
          !name.startsWith("MSys") && !name.startsWith("~") &&
          (flags & 0x80000002L) == 0L && id.isDefined)
          Some(name -> (id.get & 0x00FFFFFF))
        else None
      }
    }

    /** Column entries of a table-definition page, in column-number order. */
    def tdefColumns(tdefPg: Int): Seq[Col] = {
      val o = tdefPg * PS
      require((b(o) & 0xFF) == 0x02, s"page $tdefPg is not a table definition")
      val numRealIdxs = u32(o + 0x33)
      val numCols = u16(o + 0x2D)
      val colsStart = o + 0x3F + numRealIdxs * 12
      val entries = (0 until numCols).map { i =>
        val e = colsStart + 25 * i
        Col(name = null, ty = b(e) & 0xFF, num = u16(e + 5), varIdx = u16(e + 7),
          fixOff = u16(e + 21), len = u16(e + 23), fixed = (b(e + 15) & 0x01) != 0)
      }
      var p = colsStart + 25 * numCols
      val named = entries.map { c =>
        val n = u16(p); p += 2
        val name = new String(b, p, n, "UTF-16LE"); p += n
        c.copy(name = name)
      }
      named.sortBy(_.num)
    }

    /** All rows of the table as rendered string values (null -> ""). */
    def tableRows(tdefPg: Int, cols: Seq[Col]): Seq[Seq[String]] = {
      val out = mutable.ArrayBuffer[Seq[String]]()
      (0 until nPages).foreach { p =>
        val o = p * PS
        if ((b(o) & 0xFF) == 0x01 && u32(o + 4) == tdefPg)
          crackPage(p, cols, out)
      }
      out.toSeq
    }

    private def rowBounds(pg: Int, i: Int): (Int, Int, Int) = {
      val o = pg * PS
      val off = u16(o + 0x0E + 2 * i)
      val start = off & 0x1FFF
      val end = if (i == 0) PS else (u16(o + 0x0E + 2 * (i - 1)) & 0x1FFF)
      (off, o + start, o + end)
    }

    private def crackPage(pg: Int, cols: Seq[Col], out: mutable.ArrayBuffer[Seq[String]]): Unit = {
      val o = pg * PS
      val n = u16(o + 0x0C)
      (0 until n).foreach { i =>
        val (off, start, end) = rowBounds(pg, i)
        // 0x8000 = deleted; 0x4000 = a 4-byte forward-pointer stub for a
        // row relocated to another data page. We scan EVERY data page of
        // the table, so the relocated row is picked up where it actually
        // lives — following the stub as well would emit it twice.
        if ((off & 0xC000) == 0) out += crackRow(start, end, cols)
      }
    }

    private def crackRow(start: Int, end: Int, cols: Seq[Col]): Seq[String] = {
      val rowCols = u16(start)
      val maskSz = (rowCols + 7) / 8
      def notNull(colNum: Int): Boolean =
        colNum < rowCols && ((b(end - maskSz + colNum / 8) >> (colNum % 8)) & 1) != 0
      val nVar = u16(end - maskSz - 2)
      // variable-offset table: (nVar+1) u16 stored reversed before the count
      val varBase = end - maskSz - 2
      def varOff(k: Int): Int = u16(varBase - 2 * (k + 1))
      cols.map { c =>
        if (c.ty == 0x01) { if (notNull(c.num)) "1" else "0" } // bool lives in the mask
        else if (!notNull(c.num)) "" // mdb-export renders NULL as empty
        else if (c.fixed) render(c, start + 2 + c.fixOff, c.len)
        else if (c.varIdx >= nVar) "" // column added after this row was written
        else {
          val vs = start + varOff(c.varIdx)
          val ve = start + varOff(c.varIdx + 1)
          if (c.ty == 0x0C) memo(vs, ve - vs) else render(c, vs, ve - vs)
        }
      }
    }

    private def render(c: Col, at: Int, len: Int): String = c.ty match {
      case 0x02 => (b(at) & 0xFF).toString
      case 0x03 => bb.getShort(at).toString
      case 0x04 => bb.getInt(at).toString
      case 0x05 => java.math.BigDecimal.valueOf(bb.getLong(at), 4).toPlainString
      case 0x06 => bb.getFloat(at).toString
      case 0x07 => bb.getDouble(at).toString
      case 0x08 =>
        val v = bb.getDouble(at)
        val days = v.toLong // trunc toward zero; time = |fraction|
        val secs = math.round(math.abs(v - days) * 86400)
        Epoch.plusDays(days).plusSeconds(secs).format(DateFmt)
      case 0x0A => decodeText(at, len)
      case _ => b.slice(at, at + len).map("%02x".format(_)).mkString
    }

    private def decodeText(at: Int, len: Int): String =
      MdbReader.decodeText(b.slice(at, at + len))

    /** Memo column: 12-byte descriptor (len+mode, LVAL pointer), payload
      * inline, in one LVAL page row, or chained across LVAL pages. */
    private def memo(at: Int, len: Int): String = {
      if (len < 12) return ""
      val head = u32(at)
      val memoLen = head & 0x3FFFFFFF
      if ((head & 0x80000000) != 0) decodeText(at + 12, len - 12) // inline
      else {
        val single = (head & 0x40000000) != 0
        val bytes = new mutable.ArrayBuilder.ofByte
        var ptr = u32(at + 4)
        var remaining = memoLen
        var hops = 0
        while (ptr != 0 && remaining > 0 && hops < nPages) {
          val pg = ptr & 0x00FFFFFF
          val row = (ptr >>> 24) & 0xFF
          if (pg <= 0 || pg >= nPages) return ""
          val (off, rs, re) = rowBounds(pg, row)
          if ((off & 0xC000) != 0) return ""
          val (dataStart, next) =
            if (single) (rs, 0)
            else (rs + 4, u32(rs)) // chained: leading next-pointer
          val take = math.min(re - dataStart, remaining)
          bytes ++= b.slice(dataStart, dataStart + take)
          remaining -= take
          ptr = next
          hops += 1
        }
        MdbReader.decodeText(bytes.result())
      }
    }
  }

  /** Jet4 text: 0xFFFE marker = "compressed" UCS-2 where bytes are single
    * latin chars and any 0x00 byte toggles compressed/plain-UCS-2LE mode
    * (mdbtools unicode.c decompress_unicode loop, matched exactly). */
  private def decodeText(bytes: Array[Byte]): String = {
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE) {
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 2; var comp = true
      while (i < bytes.length) {
        if (bytes(i) == 0) { comp = !comp; i += 1 }
        else if (comp) { sb.append((bytes(i) & 0xFF).toChar); i += 1 }
        else if (i + 1 < bytes.length) { sb.append(new String(bytes, i, 2, "UTF-16LE")); i += 2 }
        else i += 1
      }
      sb.toString
    } else new String(bytes, "UTF-16LE")
  }
}
