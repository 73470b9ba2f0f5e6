package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S11 read_sqlite (meza/io.py:725-760) as a NATIVE reader: the SQLite
  * database format is public (sqlite.org/fileformat2.html) and a read-only
  * table scan needs only the table b-tree — 100-byte header, page tree
  * (interior 0x05 / leaf 0x0D), varint record headers with serial types,
  * and overflow-page chains. No JDBC driver required.
  *
  * Mirrors the reference: default table = first entry in sqlite_master;
  * column names from the CREATE TABLE statement; an INTEGER PRIMARY KEY
  * column is a rowid alias (stored NULL, value = rowid). Driver-side eager
  * parse like the other legacy-interchange readers (dbf/xls) — these files
  * are config/fixture scale, never data-plane inputs. Values render as
  * strings for DetectTypes.typeCast, the same split the reference uses.
  */
object SqliteReader {

  def read(spark: SparkSession, path: String, table: Option[String] = None): DataFrame = {
    val b = Files.readAllBytes(Paths.get(path))
    require(b.length >= 512 &&
      new String(b.slice(0, 15), "ASCII") == "SQLite format 3", s"not a SQLite file: $path")
    val pageSize = {
      val v = ((b(16) & 0xFF) << 8) | (b(17) & 0xFF)
      if (v == 1) 65536 else v
    }
    val usable = pageSize - (b(20) & 0xFF)
    val textCharset = ((b(56) & 0xFF) << 24 | (b(57) & 0xFF) << 16 |
      (b(58) & 0xFF) << 8 | (b(59) & 0xFF)) match {
      case 2 => "UTF-16LE"; case 3 => "UTF-16BE"; case _ => "UTF-8"
    }

    def u16(off: Int): Int = ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    def u32(off: Int): Long = ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    def varint(off: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8 && (b(off + i) & 0x80) != 0) { v = (v << 7) | (b(off + i) & 0x7F); i += 1 }
      if (i == 8) ((v << 8) | (b(off + 8) & 0xFF), 9)
      else ((v << 7) | (b(off + i) & 0x7F), i + 1)
    }

    /** Payload bytes of one cell, following the overflow chain if needed. */
    def payload(at: Int, total: Long): Array[Byte] = {
      val maxLocal = usable - 35
      if (total <= maxLocal) return b.slice(at, at + total.toInt)
      val minLocal = (usable - 12) * 32 / 255 - 23
      var local = (minLocal + (total - minLocal) % (usable - 4)).toInt
      if (local > maxLocal) local = minLocal
      val out = new mutable.ArrayBuilder.ofByte
      out ++= b.slice(at, at + local)
      var rem = total - local
      var page = u32(at + local)
      while (page > 0 && rem > 0) {
        val base = ((page - 1) * pageSize).toInt
        val take = math.min(rem, (usable - 4).toLong).toInt
        out ++= b.slice(base + 4, base + 4 + take)
        rem -= take
        page = u32(base)
      }
      out.result()
    }

    /** Walk a table b-tree, emitting (rowid, record payload). */
    def walk(page: Long, emit: (Long, Array[Byte]) => Unit): Unit = {
      val base = ((page - 1) * pageSize).toInt
      val hdr = if (page == 1) base + 100 else base
      val ptype = b(hdr) & 0xFF
      val nCells = u16(hdr + 3)
      val ptrBase = hdr + (if (ptype == 0x02 || ptype == 0x05) 12 else 8)
      ptype match {
        case 0x05 => // interior table page: left children + rightmost pointer
          (0 until nCells).foreach { i =>
            walk(u32(base + u16(ptrBase + 2 * i)), emit)
          }
          walk(u32(hdr + 8), emit)
        case 0x0D => // leaf table page
          (0 until nCells).foreach { i =>
            var p = base + u16(ptrBase + 2 * i)
            val (plen, n1) = varint(p); p += n1
            val (rowid, n2) = varint(p); p += n2
            emit(rowid, payload(p, plen))
          }
        case 0x02 | 0x0A => // index b-tree: how WITHOUT ROWID tables store rows
          throw new IllegalArgumentException(
            "index b-tree page reached: WITHOUT ROWID tables are not supported " +
              "by the native reader (rows live in an index tree, not a table tree)")
        case other =>
          throw new IllegalArgumentException(f"unexpected b-tree page type 0x$other%02x")
      }
    }

    /** Decode a record payload: (serial-typed values, nulls as null). */
    def record(pl: Array[Byte]): Seq[Any] = {
      def pvarint(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8 && (pl(off + i) & 0x80) != 0) { v = (v << 7) | (pl(off + i) & 0x7F); i += 1 }
        if (i == 8) ((v << 8) | (pl(off + 8) & 0xFF), 9)
        else ((v << 7) | (pl(off + i) & 0x7F), i + 1)
      }
      val (hlen, n0) = pvarint(0)
      val serials = mutable.ArrayBuffer[Long]()
      var p = n0
      while (p < hlen) { val (s, n) = pvarint(p); serials += s; p += n }
      var d = hlen.toInt
      def beInt(n: Int): Long = {
        var v = if ((pl(d) & 0x80) != 0) -1L else 0L
        (0 until n).foreach(i => v = (v << 8) | (pl(d + i) & 0xFF))
        d += n; v
      }
      serials.toSeq.map {
        case 0 => null
        case 1 => beInt(1)
        case 2 => beInt(2)
        case 3 => beInt(3)
        case 4 => beInt(4)
        case 5 => beInt(6)
        case 6 => beInt(8)
        case 7 => java.lang.Double.longBitsToDouble(beInt(8))
        case 8 => 0L
        case 9 => 1L
        case s if s >= 13 && s % 2 == 1 =>
          val n = ((s - 13) / 2).toInt
          val v = new String(pl, d, n, textCharset); d += n; v
        case s if s >= 12 =>
          val n = ((s - 12) / 2).toInt
          val v = pl.slice(d, d + n).map("%02x".format(_)).mkString; d += n; v
      }
    }

    // ---- sqlite_master (root = page 1): type, name, tbl_name, rootpage, sql
    final case class Master(name: String, rootpage: Long, sql: String)
    val tables = mutable.ArrayBuffer[Master]()
    walk(1, (_, pl) => {
      val r = record(pl)
      if (r.headOption.contains("table") && !r(1).toString.startsWith("sqlite_"))
        tables += Master(r(1).toString, r(3).asInstanceOf[Long], r(4).toString)
    })
    require(tables.nonEmpty, s"no tables in $path")
    val t = table.flatMap(n => tables.find(_.name == n)).getOrElse(tables.head)

    // ---- column names (and the INTEGER PRIMARY KEY rowid alias, if any)
    // from the CREATE TABLE text, the same source sqlite itself uses
    val (names, rowidAlias) = parseColumns(t.sql)

    val rows = mutable.ArrayBuffer[Row]()
    walk(t.rootpage, (rowid, pl) => {
      val vals = record(pl)
      rows += Row.fromSeq(names.indices.map { i =>
        val v = if (i < vals.length) vals(i) else null
        if (v == null && i == rowidAlias) rowid.toString
        else if (v == null) null
        else v.toString
      })
    })
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, numSlices = 1), schema)
  }

  private val ConstraintKw =
    Set("primary", "unique", "check", "foreign", "constraint", "without")

  /** Column names from a CREATE TABLE statement: the defs between the outer
    * parens, split on depth-0 commas; first token of each def is the name
    * (any quoting style); table-level constraint defs are skipped. Returns
    * (names, index of the INTEGER PRIMARY KEY rowid alias or -1). */
  private[sources] def parseColumns(sql: String): (Seq[String], Int) = {
    val inner = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val defs = mutable.ArrayBuffer[String]()
    var depth = 0; var quote: Int = -1; val cur = new StringBuilder
    inner.foreach { c =>
      if (quote >= 0) { cur += c; if (c == quote.toChar) quote = -1 }
      else c match {
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case '\'' | '"' | '`' => quote = c.toInt; cur += c
        case ',' if depth == 0 => defs += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) defs += cur.toString
    // first token of a def = the column name; quoted names ("..", '..',
    // `..`, [..]) may contain spaces and SQL-standard doubled-delimiter
    // escapes ("a""b" -> a"b, [a]]b] -> a]b); unquoted ones end at
    // whitespace
    def nameAndRest(d: String): (String, String) = d.head match {
      case q @ ('"' | '\'' | '`' | '[') =>
        val close = if (q == '[') ']' else q
        val sb = new StringBuilder
        var i = 1; var done = false
        while (!done && i < d.length) {
          if (d.charAt(i) == close) {
            if (i + 1 < d.length && d.charAt(i + 1) == close) { sb += close; i += 2 }
            else { done = true; i += 1 }
          } else { sb += d.charAt(i); i += 1 }
        }
        (sb.toString, d.substring(math.min(i, d.length)))
      case _ =>
        // an unquoted name ends at whitespace OR '(' — "UNIQUE(b)" with no
        // space is still the UNIQUE keyword, not a column named "UNIQUE(b)"
        val end = d.indexWhere(c => c.isWhitespace || c == '(')
        if (end < 0) (d, "") else (d.substring(0, end), d.substring(end))
    }
    def name(d: String): String = nameAndRest(d)._1
    val (constraintDefs, colDefs) = defs.map(_.trim).filter(_.nonEmpty).partition { d =>
      // constraint defs always start with an UNQUOTED keyword
      !"\"'`[".contains(d.head) && ConstraintKw.contains(name(d).toLowerCase)
    }
    val names = colDefs.map(name).toSeq
    // Rowid-alias rules (sqlite.org/lang_createtable.html#rowid): a column is
    // an alias when declared column-level "INTEGER PRIMARY KEY" — EXCEPT the
    // "INTEGER PRIMARY KEY DESC" form, which is a real stored column — or when
    // a single-column table-level PRIMARY KEY(col) names a column whose
    // declared type is exactly INTEGER (there sort order does NOT matter:
    // PRIMARY KEY(col DESC) still aliases the rowid).
    val columnLevel = colDefs.indexWhere { d =>
      val l = nameAndRest(d)._2.trim.toLowerCase
      l.split("\\s+", 2).headOption.contains("integer") &&
        l.matches("(?s).*\\bprimary\\s+key\\b.*") &&
        !l.matches("(?s).*\\bprimary\\s+key\\s+desc\\b.*")
    }
    val alias =
      if (columnLevel >= 0) columnLevel
      else constraintDefs.map(_.toLowerCase).collectFirst {
        case d if d.matches("(?s)(constraint\\s+\\S+\\s+)?primary\\s+key\\s*\\(.*") =>
          val cols = d.substring(d.indexOf('(') + 1, d.lastIndexOf(')'))
          if (cols.contains(',')) -1
          else {
            val pkName = name(cols.trim)
            val idx = names.indexWhere(_.equalsIgnoreCase(pkName))
            // declared type must be exactly INTEGER for the alias to apply
            val isInt = idx >= 0 && nameAndRest(colDefs(idx))._2.trim
              .split("\\s+", 2).headOption.exists(_.equalsIgnoreCase("integer"))
            if (isInt) idx else -1
          }
      }.getOrElse(-1)
    (names, alias)
  }
}
