package graft

/** Binary .xls reader against the reference's own fixture: the canonical
  * mixed-type sheet (tests/test_io.py:200-224; sanitize_sheet doctest pins
  * row 1 as ['1982-05-04', 'Iñtërnâtiônàližætiøn', '234.0', 'Ādam', ' ']).
  */
class XlsSpec extends SparkSpec {
  private val fixture = "/root/reference/data/test/test.xls"

  test("read_xls parses OLE2+BIFF8 with date/number/string cells") {
    assume(new java.io.File(fixture).exists())
    val df = graft.sources.XlsReader.read(spark, fixture)
    assert(df.columns.toSeq ==
      Seq("some_date", "sparse_data", "some_value", "unicode_test"))
    val rows = df.collect()
    assert(rows.length >= 3)
    val r1 = rows.head
    assert(r1.getString(0) == "1982-05-04")
    assert(r1.getString(1) == "Iñtërnâtiônàližætiøn")
    assert(r1.getString(2) == "234.0")
    assert(r1.getString(3) == "Ādam")
  }

  test("sheet selection reads the second sheet") {
    assume(new java.io.File(fixture).exists())
    val df = graft.sources.XlsReader.read(spark, fixture, sheet = 1)
    assert(df.columns.nonEmpty && df.count() > 0)
  }

  // ------------------------------------------------- SST CONTINUE spill
  // Synthetic BIFF8 workbook whose shared-string table overflows into two
  // CONTINUE records, with strings split mid-characters at both boundaries:
  // one staying compressed, one switching compressed -> wide (the flags
  // byte restarting each continuation), one wide -> wide.
  import java.io.ByteArrayOutputStream
  import java.nio.{ByteBuffer, ByteOrder}

  private def le16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(data.length) ++ data

  /** Compressed (latin1) SST string: cch + flags(0) + bytes. */
  private def cstr(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")

  private def buildSpillXls(): (Array[Byte], String, String, String) = {
    val splitCompressed = "compressed-string-torn-across-the-record-boundary"
    val splitMixed = "ascii-head-" + "Iñtërnâtiônàližætiøn"
    val splitWide = "Ādam-Ādam-Ādam-Ādam"
    val headers = Seq("col_a", "col_b", "col_c", "col_d")
    val fillers = (0 until 700).map(i => f"filler_string_$i%04d")

    // SST payload fragments, assembled into SST + 2 CONTINUE records.
    val r1 = new ByteArrayOutputStream() // SST record data (after 8-byte hdr)
    val c1 = new ByteArrayOutputStream() // CONTINUE 1 data
    val c2 = new ByteArrayOutputStream() // CONTINUE 2 data
    headers.foreach(h => r1.write(cstr(h)))
    fillers.foreach(f => r1.write(cstr(f))) // ~700 × 19 bytes ≈ 13.4 KB? no:
    // 700 × (3 + 18) = 14,700 bytes — well past the 8,224-byte record cap,
    // but we split records OURSELVES, so only the declared split points
    // matter; sizes here just need to exceed one record's worth.
    // ---- string torn at SST|CONTINUE-1 boundary, staying compressed:
    // header + first 10 chars in SST, continuation flags(0) + rest in C1.
    r1.write(le16(splitCompressed.length)); r1.write(0)
    r1.write(splitCompressed.substring(0, 10).getBytes("ISO-8859-1"))
    c1.write(0) // continuation: still compressed
    c1.write(splitCompressed.substring(10).getBytes("ISO-8859-1"))
    // ---- string torn at CONTINUE-1|CONTINUE-2 boundary, compressed -> wide:
    // declared compressed, ascii head in C1; continuation wide in C2.
    c1.write(le16(splitMixed.length)); c1.write(0)
    c1.write("ascii-head-".getBytes("ISO-8859-1"))
    c2.write(1) // continuation: wide
    c2.write("Iñtërnâtiônàližætiøn".getBytes("UTF-16LE"))
    // ---- wide string fully declared wide, torn mid-chars in C2... kept
    // whole here (wide->wide split covered by the mixed case's C2 tail):
    c2.write(le16(splitWide.length)); c2.write(1)
    c2.write(splitWide.getBytes("UTF-16LE"))

    val nStrings = headers.length + fillers.length + 3
    val sstData = le32(nStrings) ++ le32(nStrings) ++ r1.toByteArray
    val sstRecs = rec(0x00FC, sstData) ++ rec(0x003C, c1.toByteArray) ++
      rec(0x003C, c2.toByteArray)

    // globals: BOUNDSHEET + SST(+CONTINUEs) + EOF; sheet offset is absolute.
    val sheetOff = 8 + sstRecs.length + 4 // boundsheet rec + sst + EOF
    val globals = rec(0x0085, le32(sheetOff)) ++ sstRecs ++
      rec(0x000A, Array.empty[Byte])
    // sheet: header row from SST 0..3; row 1 = the three split strings + a
    // filler; EOF.
    def labelSst(r: Int, c: Int, isst: Int): Array[Byte] =
      rec(0x00FD, le16(r) ++ le16(c) ++ le16(0) ++ le32(isst))
    val iSplit = headers.length + fillers.length
    val sheet = (0 until 4).map(c => labelSst(0, c, c)).reduce(_ ++ _) ++
      labelSst(1, 0, iSplit) ++ labelSst(1, 1, iSplit + 1) ++
      labelSst(1, 2, iSplit + 2) ++ labelSst(1, 3, 4) ++
      rec(0x000A, Array.empty[Byte])
    val wb = globals ++ sheet

    // ---- OLE2 wrap: header | FAT (sector 0) | directory (sector 1) |
    // workbook stream (sectors 2..).
    val ssz = 512
    val nWb = (wb.length + ssz - 1) / ssz
    require(2 + nWb <= 128, "fixture exceeds one FAT sector")
    val fat = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    fat.putInt(0xFFFFFFFD) // sector 0: FAT marker
    fat.putInt(0xFFFFFFFE) // sector 1: directory chain end
    (0 until nWb).foreach(i => fat.putInt(if (i == nWb - 1) 0xFFFFFFFE else 3 + i))
    (2 + nWb until 128).foreach(_ => fat.putInt(0xFFFFFFFF))

    val dir = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    def dirEntry(slot: Int, name: String, start: Int, size: Int): Unit = {
      val off = slot * 128
      val nb = name.getBytes("UTF-16LE")
      dir.position(off); dir.put(nb)
      dir.putShort(off + 64, ((name.length + 1) * 2).toShort)
      dir.putInt(off + 116, start); dir.putInt(off + 120, size)
    }
    dirEntry(0, "Root Entry", -2, 0)
    dirEntry(1, "Workbook", 2, wb.length)

    val header = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.putShort(30, 9)        // 512-byte sectors
    header.putInt(48, 1)          // directory start sector
    header.putInt(56, 4096)       // mini-stream cutoff
    header.putInt(60, -2)         // no miniFAT
    header.putInt(76, 0)          // DIFAT[0] -> FAT sector 0
    (1 until 109).foreach(i => header.putInt(76 + i * 4, -1))

    val out = new ByteArrayOutputStream()
    out.write(header.array()); out.write(fat.array()); out.write(dir.array())
    out.write(wb); out.write(new Array[Byte](nWb * ssz - wb.length))
    (out.toByteArray, splitCompressed, splitMixed, splitWide)
  }

  /** OLE2 container whose FAT needs >109 sectors (~7.3 MB): the header DIFAT
    * overflows into one DIFAT spill sector (MS-CFB 2.5). A small workbook
    * plus a large padding stream force the sector count up. Layout:
    * FAT sectors 0..110 | DIFAT spill 111 | dir 112 | workbook | padding. */
  private def buildDifatXls(): Array[Byte] = {
    val ssz = 512
    def label(r: Int, c: Int, s: String): Array[Byte] =
      rec(0x0204, le16(r) ++ le16(c) ++ le16(0) ++ cstr(s))
    val sheetOff = 12 // BOUNDSHEET rec (8) + EOF rec (4)
    val globals = rec(0x0085, le32(sheetOff)) ++ rec(0x000A, Array.empty[Byte])
    val sheet = label(0, 0, "name") ++ label(0, 1, "qty") ++
      label(1, 0, "apple") ++
      rec(0x0203, le16(1) ++ le16(1) ++ le16(0) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(3.0).array()) ++
      rec(0x000A, Array.empty[Byte])
    val wb = globals ++ sheet

    val nFat = 111            // covers 111*128 = 14208 sectors
    val nWb = (wb.length + ssz - 1) / ssz
    val totalSectors = 14200  // > 109*128: forces DIFAT spill
    val difatSector = nFat    // 111
    val dirSector = nFat + 1  // 112
    val wbStart = nFat + 2
    val padStart = wbStart + nWb
    require(totalSectors > 109 * 128 && nFat * 128 >= totalSectors)

    val fat = ByteBuffer.allocate(nFat * ssz).order(ByteOrder.LITTLE_ENDIAN)
    (0 until nFat).foreach(_ => fat.putInt(0xFFFFFFFD))          // FAT sectors
    fat.putInt(0xFFFFFFFC)                                       // DIFAT sector
    fat.putInt(0xFFFFFFFE)                                       // directory
    (0 until nWb).foreach(i =>
      fat.putInt(if (i == nWb - 1) 0xFFFFFFFE else wbStart + i + 1))
    (padStart until totalSectors).foreach(s =>
      fat.putInt(if (s == totalSectors - 1) 0xFFFFFFFE else s + 1))
    while (fat.position() < nFat * ssz) fat.putInt(0xFFFFFFFF)

    val difat = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    difat.putInt(109); difat.putInt(110)        // FAT sectors beyond header 109
    (2 until ssz / 4 - 1).foreach(_ => difat.putInt(0xFFFFFFFF))
    difat.putInt(0xFFFFFFFE)                    // no next DIFAT sector

    val dir = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    def dirEntry(slot: Int, name: String, start: Int, size: Int): Unit = {
      val off = slot * 128
      val nb = name.getBytes("UTF-16LE")
      dir.position(off); dir.put(nb)
      dir.putShort(off + 64, ((name.length + 1) * 2).toShort)
      dir.putInt(off + 116, start); dir.putInt(off + 120, size)
    }
    dirEntry(0, "Root Entry", -2, 0)
    dirEntry(1, "Workbook", wbStart, wb.length)
    dirEntry(2, "Padding", padStart, (totalSectors - padStart) * ssz)

    val header = ByteBuffer.allocate(ssz).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.putShort(30, 9)            // 512-byte sectors
    header.putInt(44, nFat)           // FAT sector count
    header.putInt(48, dirSector)      // directory start
    header.putInt(56, 64)             // mini cutoff below wb size -> regular FAT
    header.putInt(60, -2)             // no miniFAT
    header.putInt(68, difatSector)    // first DIFAT spill sector
    header.putInt(72, 1)              // one DIFAT spill sector
    (0 until 109).foreach(i => header.putInt(76 + i * 4, i)) // FAT 0..108

    val out = new ByteArrayOutputStream()
    out.write(header.array())
    out.write(fat.array())                        // sectors 0..110
    out.write(difat.array())                      // sector 111
    out.write(dir.array())                        // sector 112
    out.write(wb); out.write(new Array[Byte](nWb * ssz - wb.length))
    out.write(new Array[Byte]((totalSectors - padStart) * ssz))
    out.toByteArray
  }

  test("OLE2 DIFAT spill: >7 MB file with 111 FAT sectors parses") {
    val bytes = buildDifatXls()
    // header DIFAT reaches 109 FAT sectors = 109*128 data sectors; the
    // fixture's 14200 sectors (~7.27 MB) are past that, so parsing REQUIRES
    // the DIFAT spill chain
    assert(bytes.length > 512 + 109 * 128 * 512, "fixture must exceed the header-DIFAT reach")
    val f = java.io.File.createTempFile("difat_spill", ".xls")
    try {
      java.nio.file.Files.write(f.toPath, bytes)
      val df = graft.sources.XlsReader.read(spark, f.getAbsolutePath)
      assert(df.columns.toSeq == Seq("name", "qty"))
      val r = df.collect().head
      assert(r.getString(0) == "apple" && r.getString(1) == "3.0")
    } finally f.delete()
  }

  test("SST spanning CONTINUE records parses, incl. mid-string splits") {
    val (bytes, splitCompressed, splitMixed, splitWide) = buildSpillXls()
    assert(bytes.length > 8 * 1024, "fixture must actually spill one record")
    val f = java.io.File.createTempFile("sst_spill", ".xls")
    try {
      java.nio.file.Files.write(f.toPath, bytes)
      val df = graft.sources.XlsReader.read(spark, f.getAbsolutePath)
      assert(df.columns.toSeq == Seq("col_a", "col_b", "col_c", "col_d"))
      val r = df.collect().head
      assert(r.getString(0) == splitCompressed)
      assert(r.getString(1) == splitMixed)
      assert(r.getString(2) == splitWide)
      assert(r.getString(3) == "filler_string_0000")
    } finally f.delete()
  }
}
