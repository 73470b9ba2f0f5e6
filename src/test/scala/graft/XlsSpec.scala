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
}
