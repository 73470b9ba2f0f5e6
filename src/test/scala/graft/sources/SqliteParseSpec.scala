package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Rowid-alias detection rules (sqlite.org/lang_createtable.html#rowid):
  * column-level INTEGER PRIMARY KEY is an alias unless declared DESC;
  * a single-column table-level PRIMARY KEY(col) aliases iff the named
  * column's declared type is exactly INTEGER (sort order irrelevant there).
  */
class SqliteParseSpec extends AnyFunSuite {

  private def alias(sql: String): Int = SqliteReader.parseColumns(sql)._2
  private def names(sql: String): Seq[String] = SqliteReader.parseColumns(sql)._1

  test("column-level INTEGER PRIMARY KEY is a rowid alias") {
    assert(alias("CREATE TABLE t(x INTEGER PRIMARY KEY, y TEXT)") == 0)
    assert(alias("CREATE TABLE t(y TEXT, x INTEGER PRIMARY KEY AUTOINCREMENT)") == 1)
    // non-adjacent constraints still alias: declared type is INTEGER + col-level PK
    assert(alias("CREATE TABLE t(x INTEGER NOT NULL PRIMARY KEY, y TEXT)") == 0)
    assert(alias("CREATE TABLE t(x INTEGER PRIMARY KEY ASC, y TEXT)") == 0)
  }

  test("column-level INTEGER PRIMARY KEY DESC is NOT an alias") {
    assert(alias("CREATE TABLE t(x INTEGER PRIMARY KEY DESC, y TEXT)") == -1)
  }

  test("single-column table-level PRIMARY KEY(col) on an INTEGER column aliases") {
    assert(alias("CREATE TABLE t(x INTEGER, y TEXT, PRIMARY KEY(x))") == 0)
    // table-level sort order does not matter — DESC still aliases here
    assert(alias("CREATE TABLE t(x INTEGER, y TEXT, PRIMARY KEY(x DESC))") == 0)
    assert(alias("CREATE TABLE t(y TEXT, x INTEGER, CONSTRAINT pk PRIMARY KEY(x))") == 1)
    assert(alias("CREATE TABLE t(\"my col\" INTEGER, PRIMARY KEY(\"my col\"))") == 0)
  }

  test("table-level PK does not alias for non-INTEGER types or multi-column keys") {
    // INT is not INTEGER — sqlite requires the exact type name for the alias
    assert(alias("CREATE TABLE t(x INT, y TEXT, PRIMARY KEY(x))") == -1)
    assert(alias("CREATE TABLE t(x VARCHAR(10), PRIMARY KEY(x))") == -1)
    assert(alias("CREATE TABLE t(a INTEGER, b INTEGER, PRIMARY KEY(a, b))") == -1)
  }

  test("constraint defs are excluded from column names either way") {
    assert(names("CREATE TABLE t(a INTEGER, b TEXT, PRIMARY KEY(a), UNIQUE(b))") ==
      Seq("a", "b"))
  }
}

/** MSysObjects rows can carry NULL Flags/Id (rendered "" by crackRow);
  * the catalog walk must tolerate them instead of aborting the read. */
class MdbCatalogSpec extends AnyFunSuite {
  test("NULL or garbled Flags parses as no-flags") {
    assert(MdbReader.catalogFlags("") == 0L)
    assert(MdbReader.catalogFlags(null) == 0L)
    assert(MdbReader.catalogFlags("junk") == 0L)
    assert(MdbReader.catalogFlags("-2147483646") == -2147483646L)
  }
  test("NULL Id skips the row instead of throwing") {
    assert(MdbReader.catalogId("") == None)
    assert(MdbReader.catalogId(null) == None)
    assert(MdbReader.catalogId("42") == Some(42))
  }
}
