package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StringFns
import graft.operators.Ops
import graft.sources.Writers
import graft.types.MezaType

/** Coverage for the smaller SURVEY §2 parity pieces: json_recode, flatten,
  * string sanitation, ordinals, DDL generation, split writers, salted agg.
  */
class ParityFillSpec extends SparkSpec {
  import spark.implicits._

  test("jsonRecode renders dates/timestamps ISO and decimals as doubles (process.py:118-158)") {
    val df = Seq((java.sql.Date.valueOf("1982-05-04"),
      java.sql.Timestamp.valueOf("1982-05-04 14:00:00"), BigDecimal("1.50")))
      .toDF("d", "ts", "dec")
    val out = Ops.jsonRecode(df)
    assert(out.schema.fields.map(_.dataType).toSeq ==
      Seq(StringType, StringType, DoubleType))
    val r = out.head()
    assert(r.getString(0) == "1982-05-04")
    assert(r.getString(1) == "1982-05-04T14:00:00")
    assert(r.getDouble(2) == 1.5)
  }

  test("flatten expands nested structs to parent_child columns (fntools.py:1058-1105)") {
    val df = spark.read.json(Seq(
      """{"a": 1, "nested": {"x": 2, "deep": {"y": 3}}}""").toDS())
    val out = Ops.flatten(df)
    assert(out.columns.toSet == Set("a", "nested_x", "nested_deep_y"))
    val r = out.select("a", "nested_x", "nested_deep_y").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 3L)))
  }

  test("xmlize escapes, mreplace applies ordered literal pairs (fntools.py:347-391,724-752)") {
    val df = Seq("""a<b>&"c"'d'""").toDF("x")
    assert(df.select(StringFns.xmlize(col("x"))).as[String].head() ==
      "a&lt;b&gt;&amp;&quot;c&quot;&apos;d&apos;")
    val df2 = Seq("hello world").toDF("x")
    assert(df2.select(StringFns.mreplace(col("x"),
      Seq("hello" -> "bye", "world" -> "all"))).as[String].head() == "bye all")
  }

  test("addOrdinal: 1st/2nd/3rd/11th/22nd (fntools.py:839-856)") {
    val got = Seq(1, 2, 3, 4, 11, 12, 13, 21, 22, 101).toDF("n")
      .select(StringFns.addOrdinal(col("n"))).as[String].collect().toSeq
    assert(got == Seq("1st", "2nd", "3rd", "4th", "11th", "12th", "13th",
      "21st", "22nd", "101st"))
  }

  test("DDL generation per dialect (fntools.py:73-110)") {
    val fields = Seq("id" -> "int", "name" -> "text", "price" -> "decimal",
      "created" -> "datetime")
    assert(MezaType.createTableSql("t", fields) ==
      "CREATE TABLE t (id integer, name text, price decimal, created timestamp)")
    assert(MezaType.createTableSql("t", fields, "mysql") ==
      "CREATE TABLE t (id INT, name TEXT, price DECIMAL, created DATETIME)")
    assert(MezaType.createTableSql("t", fields, "sqlite") ==
      "CREATE TABLE t (id INT, name TEXT, price REAL, created TEXT)")
  }

  test("splitByKey writes hive-style partitions with bounded files (process.py:937-971)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    val df = Tables.orders(spark, sf0001).limit(300)
    Writers.splitByKey(df, dir, "o_orderstatus", maxRecordsPerFile = Some(50))
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("o_orderstatus="))
    assert(parts.length >= 2, s"expected partition dirs, got ${parts.map(_.getName).toSeq}")
    val back = spark.read.parquet(dir)
    assert(back.count() == 300)
    assert(parts.forall(_.listFiles().count(_.getName.endsWith(".parquet")) >= 1))
  }

  test("saltedGroupAgg equals plain groupAgg on skewed data") {
    val df = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val plain = Ops.groupAgg(df, Seq("k"), Seq(
      "n" -> ("count", "v"), "total" -> ("dsum", "v"), "mx" -> ("max", "v")))
      .orderBy("k").collect().map(_.toSeq)
    val salted = Ops.saltedGroupAgg(df, Seq("k"), Seq(
      "n" -> ("count", "v"), "total" -> ("dsum", "v"), "mx" -> ("max", "v")),
      saltBuckets = 8).orderBy("k").collect().map(_.toSeq)
    assert(plain.toSeq == salted.toSeq)
  }

  test("ctype2ext covers the reference's MIME map (convert.py:47-78)") {
    assert(StringFns.ctype2ext("text/csv") == "csv")
    assert(StringFns.ctype2ext("application/vnd.ms-excel") == "xls")
  }

  test("approx aggregates land within tolerance of exact") {
    val got = graft.queries.Registry.queries("q43_approx_stats")(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("hll_within_10pct"),
        s"HLL estimate out of the 10% envelope for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Boolean]("p50_within_5pct"),
        s"quantile sketch out of the 5% envelope for ${r.getAs[String]("l_returnflag")}")
    }
  }
}
