package graft

import graft.types.{DetectTypes, MezaType}

/** Inference parity with the reference's detect_types (meza/process.py:263-358),
  * verified against the running reference: the canonical 8-type record
  * converges in 17 rows at the default (0.95, hweight=6) with every field
  * typed by its values.
  */
class DetectTypesSpec extends SparkSpec {
  import spark.implicits._

  private val canonical = (
    "None", "false", "1", "1.5", "Iñtërnâtiônàližætiøn", "5/4/82", "2:30", "5/4/82 2pm")

  private def canonicalDf(n: Int) =
    Seq.fill(n)(canonical).toDF(
      "null", "bool", "int", "float", "text", "date", "time", "datetime")

  test("canonical record: every field typed by value, converges at 17 rows") {
    val r = DetectTypes.detect(canonicalDf(100))
    val types = r.types.map(t => t.id -> t.mezaType).toMap
    assert(types == Map(
      "null" -> "null", "bool" -> "bool", "int" -> "int", "float" -> "float",
      "text" -> "text", "date" -> "date", "time" -> "time", "datetime" -> "datetime"))
    assert(r.count == 17, s"expected 17 rows consumed, got ${r.count}")
    assert(r.confidence == 0.95)
    assert(r.accurate)
  }

  test("hweight drives the confidence curve (process.py docstring table)") {
    // reference: (0.9, hweight=3) -> 23 rows; (0.9, 4) -> 10; (0.9, 5) -> 6
    assert(DetectTypes.detect(canonicalDf(100), minConf = 0.9, hweight = 3).count == 23)
    assert(DetectTypes.detect(canonicalDf(100), minConf = 0.9, hweight = 4).count == 10)
    assert(DetectTypes.detect(canonicalDf(100), minConf = 0.9, hweight = 5).count == 6)
    assert(DetectTypes.detect(canonicalDf(100), minConf = 0.95, hweight = 7).count == 11)
  }

  test("max_iter caps consumption when confidence stalls") {
    val r = DetectTypes.detect(canonicalDf(100), minConf = 0.99, maxIter = 50)
    assert(r.count == 50)
    assert(!r.accurate)
  }

  test("compatible-type merge lattice (process.py:237-256)") {
    assert(MezaType.merge(Set("float", "int")) == "float")
    assert(MezaType.merge(Set("date", "time", "datetime")) == "datetime")
    assert(MezaType.merge(Set("date", "time")) == "datetime")
    assert(MezaType.merge(Set("bool", "int")) == "int")
    assert(MezaType.merge(Set("null", "bool")) == "bool")
    assert(MezaType.merge(Set("float", "time")) == "text")
    assert(MezaType.merge(Set("int", "text")) == "text")
    assert(MezaType.merge(Set("null")) == "null")
  }

  test("mixed int/float column merges to float") {
    // high minConf so the sample is fully consumed (the merged type's own
    // tally is low, keeping confidence under threshold — reference behavior)
    val df = Seq(("1", "x"), ("2.5", "y"), ("3", "z")).toDF("v", "s")
    val types = DetectTypes.detect(df, minConf = 0.95).types.map(t => t.id -> t.mezaType).toMap
    assert(types("v") == "float")
    assert(types("s") == "text")
  }

  test("typeCast produces typed columns with lenient semantics (process.py:39-115)") {
    val df = Seq(
      ("10", "1.5", "false", "5/4/82", "2:30", "None"),
      ("$2,000", "spam", "y", "2/32/82", "14:15:00", "na"))
      .toDF("i", "f", "b", "d", "t", "n")
    val types = Seq(
      DetectTypes.FieldType("i", "int"), DetectTypes.FieldType("f", "float"),
      DetectTypes.FieldType("b", "bool"), DetectTypes.FieldType("d", "date"),
      DetectTypes.FieldType("t", "time"), DetectTypes.FieldType("n", "null"))
    val out = DetectTypes.typeCast(df, types)
    import org.apache.spark.sql.types._
    assert(out.schema("i").dataType == LongType)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("b").dataType == BooleanType)
    assert(out.schema("d").dataType == DateType)
    assert(out.schema("t").dataType == StringType)
    val rows = out.orderBy("i").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 2000L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 0.0))
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(false, true))
    assert(rows.map(_.getDate(3).toString).toSeq == Seq("1982-05-04", "1982-02-28"))
    assert(rows.map(_.getString(4)).toSeq == Seq("02:30:00", "14:15:00"))
    assert(rows.forall(_.isNullAt(5)))
  }

  test("detect + cast end-to-end on an all-string frame (E1 pipeline)") {
    val df = Seq(
      ("a", "1", "2024-01-05", "9.99"),
      ("b", "2", "2024-02-06", "12.50"),
      ("c", "3", "2024-03-07", "0.25")).toDF("name", "qty", "day", "price")
    val (cast, r) = DetectTypes.inferAndCast(df, minConf = 0.5)
    val types = r.types.map(t => t.id -> t.mezaType).toMap
    assert(types == Map("name" -> "text", "qty" -> "int", "day" -> "date", "price" -> "float"))
    import org.apache.spark.sql.types._
    assert(cast.schema("qty").dataType == LongType)
    assert(cast.schema("day").dataType == DateType)
    assert(cast.schema("price").dataType == DoubleType)
    assert(cast.count() == 3)
  }
}
