package graft

import org.apache.spark.sql.functions._

import graft.operators.Ops
import graft.sources.{Readers, Writers}
import graft.types.DetectTypes

/** The reference's canonical E1 pipeline end-to-end (README.rst:93-133,
  * SURVEY §3): read csv -> detect types -> cast -> transform -> write ->
  * re-read. Everything through the public API.
  */
class PipelineE2ESpec extends SparkSpec {

  test("read -> infer -> cast -> cut/filter/group -> write -> re-read") {
    // read: all-string frame from the iris-shaped fixture
    val raw = Readers.csv(spark, "src/test/resources/fixtures/iris.csv")
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))

    // infer + cast: 4 float columns + 1 text
    val (typed, report) = DetectTypes.inferAndCast(raw)
    val types = report.types.map(t => t.id -> t.mezaType).toMap
    assert(types("sepal_length") == "float" && types("species") == "text")
    assert(report.accurate)

    // transform: tfilter -> cut -> groupAgg -> sort (all reference ops)
    val out = Ops.sortBy(
      Ops.groupAgg(
        Ops.cut(
          Ops.tfilter(typed, "sepal_length", _ > 5.0),
          Seq("species", "sepal_length", "petal_length")),
        Seq("species"),
        Seq("n" -> ("count", "sepal_length"),
          "avg_petal" -> ("mean", "petal_length"))),
      Seq("species"))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 3)

    // write csv and re-read: same values round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString + "/out"
    Writers.csv(out, dir)
    val back = spark.read.option("header", true).csv(dir)
      .select(col("species"), col("n").cast("long"),
        col("avg_petal").cast("double"))
    val a = rows.map(r => (r.getString(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e9))).toSet
    val b = back.collect().map(r => (r.getString(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e9))).toSet
    assert(a == b)
  }
}
