package graft

import org.apache.spark.sql.functions._

import graft.operators.Ops
import graft.pipeline.Dedup
import graft.sources.{Readers, Writers}
import graft.types.DetectTypes

/** The reference's canonical E1 pipeline end-to-end (README.rst:93-133,
  * SURVEY §3): read csv -> detect types -> cast -> transform -> write ->
  * re-read. Everything through the public API.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

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

  test("curation chain: normalize -> near-dup pairs -> keep-best retention") {
    // the round-6 operators composed as a user would: unicode-canonicalize
    // the text, find near-dup pairs, then keep the highest-token-count
    // member of every cluster — ids 1/2/3 are accent/width variants of one
    // doc (3 longest), 10 stands alone
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base.replace("alpha", "\u00e1lpha")),      // precomposed accent
      (2L, base.replace("alpha", "a\u0301lpha")),    // combining accent
      (3L, base.replace("alpha", "\u00e1lpha") + " extra"), // longer variant
      (10L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val normalized = docs.select(col("doc_id"),
      graft.functions.UnicodeFns.unicodeNormalize(col("text"), "NFKC").as("text"))
    val pairs = Dedup.minhashDedup(normalized, "doc_id", "text",
      Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3, threshold = 0.5))
    // 1 and 2 only converge after normalization (different bytes, same NFKC)
    assert(pairs.filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("jaccard").collect().head.getDouble(0) == 1.0)
    val kept = Dedup.keepBestPerCluster(pairs,
        normalized.select(col("doc_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text")).as("score")),
        "doc_id", "score")
      .filter(col("is_keep")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"keep-best must retain the longest variant, got $kept")
  }
}
