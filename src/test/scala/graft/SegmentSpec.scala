package graft

import org.apache.spark.sql.functions._

import graft.functions.SegmentExprs
import graft.pipeline.{TextAnalysis => TA}

/** Greedy longest-match subword segmentation kernel. */
class SegmentSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(SegmentExprs.greedyPieces(col("t"), vocab).as("p"))
      .as[Seq[String]].collect().head

  test("longest match wins at every position") {
    assert(pieces("abcbc", Seq("ab", "abc", "bc", "c")) == Seq("abc", "bc"))
  }

  test("unmatched characters fall through as single-char pieces (lossless)") {
    val out = pieces("zabxy", Seq("ab", "xy"))
    assert(out == Seq("z", "ab", "xy"))
    assert(out.mkString == "zabxy")
  }

  test("multi-word input segments each token; lowercase + trim mirror the composed tokenizer") {
    assert(pieces("  The THE  ", Seq("th", "he")) ==
      Seq("th", "e", "th", "e"))
  }

  test("segmentation always concatenates back to the tokenized words") {
    val docs = Tables.documents(spark, sf001).limit(100)
    val bad = docs.select(
      concat_ws("", SegmentExprs.greedyPieces(col("text"), TA.PieceVocab))
        .as("joined"),
      concat_ws("", split(trim(lower(col("text"))), "\\s+")).as("orig"))
      .filter(col("joined") =!= col("orig")).count()
    assert(bad == 0L)
  }

  test("kernel is a zero-exchange projection") {
    // the loader's r15 RoundRobin fanout is allowed (row-local); the
    // kernel itself must add no keyed shuffle
    val plan = Tables.documents(spark, sf001)
      .select(SegmentExprs.greedyPieces(col("text"), TA.PieceVocab))
      .queryExecution.executedPlan.toString
    val keyed = plan.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("RoundRobinPartitioning")).toSeq
    assert(keyed.isEmpty, s"unexpected shuffle in:\n$plan")
  }
}
