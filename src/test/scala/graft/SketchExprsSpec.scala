package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchExprs
import graft.pipeline.Dedup

/** Native sketch kernels agree exactly with the composed column forms. */
class SketchExprsSpec extends SparkSpec {

  test("native minhash signature equals the composed XOR-rotate form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 16, shingleN = 3)
    val base = docs.select(col("doc_id"),
      Dedup.shingleHashPairs(Dedup.wordShingles(col("text"), 3)).as("hp"))
    val both = base.select(col("doc_id"),
      SketchExprs.minhashSignature(col("hp"), 64).as("native"),
      Dedup.minhashSignatureFromPairs(col("hp"), cfg).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native simhash equals the composed form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val th = transform(split(trim(lower(col("text"))), "\\s+"), t => xxhash64(t))
    val both = docs.select(
      SketchExprs.simhash64(th).as("native"),
      Dedup.simhash(col("text")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native word shingles are set-equal to the composed form") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    for (n <- Seq(1, 3)) {
      val both = docs.select(
        Dedup.wordShingles(col("text"), n).as("native"),
        Dedup.wordShinglesComposed(col("text"), n).as("composed"))
      val bad = both.filter(
        size(array_except(col("native"), col("composed"))) > 0 ||
          size(array_except(col("composed"), col("native"))) > 0).count()
      assert(bad == 0, s"n=$n shingle sets diverge")
    }
  }
}
