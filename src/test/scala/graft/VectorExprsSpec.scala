package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.pipeline.Similarity

/** Native codegen'd vector kernels agree bit-for-bit with the composed
  * higher-order forms (same accumulation order, same association).
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim/dot_product match the zip_with/aggregate forms exactly") {
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), Similarity.toDouble(col("embedding")).as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), Similarity.toDouble(col("embedding")).as("b")))
      .filter(col("ia") < col("ib")).limit(500)
    val diff = pairs.select(
      (VectorExprs.cosineSim(col("a"), col("b")) -
        (Similarity.dotHof(col("a"), col("b")) / (Similarity.norm(col("a")) * Similarity.norm(col("b"))))).as("dc"),
      (VectorExprs.dotProduct(col("a"), col("b")) - Similarity.dotHof(col("a"), col("b"))).as("dd"))
    val rows = diff.agg(max(abs(col("dc"))), max(abs(col("dd")))).head()
    assert(rows.getDouble(0) == 0.0, "cosine mismatch")
    assert(rows.getDouble(1) == 0.0, "dot mismatch")
  }

  test("kernels handle orthogonal, identical, and zero vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(2.0, 2.0), Seq(2.0, 2.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorExprs.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2).isNaN) // zero norm -> NaN, filtered by thresholds downstream
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val got = df.select(VectorExprs.cosineSim(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
  }
}
