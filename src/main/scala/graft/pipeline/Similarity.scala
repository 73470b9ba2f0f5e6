package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Exact path: brute-force cosine top-k — the correctness baseline, O(n·q),
  * embarrassingly parallel (queries broadcast, no shuffle until top-k).
  * Scale path: random-hyperplane LSH — per-row signatures (no shuffle),
  * candidates meet in hash buckets, exact re-rank only within buckets.
  *
  * Dot products use `zip_with`/`aggregate` over built-ins — codegen'd, no
  * UDF. Vectors are cast elementwise to double for stable math.
  */
object Similarity {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Composed higher-order forms (interpreted lambdas — reference semantics,
    * fine for small data); the hot paths use the native codegen'd kernels in
    * graft.functions.VectorExprs (same math, same accumulation order). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.cosineSim(a, b)

  /** Exact top-k neighbors for every query vector: broadcast the (small)
    * query set against the corpus, rank per query. One shuffle (the window
    * by qid); corpus is never replicated beyond |queries| multiplier. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val joined = corpus
      .select(col(idCol).as("nn_id"), toDouble(col(vecCol)).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), toDouble(col(qvecCol)).as("qv"))))
      .filter(col("nn_id") =!= col("qid"))
      .select(col("qid"), col("nn_id"), cosine(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d coefficient
    * derived from a hash — reproducible across engines/runs with no RNG. */
  private def planeCoef(p: Int, d: Int, seed: Long): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, p, d))
    (h.toDouble / Int.MaxValue) // in [-1, 1]
  }

  /** nPlanes-bit signature: bit p = sign of <v, plane_p>. Per-row expression,
    * zero shuffle; planes are literals folded into the codegen'd plan. */
  def hyperplaneSignature(vec: Column, dim: Int, nPlanes: Int = 16,
                          seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val coefs = (0 until dim).map(d => planeCoef(p, d, seed))
      val proj = aggregate(
        zip_with(vec, typedLit(coefs), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via multi-table hyperplane LSH with 1-bit multiprobe:
    * `nTables` independent plane sets; per table, candidates are corpus rows
    * whose signature equals the query signature or any 1-bit flip; the union
    * of candidates is re-ranked by exact cosine. Recall ~ 1-(1-r)^L for
    * per-table recall r; cost stays O(candidates · d) instead of O(n · d)
    * per query, and every stage is a per-row expression + one hash join. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8, nTables: Int = 6, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    // per-table signatures, tagged (table, sig) and exploded
    def sigs(vec: Column): Column = array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        hyperplaneSignature(vec, dim, nPlanes, seed + t).as("sig"))
    }: _*)

    val sigCorpus = corpus.select(col(idCol).as("nn_id"),
        toDouble(col(vecCol)).as("v"), explode(sigs(col(vecCol))).as("ts"))
      .select(col("nn_id"), col("v"), col("ts.tbl"), col("ts.sig"))

    val probes = queries.select(col(qidCol).as("qid"), toDouble(col(qvecCol)).as("qv"),
        explode(sigs(col(qvecCol))).as("ts"))
      .select(col("qid"), col("qv"), col("ts.tbl").as("tbl"), col("ts.sig").as("qsig"))
      .select(col("qid"), col("qv"), col("tbl"), explode(array(
        col("qsig") +: (0 until nPlanes).map(b => col("qsig").bitwiseXOR(lit(1L << b))): _*)).as("probe"))

    val cands = sigCorpus.join(broadcast(probes),
        col("sig") === col("probe") && sigCorpus("tbl") === probes("tbl"))
      .filter(col("nn_id") =!= col("qid"))
      .select(col("qid"), col("nn_id"), cosine(col("v"), col("qv")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random unit centroids for IVF init (a production
    * build would k-means these; the partition/probe plumbing is identical). */
  def pseudoCentroids(nCentroids: Int, dim: Int, seed: Long = 7L): Seq[(Int, Seq[Double])] =
    (0 until nCentroids).map { c =>
      val raw = (0 until dim).map(d => planeCoef(c, d, seed))
      val n = math.sqrt(raw.map(x => x * x).sum)
      c -> raw.map(_ / n)
    }

  /** IVF-style ANN: corpus is partitioned by nearest of C centroids (here a
    * deterministic sample of corpus vectors); queries probe the nProbe
    * nearest centroids and scan only those partitions. The assignment is a
    * broadcast of C centroid literals — at 100 TB the assignment pass is one
    * linear scan and the probe pass touches ~nProbe/C of the data. */
  def ivfAssign(corpus: DataFrame, centroids: Seq[(Int, Seq[Double])],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = array(centroids.map { case (cid, cvec) =>
      struct((-dot(toDouble(col(vecCol)), typedLit(cvec)) /
        (norm(toDouble(col(vecCol))) * typedLit(math.sqrt(cvec.map(x => x * x).sum)))).as("negcos"),
        lit(cid).as("cid"))
    }: _*)
    corpus.withColumn("centroid", sort_array(scored).getItem(0).getField("cid"))
  }

  /** IVF search: corpus pre-assigned to centroid partitions (ivfAssign);
    * each query probes its nProbe nearest centroids and exact-reranks only
    * those partitions — the probe pass touches ~nProbe/C of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              centroids: Seq[(Int, Seq[Double])], k: Int, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("nn_id"), toDouble(col(vecCol)).as("v"), col("centroid"))
    def probeList(vec: Column): Column = {
      val scored = array(centroids.map { case (cid, cvec) =>
        struct((-dot(toDouble(vec), typedLit(cvec))).as("negdot"), lit(cid).as("cid"))
      }: _*)
      transform(slice(sort_array(scored), 1, nProbe), p => p.getField("cid"))
    }
    val probes = queries.select(col(qidCol).as("qid"), toDouble(col(qvecCol)).as("qv"),
      explode(probeList(col(qvecCol))).as("centroid"))
    val cands = assigned.join(broadcast(probes), "centroid")
      .filter(col("nn_id") =!= col("qid"))
      .select(col("qid"), col("nn_id"), cosine(col("v"), col("qv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact near-duplicate pairs by cosine >= threshold. Brute force over all
    * pairs — correctness baseline for the LSH path; keep to bounded corpora
    * (the LSH variant is the scale path). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
