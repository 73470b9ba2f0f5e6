package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classification — the fastText-style scoring
  * pass a training-data pipeline runs over every document (quality / topic
  * / toxicity triage) at corpus scale. The mechanism is the real thing:
  * token uni+bigram features, feature hashing into B buckets (md5-based so
  * any engine reproduces it bit-for-bit), a per-(bucket, class) weight
  * lookup, integer score sums, argmax with a deterministic tie-break.
  * The WEIGHTS here are a deterministic arithmetic stand-in for a trained
  * matrix (`(bucket*A + class*C) mod M − M/2` — cf. the multimodal
  * fixture discipline): swapping in trained weights changes one function,
  * not the dataflow.
  *
  * Scale design: scoring is entirely row-local — the feature array, its
  * hash buckets, and all nClasses score folds happen inside one projection
  * (no explode→groupBy shuffle, no weight-table join: the hash-derived
  * weights make the lookup a pure expression; a learned table would be one
  * broadcast join keyed by bucket). 100 TB of documents score with ZERO
  * exchanges.
  *
  * Reference anchor: classifier-based quality filtering as in the CCNet /
  * GPT-3 data pipelines (public papers); hashing trick per Weinberger et
  * al. (public).
  */
object Classifier {

  val HashA = 2654435L
  val HashC = 40503L
  val Mod = 1000003L

  /** Lowercase whitespace tokens — mirrors TextAnalysis' ltokens oracle
    * (`regexp_split_to_array(trim(lower(text)), '\s+')`). */
  private def ltokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Unigram + adjacent-bigram feature list, in order. Bigrams join with
    * '_' (never appears in whitespace-split tokens). */
  def features(text: Column): Column = {
    val t = ltokens(text)
    val bigrams = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
    concat(t, bigrams)
  }

  /** md5-based feature hash into [0, nBuckets): first 8 hex chars of
    * md5(salt || feature) as an unsigned 32-bit int, mod nBuckets —
    * deterministic and engine-portable (DuckDB:
    * `('0x' || substring(md5(...),1,8))::BIGINT % B`). */
  def bucket(feature: Column, salt: String, nBuckets: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt), feature)), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  /** Stand-in weight for (bucket, class): integer in (−M/2, M/2]. */
  private def weight(b: Column, k: Int): Column =
    pmod(b * HashA + lit(k.toLong) * HashC, lit(Mod)) - lit(Mod / 2)

  /** Score every document against nClasses hashed linear heads and elect
    * the argmax (ties → lowest class id). Appends per-class integer scores
    * (`score_0..score_{n-1}`) and `pred_class`. One row-local projection —
    * see the object doc for why this is shuffle-free. */
  def scoreDocuments(docs: DataFrame, textCol: String, nClasses: Int,
                     nBuckets: Int = 1 << 20,
                     salt: String = "clf"): DataFrame = {
    require(nClasses >= 2 && nBuckets > 0)
    val withBuckets = docs.withColumn("__fb",
      transform(features(col(textCol)), f => bucket(f, salt, nBuckets)))
    val scored = (0 until nClasses).foldLeft(withBuckets) { (df, k) =>
      df.withColumn(s"score_$k",
        aggregate(col("__fb"), lit(0L), (acc, b) => acc + weight(b, k)))
    }
    val scores = (0 until nClasses).map(k => col(s"score_$k"))
    val pred = (0 until nClasses).foldRight(lit(nClasses - 1): Column) {
      case (k, rest) =>
        if (k == nClasses - 1) rest
        else when(scores.drop(k + 1).map(s => scores(k) >= s).reduce(_ && _),
          lit(k)).otherwise(rest)
    }
    scored.withColumn("pred_class", pred).drop("__fb")
  }
}
