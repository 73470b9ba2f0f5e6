package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * held-out splits, fixed-token-budget sequence packing, and the composed
  * quality→language→dedup curation pass.
  *
  * Everything here is deterministic and engine-independent by construction
  * (md5 / arithmetic / windowed sums — no RNG, no engine-specific hashes),
  * so every operator is oracle-checkable against DuckDB, and a re-run over
  * a grown corpus keeps prior assignments stable (the property that matters
  * when a 100 TB corpus is curated incrementally).
  */
object Curation {

  // --------------------------------------------------------- hash splitting
  /** Deterministic split label ("train"/"valid"/"test"/...) from a stable
    * key: the first 8 hex chars of md5(salt ++ key) compared against
    * cumulative-fraction thresholds AS HEX STRINGS — fixed-width lowercase
    * hex compares lexicographically exactly as the underlying 32-bit value,
    * so the same expression runs in any engine with md5 (the DuckDB oracle
    * mirrors it verbatim). Rows never shuffle: label assignment is a pure
    * per-row projection; changing `salt` re-deals the split, adding rows
    * never moves existing ones.
    *
    * Fractions must be positive and sum to 1 (the last label absorbs the
    * hex tail so the union is exhaustive). */
  def splitLabel(key: Column, salt: String, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "at least one split fraction")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val h = substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    val cases = fractions.init.zip(cuts.init).map { case ((name, _), cum) =>
      (name, f"${math.min((cum * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x")
    }
    cases.foldRight(lit(fractions.last._1): Column) { case ((name, hex), rest) =>
      when(h < lit(hex), lit(name)).otherwise(rest)
    }
  }

  /** [[splitLabel]] attached as a `split` column. */
  def hashSplit(df: DataFrame, key: Column, salt: String,
                fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(key, salt, fractions))

  // ------------------------------------------------------- sequence packing
  /** Pack documents into fixed-token-budget training sequences, GPT-style:
    * concatenate in id order and cut every `tokenBudget` tokens — a doc
    * belongs to the sequence its FIRST token lands in. Packing runs
    * independently per shard (`shard = id % numShards`), which is what
    * makes it scale: each shard's running token sum is one window over its
    * own partition, so numShards bounds both parallelism and the largest
    * sort — there is no global single-partition window at 100 TB. The
    * global sequence key is (shard, seq_in_shard).
    *
    * Returns (id, shard, seq_in_shard, tok_start, n_tokens) where
    * tok_start is the doc's offset in its shard's concatenated stream. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    tokenBudget: Int, numShards: Int): DataFrame = {
    require(tokenBudget > 0 && numShards > 0)
    val id = col(idCol)
    val nTok = TextAnalysis.tokenCount(col(textCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(id.as("id"), pmod(id, lit(numShards)).as("shard"), nTok.as("n_tokens"))
      .withColumn("tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_in_shard", floor(col("tok_start") / tokenBudget))
      .select(col("id"), col("shard"), col("seq_in_shard"),
        col("tok_start"), col("n_tokens"))
  }

  // ------------------------------------------------------- curation compose
  /** The composed curation pass a training-data pipeline runs before
    * tokenization: language filter → quality filter → exact dedup (keep the
    * minimum id per content fingerprint). Per-row filters run BEFORE the
    * dedup shuffle, so at 100 TB the only exchange carries the already-
    * curated survivors' (fingerprint, id) — never full text, never
    * discarded rows. Returns the kept documents with their predicted
    * language and quality score. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             lang: String, minQuality: Double): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.langId(col(textCol)).as("lang"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .filter(col("lang") === lang && col("quality") >= minQuality)
    val keep = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    scored.join(keep, Seq("fp", "doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("quality"))
  }
}
