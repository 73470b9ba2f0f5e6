package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the "small-ish build side, huge probe side"
  * semi-join accelerator Spark's own runtime row-level filtering plans when
  * it can (this operator is the explicit, always-on form). The build side's
  * join keys aggregate into ONE Bloom filter on the executors
  * (`bloom_filter_agg`, a distributed `TypedImperativeAggregate` — keys
  * never collect), the probe side filters on `might_contain` BEFORE its
  * shuffle, and an exact semi join over the survivors removes the false
  * positives. At 100 TB the win is the pruned exchange: a 1%-selective semi
  * join shuffles ~1% of the probe table plus the false-positive margin
  * instead of all of it.
  *
  * Driver seam (documented, bounded): the aggregated filter is a single
  * binary value whose size is FIXED by (expectedItems, fpp) — ~1.2 MB for
  * 10⁶ keys at 1% — fetched with one `head()` and re-embedded as a literal
  * on the probe side, exactly the scalar-subquery shape Spark's
  * InjectRuntimeFilter produces. The data never collects; the sketch does —
  * same contract as the k-means seed sample (Similarity.scala) and sized by
  * `BloomFilter.optimalNumOfBits`.
  */
object BloomPrune {

  /** Rows of `probe` whose `probeKey` appears in `build`'s `buildKey` —
    * exact semi-join semantics (the Bloom filter only PRUNES; false
    * positives die in the final semi join, and Bloom filters have no false
    * negatives). Keys hash through xxhash64 on BOTH sides so any key type
    * works against the LongType filter. `expectedItems` sizes the filter for
    * the build side's distinct-key cardinality; `fpp` trades filter size
    * against leftover shuffle volume. */
  def bloomPrunedSemiJoin(probe: DataFrame, probeKey: String,
                          build: DataFrame, buildKey: String,
                          expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems >= 1, s"expectedItems must be >= 1: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val keys = build.select(col(buildKey)).distinct()
    // bloom_filter_agg is not in the public function registry (Spark keeps
    // it for its own runtime filtering); build the same aggregate directly
    val agg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(buildKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bfRow = keys.select(agg.as("bf")).head()
    val pruned =
      if (bfRow.isNullAt(0)) probe.limit(0) // empty build side matches nothing
      else {
        val bf: Column = ColumnBridge.column(BloomFilterMightContain(
          Literal(bfRow.getAs[Array[Byte]](0), BinaryType),
          ColumnBridge.expression(xxhash64(col(probeKey)))))
        probe.filter(col(probeKey).isNotNull && bf)
      }
    pruned.join(keys.withColumnRenamed(buildKey, "__bk"),
      col(probeKey) === col("__bk"), "semi")
  }
}
