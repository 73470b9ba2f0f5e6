package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table ONCE so every later
  * equi join / aggregation on the bucket key runs with ZERO exchanges.
  *
  * This is the 100 TB co-location story: a corpus that is joined or
  * re-aggregated on the same key across many pipeline runs (doc_id,
  * orderkey, user_id...) should not pay a full-table shuffle per run.
  * Writing it `bucketBy(n, key)` hash-partitions the files by
  * `hash(key) % n` at write time; Spark's scan then reports the bucketing
  * as its output partitioning, and Catalyst plans joins/aggregations
  * between same-bucketed tables with no ShuffleExchange on either side
  * (and no sort either, when each bucket holds one sorted file via
  * `sortBy`). The shuffle is paid once, at write — amortized over every
  * downstream consumer.
  *
  * The reference has no notion of physical layout at all (its tables are
  * whatever file it lazily iterates — SURVEY §1.3); this module is pure
  * Spark-side uplift, spec-gated by plan shape (BucketingSpec asserts the
  * joined plan contains no Exchange) rather than a driver query: bucketing
  * changes WHERE work happens, never the answer.
  *
  * Sizing note for real clusters: pick `numBuckets` so one bucket of the
  * LARGEST co-bucketed table fits an executor's task comfortably
  * (~128-512 MB of parquet per bucket); all co-joined tables must share
  * the same bucket count and key for the exchange-free plan to apply.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and optionally sorted) by
    * `keys` into the session catalog's warehouse. Overwrites. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty && numBuckets > 0)
    // the DROP + orphan-location cleanup below compute the managed location
    // as warehouse/<lowercase table>; a qualified (db.tbl) or empty name
    // would make that path wrong and aim the recursive delete at the wrong
    // directory — refuse anything but a simple default-database name
    require(table.nonEmpty && !table.contains(".") && !table.contains("/") &&
      !table.contains("`"),
      s"writeBucketed needs a simple default-database table name, got '$table'")
    val spark = df.sparkSession
    // real Overwrite semantics for a default-database managed table: drop
    // the catalog entry AND clear an orphaned location — a managed table's
    // files outlive the in-memory catalog across sessions, and saveAsTable
    // refuses a location it didn't create (LOCATION_ALREADY_EXISTS)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** The bucketed table, scan carrying its bucket partitioning. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Equi join of two same-bucketed tables on `keys`. The implementation is
    * a plain `join` — the value is the PLAN: with both sides bucketed on
    * `keys` into the same bucket count, the executed plan has no shuffle
    * exchange (asserted by [[shuffleExchanges]] in BucketingSpec). */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, keys: Seq[String],
                       joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Number of shuffle-exchange operators in the (possibly adaptive)
    * executed plan — 0 means fully co-located. String-level count, robust
    * across the AQE wrapper's plan rendering. */
  def shuffleExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
}
