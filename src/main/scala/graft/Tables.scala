package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (see /root/repo/TESTDATA.md).
  *
  * Every named query receives `(spark, sfDir)`; this is the single place that
  * maps logical table names to parquet paths. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning — at cluster
  * scale these would be partitioned tables behind a catalog, and this facade
  * is the one seam to swap in `spark.table(name)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos (legacy long mode) and
    * convert to a microsecond TimestampType with integral division — a
    * double division would lose precision at 1.7e18 ns.
    *
    * `spark.sql.legacy.parquet.nanosAsLong` must be set at SESSION BUILD
    * (Bench/Verify/SparkSpec all do) — a table loader silently flipping a
    * session-global read mode would be a trap for concurrent sessions, so
    * this only asserts, never mutates. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet carries TIMESTAMP(NANOS): build the session with " +
        ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\")")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
