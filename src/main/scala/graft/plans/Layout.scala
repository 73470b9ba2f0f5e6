package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-layout primitives for the 100 TB write path: multi-dimensional
  * Z-order clustering keys (the data-skipping layout for scans that filter
  * on several columns at once) and deterministic small-file compaction
  * planning (the maintenance pass every petabyte table needs).
  *
  * Everything here is integer arithmetic over metadata or key columns —
  * exactly reproducible in any engine, which is what makes the driver's
  * DuckDB oracle able to hash-check it. Magnitude contract: interleaved
  * key widths stay ≤ 50 bits so every division is exact through a double
  * (both engines floor identically on non-negative operands).
  */
object Layout {

  // ---------------------------------------------------------- Z-order key
  /** Bit-interleaved Z-order (Morton) key over columns already quantized to
    * `bits`-bit non-negative integers: bit b of column c lands at position
    * b*ncols + c. Rows sorted by this key cluster so that ANY prefix range
    * of the sort corresponds to a small hyper-rectangle in every dimension
    * at once — after a range-partitioned write, a reader filtering on any
    * of the interleaved columns prunes most files from min/max footer
    * stats. The computation is a stateless per-row projection (zero
    * shuffle); the one shuffle this layout ever costs is the write-time
    * range sort, paid once. The loop unrolls to ncols*bits shift/and/or
    * terms in one codegen'd expression — no UDF, no allocation. */
  def zorderKey(quantized: Seq[Column], bits: Int): Column = {
    require(quantized.nonEmpty, "at least one column")
    require(bits >= 1 && bits * quantized.size <= 50,
      s"interleaved width ${bits * quantized.size} exceeds the 50-bit contract")
    val n = quantized.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Equi-width quantization of a numeric column into [0, 2^bits) given
    * inclusive bounds — the per-row half of Z-ordering. bucket =
    * floor((x - lo) * 2^bits / (hi - lo + 1)): non-negative integer
    * arithmetic, identical in any engine (`//` in the oracle). */
  def quantize(x: Column, lo: Column, hi: Column, bits: Int): Column =
    floor(((x.cast("long") - lo) * (1L << bits)) / (hi - lo + lit(1L)))
      .cast("long")

  /** The write-time clustering pass, observable: quantize `cols` against
    * their global min/max (ONE tiny scalar aggregate broadcast back —
    * never a per-row window), interleave into a Z-key, cut the keyspace
    * into `nFiles` equal ranges (the files a range-partitioned write would
    * produce: file = zkey*nFiles >> bits*ncols, exact integer math), and
    * report each file's per-column min/max span. The spans ARE the layout's
    * proof: every dimension's per-file span shrinks toward
    * globalSpan / nFiles^(1/ncols), which is exactly the footer-stats
    * pruning a 100 TB reader gets on every interleaved column at once —
    * a single-column sort gives it for one column only. Returns
    * (file_id, n_rows, then min_/max_ per column). */
  def zorderSummary(df: DataFrame, cols: Seq[String], bits: Int,
                    nFiles: Int): DataFrame = {
    require(nFiles >= 1 && bits * cols.size + 21 <= 62,
      "zkey * nFiles must fit a long")
    val boundExprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__lo_$c"),
        max(col(c)).cast("long").as(s"__hi_$c")))
    val bounds = df.agg(boundExprs.head, boundExprs.tail: _*)
    val statExprs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__zkey", zorderKey(
        cols.map(c => quantize(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits)),
        bits))
      .withColumn("file_id",
        shiftright(col("__zkey") * nFiles, bits * cols.size))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"), statExprs: _*)
  }

  // ------------------------------------------------------ compaction plan
  /** Deterministic small-file compaction planning: within each table
    * partition, files are taken in name order and packed left-to-right —
    * bin = floor(exclusive running byte sum / target), the streaming
    * assignment a compactor executes without ever co-locating two
    * partitions. A bin closes once its running total reaches the target,
    * so each bin holds < targetBytes + one file (the classic bin-packing
    * maintenance rule); an oversized file lands alone. Planning input is
    * file METADATA (a listing, not data): at 100 TB that is ~millions of
    * rows, one window per partition key — trivially parallel, no global
    * sort, and the rewrite work parallelizes per (partition, bin).
    *
    * Returns the input plus (bin, bin_bytes, bin_files) so the executor
    * doing the rewrite knows its output shape up front. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    val before = sum(col(bytesCol)).over(w) - col(bytesCol) // exclusive prefix
    files.withColumn("bin", floor(before / targetBytes).cast("long"))
      .withColumn("bin_bytes",
        sum(col(bytesCol)).over(Window.partitionBy(col(partCol), col("bin"))))
      .withColumn("bin_files",
        count(lit(1)).over(Window.partitionBy(col(partCol), col("bin"))))
  }

  // ------------------------------------------- column storage profile
  /** Per-column storage profile from parquet FOOTERS (no data pages are
    * read): value counts, compressed/uncompressed bytes, and the
    * compression ratio per column — the report that drives encoding,
    * column-pruning, and layout decisions ("that one string column is 80%
    * of the table"). Footer reads distribute one-per-file across
    * executors (the driver never opens a file), so profiling a million-
    * file table costs a million ~8 KB footer reads in parallel — metadata
    * work, the compactionPlan discipline. Footer fields are data
    * properties of the files, so any parquet reader (DuckDB's
    * `parquet_metadata` included) must agree byte-for-byte — an
    * oracle-checkable LAYOUT query. Returns per column:
    * (col_name, n_chunks, n_values, compressed_bytes, uncompressed_bytes,
    * ratio [uncompressed/compressed, 6dp]). */
  def columnChunkProfile(spark: org.apache.spark.sql.SparkSession,
                         files: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(files.nonEmpty, "at least one parquet file")
    val rows = spark.sparkContext
      .parallelize(files, math.min(files.size, 64))
      .flatMap { path =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(path), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
            b.getColumns.asScala.toSeq.map { c =>
              (c.getPath.toDotString, c.getValueCount,
                c.getTotalSize, c.getTotalUncompressedSize)
            }
          }
        } finally reader.close()
      }
    spark.createDataFrame(rows)
      .toDF("col_name", "__values", "__comp", "__uncomp")
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("__values")).as("n_values"),
        sum(col("__comp")).as("compressed_bytes"),
        sum(col("__uncomp")).as("uncompressed_bytes"))
      .withColumn("ratio",
        round(col("uncompressed_bytes").cast("double") /
          col("compressed_bytes").cast("double"), 6))
  }
}
