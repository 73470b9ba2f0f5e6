package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.Layout

/** Table-layout queries: Z-order clustering summaries and compaction
  * planning — pure integer arithmetic end to end, so DuckDB mirrors every
  * bit. The Z-order SQL is GENERATED from the same (bits, ncols) loop the
  * Scala kernel unrolls, keeping the two engines' bit math structurally
  * identical by construction.
  */
object LayoutQueries {

  /** DuckDB bit-interleave of pre-quantized columns — mirror of
    * [[Layout.zorderKey]]'s term loop. */
  private def zorderSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for { b <- 0 until bits; (c, i) <- cols.zipWithIndex }
      yield s"((($c >> $b) & 1) << ${b * n + i})").mkString(" | ")
  }

  private val ZBits = 8
  private val ZFiles = 64

  val qs: Seq[Q] = Seq(

    // ---- Z-order layout summary over lineitem (partkey × suppkey): the
    // write-time clustering pass made observable — quantize both keys
    // against global min/max (one scalar aggregate broadcast back, never a
    // window), interleave bits, cut into 64 equal key ranges ("files") and
    // report each file's per-column spans: the min/max footer stats a
    // 100 TB reader would prune on. LayoutSpec asserts the locality
    // property (mean per-file span far below the global span on BOTH
    // dimensions at once).
    Q("q213_zorder", {
      val z = zorderSql(Seq("q1", "q2"), ZBits)
      Some("WITH b AS (SELECT min(l_partkey) AS lo1, max(l_partkey) AS hi1, " +
        "min(l_suppkey) AS lo2, max(l_suppkey) AS hi2 FROM lineitem), " +
        "q AS (SELECT l_partkey, l_suppkey, " +
        s"((l_partkey - lo1) * ${1 << ZBits}) // (hi1 - lo1 + 1) AS q1, " +
        s"((l_suppkey - lo2) * ${1 << ZBits}) // (hi2 - lo2 + 1) AS q2 " +
        "FROM lineitem CROSS JOIN b), " +
        s"z AS (SELECT l_partkey, l_suppkey, ($z) AS zkey FROM q) " +
        s"SELECT (zkey * $ZFiles) >> ${ZBits * 2} AS file_id, " +
        "count(*) AS n_rows, " +
        "min(l_partkey) AS min_l_partkey, max(l_partkey) AS max_l_partkey, " +
        "min(l_suppkey) AS min_l_suppkey, max(l_suppkey) AS max_l_suppkey " +
        "FROM z GROUP BY 1 ORDER BY file_id")
    },
      (s, dir) => Layout.zorderSummary(
          Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
          Seq("l_partkey", "l_suppkey"), bits = ZBits, nFiles = ZFiles)
        .orderBy("file_id")),

    // ---- compaction planning over a synthesized file listing (one
    // metadata row per (returnflag partition, partkey%200 file), bytes =
    // exact integer quantity sum): files pack left-to-right in name order,
    // bin = exclusive-prefix-sum // target — the streaming assignment a
    // compactor executes per partition with no cross-partition state.
    Q("q214_compaction",
      Some("WITH files AS (SELECT l_returnflag AS part, l_partkey % 200 AS file_id, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS bytes " +
        "FROM lineitem GROUP BY 1, 2), " +
        "p AS (SELECT part, file_id, bytes, " +
        "CAST((sum(bytes) OVER (PARTITION BY part ORDER BY file_id " +
        "ROWS UNBOUNDED PRECEDING) - bytes) // 50000 AS BIGINT) AS bin FROM files) " +
        "SELECT part, file_id, bytes, bin, " +
        "CAST(sum(bytes) OVER (PARTITION BY part, bin) AS BIGINT) AS bin_bytes, " +
        "count(*) OVER (PARTITION BY part, bin) AS bin_files " +
        "FROM p ORDER BY part, file_id"),
      (s, dir) => {
        val files = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag").as("part"),
            pmod(col("l_partkey"), lit(200L)).as("file_id"))
          .agg(sum(col("l_quantity").cast("long")).as("bytes"))
        Layout.compactionPlan(files, "part", "file_id", "bytes",
            targetBytes = 50000L)
          .orderBy("part", "file_id")
      }),

    // ---- per-column storage profile from parquet FOOTERS (no data pages
    // read; footer reads distribute across executors): footer fields are
    // file properties, so DuckDB's parquet_metadata must agree
    // byte-for-byte — an oracle-checked layout query.
    Q("q261_column_storage",
      Some("SELECT path_in_schema AS col_name, count(*) AS n_chunks, " +
        "CAST(sum(num_values) AS BIGINT) AS n_values, " +
        "CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes, " +
        "CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes, " +
        "round(CAST(sum(total_uncompressed_size) AS DOUBLE) / " +
        "CAST(sum(total_compressed_size) AS DOUBLE), 6) AS ratio " +
        "FROM parquet_metadata('__SF_DIR__/lineitem.parquet') " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => Layout.columnChunkProfile(s, Seq(s"$dir/lineitem.parquet"))
        .orderBy("col_name"))
  )
}
