package graft.sources

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY §2.2). Thin facades over DataFrameWriter — chunked
  * streaming writes (reference io.write io.py:1434-1501) are what a
  * partitioned distributed write *is*; `maxRecordsPerFile` bounds file
  * sizes, `partitionBy` is the split-by-key writer (process.split O3).
  */
object Writers {

  /** Columnar sink symmetry for [[Readers.read]]'s "orc" branch: ORC ships
    * in spark-sql, so the warehouse formats a reference user would migrate
    * between (parquet/orc) both round-trip natively. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** K1 records2csv (convert.py:807-849). */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          maxRecordsPerFile: Option[Long] = None): Unit = {
    var w = df.write.mode("overwrite").option("header", header.toString)
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    w.csv(path)
  }

  /** K2 records2json as NDJSON (convert.py:852-892 with newline=True; dates
    * render ISO via Spark's JSON encoder, matching CustomEncoder
    * fntools.py:231-246). The distributed writer — use this shape at scale. */
  def ndjson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K2 records2json, both shapes (convert.py:852-892): the reference's
    * DEFAULT is a single JSON array document (doctest convert.py:871-885);
    * `newline = true` is the NDJSON mode above. A one-document array is
    * inherently a single-writer output, so rows stream through the driver
    * one partition at a time (`toLocalIterator` — bounded memory, the
    * distributed analogue of the reference's generator-chunked dump); for
    * anything large prefer [[ndjson]], which stays fully parallel. */
  def json(df: DataFrame, path: String, newline: Boolean = false): Unit =
    if (newline) ndjson(df, path)
    else {
      // Hadoop FileSystem so both branches accept the same path universe
      // (local, hdfs://, s3a://, ...) — NIO would silently localize a URI
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(hPath, true), java.nio.charset.StandardCharsets.UTF_8))
      try {
        out.write("[")
        val it = df.toJSON.toLocalIterator()
        var first = true
        while (it.hasNext) {
          if (!first) out.write(",")
          out.write(it.next())
          first = false
        }
        out.write("]")
      } finally out.close()
    }

  /** K3 geojson: stream the FeatureCollection document straight to the
    * target filesystem (GeoJson.writeCollection — bbox via one aggregate,
    * features via toLocalIterator; the driver never buffers the document). */
  def geojson(df: DataFrame, path: String, crs: Option[String] = None): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(hPath, true), java.nio.charset.StandardCharsets.UTF_8))
    try GeoJson.writeCollection(df, out, crs) finally out.close()
  }

  /** O3 process.split: partitioned / size-bounded parquet write. */
  def splitByKey(df: DataFrame, path: String, key: String,
                 maxRecordsPerFile: Option[Long] = None): Unit = {
    var w = df.write.mode("overwrite")
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    w.partitionBy(key).parquet(path)
  }

  /** K5 io.hash_file (io.py:1504-1551): driver util. */
  def hashFile(path: String, algo: String = "SHA-1"): String = {
    val md = java.security.MessageDigest.getInstance(algo)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    md.digest(bytes).map("%02x".format(_)).mkString
  }
}
