package graft.sources

import scala.jdk.CollectionConverters._

import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.Ops

/** Format readers with the reference's surface (meza/io.py; SURVEY §2.1).
  *
  * Two tiers, by design:
  *   - *Scalable tier* (csv/tsv/json/fixed-width/parquet): pure
  *     `spark.read` plans — distributed, pushdown-friendly; this is the
  *     100 TB path.
  *   - *Eager tier* (yaml/html/xml/xlsx): driver-side parse of small files
  *     into a DataFrame — exactly the formats the reference itself
  *     materializes eagerly (README.rst:579), never big-data formats.
  *
  * Row-window options (`firstRow`/`lastRow`/`firstCol`) imply an ordered
  * file — inherently single-file semantics (reference: io.py:456-502) — and
  * use a zipWithIndex slice before parsing.
  */
object Readers {

  final case class CsvOptions(
      header: Boolean = true,
      customHeader: Seq[String] = Nil,
      sanitize: Boolean = true,
      delimiter: String = ",",
      quote: Char = '"',
      encoding: Option[String] = None, // None => sniff
      firstRow: Int = 0,
      lastRow: Int = 0, // negative k => drop last k rows
      firstCol: Int = 0)

  /** S1 read_csv (io.py:763-850). Fast path when no row/col window is
    * requested; windowed path otherwise. Returns all-string columns (typing
    * belongs to DetectTypes.typeCast — same split as the reference). */
  /** Charsets safe on Spark's native CSV line splitter. UTF-16/32 mis-align
    * on Hadoop's byte-based newline scan (bytes of multi-byte chars straddle
    * the split) and windows-1252 isn't accepted at all — those take the
    * driver-decoded windowed path (small ingest files, like the reference's
    * in-process Reencoder io.py:183-285). */
  private val sparkCsvCharsets = Set("utf-8", "us-ascii", "iso-8859-1")

  def csv(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame = {
    val enc = opts.encoding.getOrElse(Encoding.detect(path))
    if (opts.firstRow == 0 && opts.lastRow == 0 && opts.firstCol == 0 &&
        sparkCsvCharsets.contains(enc.toLowerCase)) {
      var r = spark.read
        .option("header", opts.header && opts.customHeader.isEmpty)
        .option("delimiter", opts.delimiter)
        .option("quote", opts.quote.toString)
        .option("encoding", enc)
        .option("mode", "PERMISSIVE")
      val df0 = r.csv(path)
      // a trailing empty header cell surfaces as a positional _cN name:
      // the reference drops such columns entirely (golden: test.csv -> 4 cols)
      val df1 =
        if (opts.header && opts.customHeader.isEmpty)
          df0.drop(df0.columns.zipWithIndex.collect {
            case (c, i) if c == s"_c$i" => c }.toSeq: _*)
        else df0
      val named = applyHeader(df1, opts)
      dropBlankRows(named)
    } else windowedCsv(spark, path, opts, enc)
  }

  /** S2 read_tsv (io.py:853-893). */
  def tsv(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame =
    csv(spark, path, opts.copy(delimiter = "\t"))

  private def applyHeader(df: DataFrame, opts: CsvOptions): DataFrame = {
    val names: Seq[String] =
      if (opts.customHeader.nonEmpty) opts.customHeader
      else if (!opts.header) Headers.synthetic(df.columns.length)
      else if (opts.sanitize) Headers.sanitize(df.columns.toSeq)
      else Headers.dedupe(df.columns.toSeq)
    df.toDF(names: _*)
  }

  private def dropBlankRows(df: DataFrame): DataFrame = {
    val anyContent = df.columns.map(c =>
      col(c).isNotNull && trim(col(c).cast(StringType)) =!= "").reduce(_ || _)
    df.filter(anyContent)
  }

  /** Ordered single-file CSV with row/col windows: zipWithIndex slice, then
    * per-partition univocity parse (the one genuinely imperative read path,
    * matching the reference's deque/islice machinery io.py:456-502). */
  private def windowedCsv(spark: SparkSession, path: String, opts: CsvOptions,
                          enc: String): DataFrame = {
    val raw =
      if (enc.equalsIgnoreCase("UTF-8") || enc.equalsIgnoreCase("us-ascii"))
        spark.sparkContext.textFile(path)
      else // non-UTF8: decode whole (small) file driver-side, keep lines
        spark.sparkContext.parallelize(
          Encoding.readString(path, Some(enc)).split("\r\n|\r|\n", -1).toSeq)

    val indexed = raw.zipWithIndex()
    val total = indexed.count()
    val hi = if (opts.lastRow < 0) total + opts.lastRow else total
    val lines = indexed
      .filter { case (_, i) => i >= opts.firstRow && i < hi }
      .map(_._1)
      .filter(_.trim.nonEmpty)

    val delimiter = opts.delimiter
    val quote = opts.quote
    val parsed = lines.mapPartitions { it =>
      val settings = new CsvParserSettings
      settings.getFormat.setDelimiter(delimiter)
      settings.getFormat.setQuote(quote)
      settings.setMaxCharsPerColumn(1 << 20)
      val parser = new CsvParser(settings)
      it.map(l => parser.parseLine(l).toSeq.map(Option(_).getOrElse("")))
    }

    val first = parsed.first()
    val headerCells = first.drop(opts.firstCol)
    // keep only columns with non-empty header names (reference drops the rest)
    val keepIdx: Seq[Int] =
      if (opts.header && opts.customHeader.isEmpty)
        headerCells.zipWithIndex.collect { case (h, i) if h.trim.nonEmpty => i }
      else headerCells.indices
    val rawNames: Seq[String] =
      if (opts.customHeader.nonEmpty) opts.customHeader
      else if (opts.header) keepIdx.map(i => headerCells(i).trim)
      else Headers.synthetic(keepIdx.length)
    val names = if (opts.sanitize) Headers.sanitize(rawNames) else Headers.dedupe(rawNames)

    val body = if (opts.header && opts.customHeader.isEmpty)
      parsed.zipWithIndex().filter(_._2 > 0).map(_._1) else parsed
    val firstCol = opts.firstCol
    val rows = body.map { cells =>
      val sliced = cells.drop(firstCol)
      Row.fromSeq(keepIdx.map(i => if (i < sliced.length) sliced(i) else ""))
    }
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val df = spark.createDataFrame(rows, schema)
    dropBlankRows(df)
  }

  /** S3 read_fixed_fmt (io.py:896-960): `starts` are column start offsets;
    * the last field runs to end of line. One substring projection — fully
    * codegen'd, scalable. */
  def fixedWidth(spark: SparkSession, path: String, starts: Seq[Int],
                 names: Seq[String] = Nil, hasHeader: Boolean = false,
                 sanitize: Boolean = false): DataFrame = {
    val raw = spark.read.text(path)
    val bounds = starts.zip(starts.drop(1).map(Some(_)) :+ None)
    val cols = bounds.zipWithIndex.map { case ((s, e), i) =>
      val c = e match {
        case Some(end) => trim(substring(col("value"), s + 1, end - s))
        case None => trim(col("value").substr(lit(s + 1), length(col("value")))) }
      c.as(s"column_${i + 1}")
    }
    val data0 = raw.select(cols: _*)
    val data1 = data0.filter(data0.columns.map(c => trim(col(c)) =!= "").reduce(_ || _))
    if (hasHeader) {
      val header = data1.head().toSeq.map(_.toString)
      // reference keeps raw trimmed header names (golden: 'News Paper')
      val named = if (names.nonEmpty) names
        else if (sanitize) Headers.sanitize(header) else Headers.dedupe(header)
      // drop the header row by value match (ordered-file semantics)
      val isHeader = data1.columns.zip(header).map { case (c, v) => col(c) === v }.reduce(_ && _)
      data1.filter(!isHeader).toDF(named: _*)
    } else if (names.nonEmpty) data1.toDF(names: _*) else data1
  }

  /** S5 read_json (io.py:1121-1157): NDJSON natively; array-JSON via
    * multiLine; inner `path` (e.g. "a.b") explodes a nested list. */
  def json(spark: SparkSession, path: String, newline: Boolean = false,
           innerPath: Option[String] = None): DataFrame = {
    val df = if (newline) spark.read.json(path)
      else spark.read.option("multiLine", true).json(path)
    innerPath match {
      case Some(p) => df.select(explode(col(p)).as("rec")).select(col("rec.*"))
      case None => df
    }
  }

  /** S7 read_yaml (io.py:1254-1287): list of maps, eager (like reference). */
  def yaml(spark: SparkSession, path: String): DataFrame = {
    val y = new org.yaml.snakeyaml.Yaml()
    val parsed = y.load[java.util.List[java.util.Map[String, Object]]](
      Encoding.readString(path))
    val rows = parsed.asScala.toSeq.map(_.asScala.toMap.map { case (k, v) =>
      k -> Option(v).map(_.toString).orNull })
    mapsToDf(spark, rows)
  }

  /** S8 read_html (io.py:1333-1431): `<table>` extraction via lenient regex
    * tag parsing; `tableIdx` selects the table, `<th>` rows become headers,
    * vertical tables (headers in first column) transpose. Eager. */
  def htmlTable(spark: SparkSession, path: String, tableIdx: Int = 0,
                vertical: Boolean = false, sanitize: Boolean = true): DataFrame = {
    val html = Encoding.readString(path)
    val tables = """(?is)<table[^>]*>(.*?)</table>""".r
      .findAllMatchIn(html).map(_.group(1)).toSeq
    require(tables.nonEmpty, s"no <table> found in $path")
    val t = tables(tableIdx)
    val rows = """(?is)<tr[^>]*>(.*?)</tr>""".r.findAllMatchIn(t).map(_.group(1)).toSeq
    def cells(row: String): Seq[String] =
      """(?is)<t[hd][^>]*>(.*?)</t[hd]>""".r.findAllMatchIn(row)
        .map(m => """(?s)<[^>]+>""".r.replaceAllIn(m.group(1), "").trim).toSeq
    val grid0 = rows.map(cells).filter(_.nonEmpty)
    val grid = if (vertical) grid0.transpose else grid0
    val rawNames = grid.head
    val names = if (sanitize) Headers.sanitize(rawNames) else Headers.dedupe(rawNames)
    seqsToDf(spark, grid.tail, names)
  }

  /** XML reader (capability uplift; BASELINE.json north star names XML):
    * one record per repeated `recordTag` element, child elements as
    * columns. Eager. */
  def xml(spark: SparkSession, path: String, recordTag: String): DataFrame = {
    val root = scala.xml.XML.loadString(Encoding.readString(path))
    val recs = (root \\ recordTag).map { node =>
      node.child.collect {
        case e: scala.xml.Elem => e.label -> e.text.trim
      }.toMap
    }
    mapsToDf(spark, recs)
  }

  /** S4 read_xls for .xlsx (io.py:1033-1118): xlsx is a zip of XML — parsed
    * driver-side with the JDK zip reader + scala-xml (no POI in this
    * environment; legacy binary .xls is a recorded gap). Cell types follow
    * the reference's stringification (sanitize_sheet io.py:963-1022):
    * shared strings resolved, numbers kept as text, dates ISO-rendered. */
  def xlsx(spark: SparkSession, path: String, sheet: Int = 0,
           sanitize: Boolean = true): DataFrame = {
    val zf = new java.util.zip.ZipFile(path)
    def entryText(name: String): Option[String] =
      Option(zf.getEntry(name)).map { e =>
        new String(zf.getInputStream(e).readAllBytes(), "UTF-8") }
    try {
      val shared: Vector[String] = entryText("xl/sharedStrings.xml").map { s =>
        (scala.xml.XML.loadString(s) \\ "si").map(si => (si \\ "t").map(_.text).mkString).toVector
      }.getOrElse(Vector.empty)
      val sheetXmlStr = entryText(s"xl/worksheets/sheet${sheet + 1}.xml")
        .getOrElse(throw new IllegalArgumentException(s"no sheet ${sheet + 1} in $path"))
      val sheetXml = scala.xml.XML.loadString(sheetXmlStr)
      val rows = (sheetXml \\ "row").map { r =>
        (r \ "c").map { c =>
          val t = (c \ "@t").text
          val v = (c \ "v").headOption.map(_.text)
            .orElse((c \ "is" \ "t").headOption.map(_.text)).getOrElse("")
          val colRef = (c \ "@r").text.takeWhile(_.isLetter)
          val idx = colRef.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
          (idx, if (t == "s" && v.nonEmpty) shared(v.toInt) else v)
        }
      }
      val width = rows.map(_.map(_._1).maxOption.getOrElse(-1)).maxOption.getOrElse(-1) + 1
      val grid = rows.map { cells =>
        val arr = Array.fill(width)("")
        cells.foreach { case (i, v) => if (i >= 0 && i < width) arr(i) = v }
        arr.toSeq
      }.filter(_.exists(_.nonEmpty))
      val names0 = grid.head
      val names = if (sanitize) Headers.sanitize(names0) else Headers.dedupe(names0)
      seqsToDf(spark, grid.tail, names)
    } finally zf.close()
  }

  /** S12 io.read: extension-dispatched universal reader (io.py:1617-1692). */
  def read(spark: SparkSession, path: String, ext: Option[String] = None): DataFrame = {
    val e = ext.getOrElse(path.split('.').last.toLowerCase)
    e match {
      case "csv" => csv(spark, path)
      case "tsv" => tsv(spark, path)
      case "json" => json(spark, path)
      case "ndjson" | "jsonl" => json(spark, path, newline = true)
      case "yml" | "yaml" => yaml(spark, path)
      case "html" | "htm" => htmlTable(spark, path)
      case "xml" => xml(spark, path, "record")
      case "xlsx" => xlsx(spark, path)
      case "xls" => XlsReader.read(spark, path)
      case "dbf" => DbfReader.read(spark, path)
      case "sqlite" => SqliteReader.read(spark, path)
      case "mdb" => MdbReader.read(spark, path)
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "geojson" => GeoJson.read(spark, path)
      case other => throw new IllegalArgumentException(s"unsupported extension $other")
    }
  }

  /** Server databases: the Spark-native capability is JDBC, with
    * partitioned reads for scale when a numeric partition column is known.
    * No drivers ship in this environment, so the facade is untested here.
    * The reference's file-database sources no longer need it: S9 mdb
    * ([[MdbReader]], Jet4 native) and S11 sqlite ([[SqliteReader]]) parse
    * their file formats directly. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionCol: Option[String] = None, lower: Long = 0L,
           upper: Long = 1000000L, numPartitions: Int = 8): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionCol.map(c => r.option("partitionColumn", c)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", numPartitions.toString))
      .getOrElse(r).load()
  }

  /** S13 io.join (io.py:1695-1722): csvstack — read many files, concat
    * ragged schemas with nulls. */
  def join(spark: SparkSession, paths: Seq[String], ext: Option[String] = None): DataFrame =
    Ops.concat(paths.map(p => read(spark, p, ext)))

  // ---- small helpers -------------------------------------------------------
  private def mapsToDf(spark: SparkSession, recs: Seq[Map[String, String]]): DataFrame = {
    val names = recs.foldLeft(Vector.empty[String]) { (acc, m) =>
      acc ++ m.keys.filterNot(acc.contains) }
    seqsToDf(spark, recs.map(m => names.map(n => m.get(n).orNull)), names)
  }

  private def seqsToDf(spark: SparkSession, rows: Seq[Seq[String]],
                       names: Seq[String]): DataFrame = {
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq), numSlices = 1)
    spark.createDataFrame(rdd, schema)
  }
}
