package graft
import org.apache.spark.sql.SparkSession
import graft.sources._

/** Manual end-to-end drive of the reader surface (verify harness; not a test). */
object DriveReaders {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fx = "src/test/resources/fixtures"
    println("CSV: " + Readers.csv(spark, s"$fx/test.csv").collect().toList)
    println("WINDOWED: " + Readers.csv(spark, s"$fx/test_bad.csv",
      Readers.CsvOptions(firstRow = 1, firstCol = 1)).collect().toList)
    println("UTF16: " + Readers.csv(spark, s"$fx/utf16_big.csv").collect().toList)
    println("FIXED: " + Readers.fixedWidth(spark, s"$fx/fixed_w_header.txt",
      Seq(0, 18, 29, 33, 38, 50), hasHeader = true).collect().toList)
    println("YAML: " + Readers.yaml(spark, s"$fx/test.yml").collect().toList)
    println("XLSX-DISPATCH: " + Readers.read(spark, s"$fx/test.htm").columns.toList)
    println("GEOJSON-OUT: " + GeoJson.collectionString(
      GeoJson.read(spark, s"$fx/points.geojson").drop("props")).take(220))
    try Readers.csv(spark, "/nope/missing.csv")
    catch { case e: Exception => println("PROBE-missing: " + e.getClass.getSimpleName) }
    try Readers.htmlTable(spark, s"$fx/test.xml")
    catch { case e: Exception => println("PROBE-notable: " + e.getMessage.take(50)) }
    spark.stop()
  }
}
