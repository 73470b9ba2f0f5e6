package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment harness (not a test). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$sf/lineitem.parquet").repartition(32)
    val q = li.filter(col("l_returnflag") === "R")
      .select(col("l_partkey"), col("l_quantity"))
      .groupBy("l_partkey").agg(sum("l_quantity"))
    println(q.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
  }
}
