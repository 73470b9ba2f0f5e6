package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.plans.Bucketing

/** Plan-shape proof of the bucketing story: pre-bucketed tables join with
  * zero shuffle exchanges, where the identical join over raw parquet
  * exchanges both sides. Results are identical either way (bucketing moves
  * work, never answers).
  *
  * The bucketed tables are a shared beforeAll fixture so every test stands
  * alone — a single-test run (or a shuffled execution order) must not fail
  * with TABLE_OR_VIEW_NOT_FOUND.
  */
class BucketingSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Bucketing.writeBucketed(rawOrders, "orders_b", 8,
      Seq("o_orderkey"), Seq("o_orderkey"))
    Bucketing.writeBucketed(rawLineitem, "lineitem_b", 8,
      Seq("o_orderkey"), Seq("o_orderkey"))
  }

  private def rawOrders =
    spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def rawLineitem =
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("co-bucketed equi join runs with zero shuffle exchanges") {
    // force the shuffle-join path so the assertion is about co-location,
    // not about a broadcast hiding the exchange
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val bucketed = Bucketing.bucketedEquiJoin(spark, "lineitem_b", "orders_b",
        Seq("o_orderkey"))
      val raw = rawLineitem.join(rawOrders, Seq("o_orderkey"))

      assert(bucketed.count() == raw.count())
      assert(bucketed.count() > 0)

      assert(Bucketing.shuffleExchanges(bucketed) == 0,
        s"bucketed join should be exchange-free:\n${bucketed.queryExecution.executedPlan}")
      assert(Bucketing.shuffleExchanges(raw) >= 2,
        s"raw join should exchange both sides:\n${raw.queryExecution.executedPlan}")
    }
  }

  test("aggregation on the bucket key reuses the layout: zero exchanges") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = spark.table("lineitem_b").groupBy("o_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(24,6)")).as("qty"))
      assert(agg.count() > 0)
      assert(Bucketing.shuffleExchanges(agg) == 0,
        s"bucket-key aggregation should be exchange-free:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("bucketed results are identical to the raw-parquet join") {
    val a = Bucketing.bucketedEquiJoin(spark, "lineitem_b", "orders_b",
        Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy("o_orderkey").limit(20).collect().map(_.toSeq).toSeq
    val b = rawLineitem.join(rawOrders, Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy("o_orderkey").limit(20).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
