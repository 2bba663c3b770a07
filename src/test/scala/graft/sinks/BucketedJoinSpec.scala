package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the point of [[Sinks.writeBucketed]]: two tables bucketed on
  * the join key join with ZERO Exchange in the physical plan — the
  * write-once-shuffle-never contract that makes repeated fact/dim
  * joins affordable at scale.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed-bucketed equi-join runs without any Exchange") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"))
    val customer = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    Sinks.writeBucketed(orders.withColumnRenamed("o_custkey", "custkey"),
      "bj_orders", "custkey", buckets = 4)
    Sinks.writeBucketed(customer.withColumnRenamed("c_custkey", "custkey"),
      "bj_customer", "custkey", buckets = 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-class join so the assertion is about bucketing,
      // not about the dim being broadcastable at this fixture size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bj_orders")
        .join(spark.table("bj_customer"), Seq("custkey"))
      val plan = executedPlan(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
      // and the result is the plain join's result
      val expect = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("ct"))
        .as[(String, Long)].collect().sorted.toSeq
      val got = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("ct"))
        .as[(String, Long)].collect().sorted.toSeq
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_customer")
    }
  }

  test("bucketed aggregate on the bucket key also skips the exchange") {
    Sinks.writeBucketed(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_custkey").as("custkey"), col("o_totalprice")),
      "bj_agg", "custkey", buckets = 4)
    try {
      val agg = spark.table("bj_agg").groupBy("custkey")
        .agg(count(lit(1)).as("ct"))
      assert(!executedPlan(agg).contains("Exchange"),
        "groupBy on the bucket key must reuse the write-time partitioning")
      assert(agg.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS bj_agg")
  }
}
