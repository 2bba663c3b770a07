package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r18 fanout guard: the gauge must be an exchange-free subtree —
  * probing a post-shuffle frame would eagerly materialize AQE stages
  * and silently pin a non-AQE plan (r17 verdict #4).
  */
class GraftFanoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fanout accepts narrow plans and preserves rows") {
    val df = (1L to 100L).toDF("id").filter(col("id") % 2 === 0)
    val out = Graft.fanout(df, col("id"))
    assert(out.count() === 50L)
    assert(out.rdd.getNumPartitions >=
      math.min(spark.sparkContext.defaultParallelism, 50))
  }

  test("fanout rejects a post-shuffle gauge instead of planning it eagerly") {
    val shuffled = (1L to 10L).toDF("id")
      .groupBy(col("id")).agg(count(lit(1)).as("c"))
    val e = intercept[IllegalArgumentException](Graft.fanout(shuffled))
    assert(e.getMessage.contains("exchange-free"))
  }

  test("fanoutGauged gauges the stream scan, not the broadcast-joined frame") {
    val big = (1L to 100L).toDF("id")
    val small = broadcast((1L to 10L).toDF("id"))
    val joined = big.join(small, Seq("id"), "left_semi")
    // gauge = the narrow stream side: accepted; result rows unchanged
    val out = Graft.fanoutGauged(joined, big, col("id"))
    assert(out.as[Long].collect().sorted === (1L to 10L).toArray)
  }
}
