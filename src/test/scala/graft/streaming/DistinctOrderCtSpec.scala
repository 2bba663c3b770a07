package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

object DistinctOrderCtSpec {
  case class Ord(sku_id: Long, order_id: Long, ts: Long,
                 event_time: Timestamp = null)
}

/** Pins the streaming-exact distinct-order-count chain the warehouse
  * deployment's product_order_ct query uses: keyed
  * dropDuplicatesWithinWatermark feeding a windowed count — repeated
  * detail lines for one (sku, order) count ONCE, and the chain (two
  * stateful operators) is supported and watermark-correct.
  */
class DistinctOrderCtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import DistinctOrderCtSpec.Ord

  private def o(sku: Long, ord: Long, ts: Long): Ord =
    Ord(sku, ord, ts, new Timestamp(ts))
  private val t0 = 1620043200000L

  test("dropDuplicatesWithinWatermark chains into a windowed count") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ord]
    val deduped = input.toDF()
      .withWatermark("event_time", "2 minutes")
      .dropDuplicatesWithinWatermark("sku_id", "order_id")
    val agged = deduped
      .groupBy(window(col("event_time"), "10 seconds").as("w"), col("sku_id"))
      .agg(count(lit(1)).as("order_ct"))
      .select(col("w.start").as("stt"), col("sku_id"), col("order_ct"))
    val name = s"da_${System.nanoTime()}"
    val q = agged.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // order 1 has two detail rows for sku 5 -> must count ONCE
      input.addData(o(5, 1, t0 + 1000), o(5, 1, t0 + 2000),
        o(5, 2, t0 + 3000), o(9, 1, t0 + 4000))
      q.processAllAvailable()
      input.addData(o(1, 99, t0 + 90000000))
      q.processAllAvailable()
      input.addData(o(1, 98, t0 + 91000000))
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
      val got = spark.table(name)
        .selectExpr("unix_millis(stt)", "sku_id", "order_ct")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((t0, 5L, 2L), (t0, 9L, 1L),
        (t0 + 90000000, 1L, 1L)))
    } finally q.stop()
  }
}
