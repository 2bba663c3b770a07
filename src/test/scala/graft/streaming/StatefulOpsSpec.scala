package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StatefulOps.KeyedEvent

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day1 = 1620000000000L // 2021-05-03
  private val day2 = day1 + 86400000L

  test("streaming UV dedup emits first event per mid per day, across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.uniqueVisitStreaming(
        StatefulOps.watermarked(input.toDS()))
      .writeStream.format("memory").queryName("uv_out")
      .outputMode("append").start()
    try {
      input.addData(
        KeyedEvent.at("m1", day1 + 10, "1", "home", null),
        KeyedEvent.at("m1", day1 + 20, "1", "detail", "home"),
        KeyedEvent.at("m2", day1 + 30, "1", "home", null))
      query.processAllAvailable()
      input.addData( // same day again + next day
        KeyedEvent.at("m1", day1 + 40, "1", "cart", "detail"),
        KeyedEvent.at("m1", day2 + 10, "1", "home", null))
      query.processAllAvailable()
      val out = spark.table("uv_out").as[KeyedEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSet ===
        Set(("m1", day1 + 10), ("m2", day1 + 30), ("m1", day2 + 10)))
    } finally query.stop()
  }

  test("streaming is_new fix corrects later-day claims, keeps first-day") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.isNewFixStreaming(input.toDS())
      .writeStream.format("memory").queryName("isnew_out")
      .outputMode("append").start()
    try {
      input.addData(KeyedEvent.at("m1", day1 + 10, "1", "home", null))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("m1", day2 + 10, "1", "home", null))
      query.processAllAvailable()
      val out = spark.table("isnew_out").as[KeyedEvent].collect()
        .map(e => (e.ts, e.is_new)).toMap
      assert(out(day1 + 10) === "1")
      assert(out(day2 + 10) === "0")
    } finally query.stop()
  }

  test("batch bounce detection: entry with no follow-up within gap") {
    val df = Seq(
      // m1: entry then quick follow-up (no bounce)
      ("m1", day1 + 1000L, null.asInstanceOf[String]),
      ("m1", day1 + 5000L, "home"),
      // m1: later entry with follow-up too late (bounce)
      ("m1", day1 + 100000L, null.asInstanceOf[String]),
      ("m1", day1 + 200000L, "home"),
      // m2: entry with nothing after (bounce)
      ("m2", day1 + 1000L, null.asInstanceOf[String])
    ).toDF("mid", "ts", "last_page_id")
    val bounces = StatefulOps.bounceBatch(df, gapMillis = 10000L)
      .select("mid", "ts").as[(String, Long)].collect().toSet
    assert(bounces === Set(("m1", day1 + 100000L), ("m2", day1 + 1000L)))
  }

  test("streaming bounce detection matches batch incl. watermark timeout flush") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(input.toDS()), gapMillis = 10000L)
      .writeStream.format("memory").queryName("bounce_out")
      .outputMode("append").start()
    try {
      input.addData(
        KeyedEvent.at("m1", day1 + 1000L, "1", "home", null),
        KeyedEvent.at("m1", day1 + 5000L, "1", "detail", "home"))
      query.processAllAvailable()
      input.addData(
        KeyedEvent.at("m1", day1 + 100000L, "1", "home", null),
        KeyedEvent.at("m1", day1 + 200000L, "1", "detail", "home"))
      query.processAllAvailable()
      // advance watermark far past m2's entry so the timeout fires
      input.addData(KeyedEvent.at("m2", day1 + 300000L, "1", "home", null))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("m3", day1 + 900000L, "1", "detail", "x"))
      query.processAllAvailable()
      val rows = spark.table("bounce_out").as[KeyedEvent].collect()
      val out = rows.map(e => (e.mid, e.ts)).toSet
      assert(out.contains(("m1", day1 + 100000L))) // in-stream bounce
      assert(out.contains(("m2", day1 + 300000L))) // timeout-flushed bounce
      // bounce rows are the original entry rows, dimensions intact
      // (batch/streaming equivalence covers the full row, not just keys)
      rows.filter(e => e.mid == "m1" || e.mid == "m2").foreach { e =>
        assert(e.is_new == "1" && e.page_id == "home" && e.event_time != null)
      }
    } finally query.stop()
  }
}
