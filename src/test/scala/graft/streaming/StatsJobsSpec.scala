package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatsJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = "2021-05-03 12:00:03"
  private val t1 = "2021-05-03 12:00:07"
  private val t2 = "2021-05-03 12:00:13" // next 10s window

  private def withEventTime(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("event_time", to_timestamp(col("t")))

  test("visitorStats unions marker streams and aggregates per window") {
    val pv = withEventTime(Seq(
      ("v1", "web", "110000", "1", t0, 1L, 1000L),
      ("v1", "web", "110000", "1", t1, 1L, 2000L),
      ("v1", "web", "110000", "1", t2, 1L, 3000L)
    ).toDF("vc", "ch", "ar", "is_new", "t", "pv_ct", "dur_sum"))
    val uv = withEventTime(Seq(
      ("v1", "web", "110000", "1", t0, 1L)
    ).toDF("vc", "ch", "ar", "is_new", "t", "uv_ct"))
    val out = StatsJobs.visitorStats(Seq(pv, uv))
      .select("stt", "pv_ct", "uv_ct", "dur_sum")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("2021-05-03 12:00:00", 2L, 1L, 3000L),
      ("2021-05-03 12:00:10", 1L, 0L, 3000L)))
  }

  test("sessionStats merges events within the gap; batch equals streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Seq(
      ("u1", "2021-05-03 12:00:00"), // session 1: 3 events, 30s apart
      ("u1", "2021-05-03 12:00:30"),
      ("u1", "2021-05-03 12:01:00"),
      ("u1", "2021-05-03 12:10:00"), // > 60s gap → session 2
      ("u2", "2021-05-03 12:00:10")  // separate key
    )
    val batchDf = events.toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t")))
    val batch = StatsJobs.sessionStats(batchDf, gap = "60 seconds")
      .select(col("user_id"), date_format(col("stt"), "HH:mm:ss").as("s"),
        date_format(col("edt"), "HH:mm:ss").as("e"), col("ev_ct"))
      .as[(String, String, String, Long)].collect().toSet
    assert(batch === Set(
      ("u1", "12:00:00", "12:02:00", 3L),
      ("u1", "12:10:00", "12:11:00", 1L),
      ("u2", "12:00:10", "12:01:10", 1L)))

    // streaming twin: same plan incrementalizes; sessions close (and
    // emit, in append mode) once the watermark passes last_ts + gap
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val stream = StatsJobs.sessionStats(
      input.toDF().toDF("user_id", "t")
        .withColumn("ts", to_timestamp(col("t")))
        .withWatermark("ts", "0 seconds"),
      gap = "60 seconds")
    val query = stream.writeStream.format("memory")
      .queryName("session_out").outputMode("append").start()
    try {
      input.addData(events.take(3))
      query.processAllAvailable()
      input.addData(events.drop(3)) // 12:10 watermark closes session 1
      query.processAllAvailable()
      input.addData(("u3", "2021-05-03 13:00:00")) // close the rest
      query.processAllAvailable()
      val streamed = spark.table("session_out")
        .select(col("user_id"), date_format(col("stt"), "HH:mm:ss").as("s"),
          date_format(col("edt"), "HH:mm:ss").as("e"), col("ev_ct"))
        .as[(String, String, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("visitorStats streams: union of marker streams aggregates per window in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // two independent marker streams (page views + unique visits),
    // unioned THEN watermarked — the A1 shape from the Warehouse
    val pvIn = MemoryStream[(String, String, String, String, String, Long, Long)]
    val uvIn = MemoryStream[(String, String, String, String, String, Long)]
    val pv = pvIn.toDF()
      .toDF("vc", "ch", "ar", "is_new", "t", "pv_ct", "dur_sum")
    val uv = uvIn.toDF().toDF("vc", "ch", "ar", "is_new", "t", "uv_ct")
    def wm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("event_time", to_timestamp(col("t")))
        .withWatermark("event_time", "0 seconds")
    val query = StatsJobs.visitorStats(Seq(wm(pv), wm(uv)))
      .writeStream.format("memory").queryName("vs_stream")
      .outputMode("append").start()
    try {
      pvIn.addData(("v1", "web", "110000", "1", t0, 1L, 1000L),
        ("v1", "web", "110000", "1", t1, 1L, 2000L))
      uvIn.addData(("v1", "web", "110000", "1", t0, 1L))
      query.processAllAvailable()
      // advance the watermark on BOTH streams past the first window
      pvIn.addData(("v1", "web", "110000", "1", "2021-05-03 12:05:00", 1L, 0L))
      uvIn.addData(("v1", "web", "110000", "1", "2021-05-03 12:05:00", 1L))
      query.processAllAvailable()
      val out = spark.table("vs_stream")
        .select("stt", "pv_ct", "uv_ct", "dur_sum")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(out.contains(("2021-05-03 12:00:00", 2L, 1L, 3000L)))
    } finally query.stop()
  }

  test("productStats counts distinct orders per sku per window") {
    val ow = Seq(
      (100L, 1L, 2L, java.math.BigDecimal.valueOf(10.0), t0),
      (100L, 1L, 1L, java.math.BigDecimal.valueOf(5.0), t1),
      (100L, 2L, 3L, java.math.BigDecimal.valueOf(7.5), t1),
      (200L, 3L, 1L, java.math.BigDecimal.valueOf(9.0), t2)
    ).toDF("sku_id", "wide_order_id", "sku_num", "split_total_amount", "t")
      .withColumn("order_event_time", to_timestamp(col("t")))
    val out = StatsJobs.productStats(ow)
      .select("sku_id", "order_sku_num", "order_ct")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((100L, 6L, 2L), (200L, 1L, 1L)))
  }

  test("productStatsFull merges display/click/order/payment streams into one surface") {
    val display = Seq((100L, t0, 1L)).toDF("sku_id", "t", "display_ct")
      .withColumn("event_time", to_timestamp(col("t"))).drop("t")
    val click = Seq((100L, t0, 1L), (100L, t1, 1L))
      .toDF("sku_id", "t", "click_ct")
      .withColumn("event_time", to_timestamp(col("t"))).drop("t")
    val order = Seq(
      (100L, t0, 2L, java.math.BigDecimal.valueOf(40.0), 1L),
      (100L, t1, 1L, java.math.BigDecimal.valueOf(59.5), 1L))
      .toDF("sku_id", "t", "order_sku_num", "order_amount", "order_id")
      .withColumn("event_time", to_timestamp(col("t"))).drop("t")
    val payment = Seq(
      (100L, t1, java.math.BigDecimal.valueOf(99.5), 1L))
      .toDF("sku_id", "t", "payment_amount", "paid_order_id")
      .withColumn("event_time", to_timestamp(col("t"))).drop("t")

    val out = StatsJobs.productStatsFull(
        Seq(display, click, order, payment))
      .select("sku_id", "display_ct", "click_ct", "order_sku_num",
        "order_amount", "order_ct", "payment_amount", "paid_order_ct",
        "refund_order_ct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDecimal(4).doubleValue, r.getLong(5),
        r.getDecimal(6).doubleValue, r.getLong(7), r.getLong(8))).toSet
    assert(out === Set((100L, 1L, 2L, 3L, 99.5, 1L, 99.5, 1L, 0L)))
  }

  test("provinceStats SQL layer aggregates per province per window") {
    val ow = Seq(
      (2L, "Beijing", 1L, java.math.BigDecimal.valueOf(10.0), t0),
      (2L, "Beijing", 1L, java.math.BigDecimal.valueOf(20.0), t1),
      (3L, "Shanghai", 2L, java.math.BigDecimal.valueOf(5.0), t0)
    ).toDF("province_id", "province_name", "wide_order_id",
        "split_total_amount", "t")
      .withColumn("order_event_time", to_timestamp(col("t")))
    val out = StatsJobs.provinceStats(spark, ow)
      .select("province_name", "order_amount", "order_count")
      .collect().map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2)))
      .toSet
    assert(out === Set(("Beijing", 30.0, 1L), ("Shanghai", 5.0, 1L)))
  }

  test("keywordStats segments CJK search items via the dictionary UDF") {
    val pages = Seq(("尚硅谷大数据", "keyword", t0))
      .toDF("item", "item_type", "t")
      .withColumn("page", struct(col("item"), col("item_type")))
      .withColumn("event_time", to_timestamp(col("t")))
    val out = StatsJobs.keywordStats(pages)
      .select("keyword", "ct").as[(String, Long)].collect().toSet
    assert(out === Set(("尚硅谷", 1L), ("大数据", 1L)))
  }

  test("keywordStats tokenizes search items and counts per window") {
    val pages = Seq(
      ("big data spark", "keyword", t0),
      ("spark", "keyword", t1),
      ("sku_9", "sku_id", t1) // not a search: excluded
    ).toDF("item", "item_type", "t")
      .withColumn("page", struct(col("item"), col("item_type")))
      .withColumn("event_time", to_timestamp(col("t")))
    val out = StatsJobs.keywordStats(pages)
      .select("keyword", "ct").as[(String, Long)].collect().toSet
    assert(out === Set(("big", 1L), ("data", 1L), ("spark", 2L)))
  }
}
