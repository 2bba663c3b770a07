package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end warehouse flow over hand-built ODS fixtures: log lines
  * (incl. dirty) + CDC envelopes (facts at interval-join boundaries +
  * dims + a delete) through every layer to the four stats outputs.
  */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def log(mid: String, ts: Long, lastPage: String, item: String = null) = {
    val last = Option(lastPage).map(p => s""""last_page_id":"$p",""").getOrElse("")
    val it = Option(item)
      .map(i => s""""item":"$i","item_type":"keyword",""").getOrElse("")
    s"""{"common":{"mid":"$mid","uid":"u_$mid","is_new":"1","vc":"v1","ch":"web","ar":"110000","ba":"X","md":"M","os":"A"},"page":{"page_id":"home",$last$it"during_time":5000},"ts":$ts}"""
  }

  private def cdc(table: String, tpe: String, after: (String, String)*) = {
    val kv = after.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","tableName":"$table","before":{},"after":{$kv},"type":"$tpe"}"""
  }

  private val t0 = 1620043200000L // 2021-05-03 12:00:00 UTC

  test("full ODS→DWS flow produces consistent layer outputs") {
    val logLines = Seq(
      log("mid_1", t0, null, "big data"),
      log("mid_1", t0 + 4000, "home"),
      log("mid_2", t0 + 1000, null),
      "garbage not json"
    ).toDF("value")

    val cdcLines = Seq(
      cdc("order_info", "insert", "id" -> "1", "province_id" -> "2",
        "order_status" -> "1001", "user_id" -> "10",
        "total_amount" -> "99.50", "create_time" -> "2021-05-03 12:00:10"),
      // details at −5s and +5s (both in) and +6s (out)
      cdc("order_detail", "insert", "id" -> "11", "order_id" -> "1",
        "sku_id" -> "100", "sku_num" -> "2", "split_total_amount" -> "40.00",
        "create_time" -> "2021-05-03 12:00:05"),
      cdc("order_detail", "insert", "id" -> "12", "order_id" -> "1",
        "sku_id" -> "100", "sku_num" -> "1", "split_total_amount" -> "59.50",
        "create_time" -> "2021-05-03 12:00:15"),
      cdc("order_detail", "insert", "id" -> "13", "order_id" -> "1",
        "sku_id" -> "101", "sku_num" -> "9", "split_total_amount" -> "1.00",
        "create_time" -> "2021-05-03 12:00:16"),
      // payment 10 minutes after the order (in window)
      cdc("payment_info", "insert", "id" -> "21", "order_id" -> "1",
        "user_id" -> "10", "total_amount" -> "99.50",
        "create_time" -> "2021-05-03 12:10:00"),
      // dims
      cdc("base_province", "insert", "id" -> "2", "name" -> "Beijing",
        "area_code" -> "110000", "iso_code" -> "CN-11",
        "iso_3166_2" -> "CN-BJ"),
      cdc("user_info", "create", "id" -> "10", "birthday" -> "1990-05-03",
        "gender" -> "F"),
      cdc("sku_info", "insert", "id" -> "100", "spu_id" -> "7",
        "tm_id" -> "8", "category3_id" -> "9"),
      // a delete that must be dropped, an unrouted table that must drop
      cdc("order_info", "delete", "id" -> "1"),
      cdc("unrouted_table", "insert", "id" -> "5")
    ).toDF("value")

    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info",
        "id,province_id,order_status,user_id,total_amount,create_time"),
      ("order_detail", "insert", "kafka", "dwd_order_detail",
        "id,order_id,sku_id,sku_num,split_total_amount,create_time"),
      ("payment_info", "insert", "kafka", "dwd_payment_info",
        "id,order_id,user_id,total_amount,create_time"),
      ("base_province", "insert", "hbase", "dim_base_province",
        "id,name,area_code,iso_code,iso_3166_2"),
      ("user_info", "insert", "hbase", "dim_user_info",
        "id,birthday,gender"),
      ("sku_info", "insert", "hbase", "dim_sku_info",
        "id,spu_id,tm_id,category3_id")
    ).toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")

    val out = Warehouse.run(spark, logLines, cdcLines, config)

    // DWD log layer
    assert(out("dirty").count() === 1)
    assert(out("page").count() === 3)

    // DWM: interval join keeps the ±5s details only, enriched with dims
    val ow = out("order_wide")
    val owRows = ow.select("detail_id", "province_name", "user_gender",
      "user_age", "spu_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4))).toSet
    assert(owRows === Set(
      (11L, "Beijing", "F", 31, "7"),
      (12L, "Beijing", "F", 31, "7")))

    // PaymentWide: the payment matches both wide rows
    assert(out("payment_wide").count() === 2)

    // DWS: visitor stats in window [12:00:00,12:00:10): 3 page views,
    // 2 session entries, 2 unique visitors, 1 bounce (mid_2's lone
    // entry; mid_1's follow-up came 4s later, inside the gap)
    val vs = out("visitor_stats")
      .select("pv_ct", "sv_ct", "uv_ct", "uj_ct", "dur_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(vs === Set((3L, 2L, 2L, 1L, 15000L)))

    // product stats (full surface): the order window row carries the
    // order measures; the payment at 12:10 lands in its own window with
    // the payment measures
    val ps = out("product_stats")
      .select("stt", "sku_id", "order_sku_num", "order_ct",
        "payment_amount", "paid_order_ct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDecimal(4).doubleValue, r.getLong(5))).toSet
    assert(ps === Set(
      ("2021-05-03 12:00:10", 100L, 3L, 1L, 0.0, 0L),
      ("2021-05-03 12:10:00", 100L, 0L, 0L, 99.5, 1L)))

    // province stats: one order, 99.50 total across the two split rows
    val prs = out("province_stats")
      .select("province_name", "order_amount", "order_count").collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2)))
      .toSet
    assert(prs === Set(("Beijing", 99.50, 1L)))

    // keyword stats: "big data" tokenized from the search page
    val ks = out("keyword_stats").select("keyword", "ct")
      .as[(String, Long)].collect().toSet
    assert(ks === Set(("big", 1L), ("data", 1L)))

    // sessions: all page events are within the 30min gap → one session
    // per device (mid_1's two views merge; mid_2's lone view stands)
    val ss = out("sessions").select("mid", "ev_ct")
      .as[(String, Long)].collect().toSet
    assert(ss === Set(("mid_1", 2L), ("mid_2", 1L)))
  }
}
