package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WideJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // order at 12:00:10; details at the ±5s boundary and beyond
  private def orderInfo = Seq(
    (1L, 2L, "1001", 10L, "2021-05-03 12:00:10")
  ).toDF("id", "province_id", "order_status", "user_id", "create_time")

  private def orderDetail = Seq(
    (11L, 1L, 100L, "2021-05-03 12:00:05", 2L, java.math.BigDecimal.valueOf(10.00)), // exactly −5s: in
    (12L, 1L, 101L, "2021-05-03 12:00:15", 1L, java.math.BigDecimal.valueOf(20.00)), // exactly +5s: in
    (13L, 1L, 102L, "2021-05-03 12:00:16", 3L, java.math.BigDecimal.valueOf(30.00)), // +6s: out
    (14L, 1L, 103L, "2021-05-03 12:00:04", 4L, java.math.BigDecimal.valueOf(40.00)), // −6s: out
    (15L, 2L, 104L, "2021-05-03 12:00:10", 5L, java.math.BigDecimal.valueOf(50.00))  // wrong key: out
  ).toDF("id", "order_id", "sku_id", "create_time", "sku_num", "split_total_amount")

  test("interval join honors inclusive ±5s bounds and the equi key") {
    val wide = WideJobs.orderWide(orderInfo, orderDetail)
    assert(wide.select("detail_id").as[Long].collect().toSet === Set(11L, 12L))
  }

  test("dim enrichment fills province/user/sku columns via broadcast joins") {
    val dims = Map(
      "dim_base_province" -> Seq(("2", "Beijing", "110000", "CN-11", "CN-BJ"))
        .toDF("id", "name", "area_code", "iso_code", "iso_3166_2"),
      "dim_user_info" -> Seq(("10", "1990-05-03", "M"))
        .toDF("id", "birthday", "gender"),
      "dim_sku_info" -> Seq(("100", 7L, 8L, 9L), ("101", 7L, 8L, 9L))
        .toDF("id", "spu_id", "tm_id", "category3_id"),
      "dim_spu_info" -> Seq((7L, "spu seven")).toDF("id", "spu_name"),
      "dim_base_trademark" -> Seq((8L, "brand eight")).toDF("id", "tm_name"),
      "dim_base_category3" -> Seq((9L, "cat nine")).toDF("id", "name"))
    val wide = WideJobs.orderWide(orderInfo, orderDetail, dims)
    val row = wide.filter($"detail_id" === 11L)
      .select("province_name", "user_gender", "user_age", "spu_name",
        "tm_name", "category3_name")
      .collect().head
    assert(row.getString(0) === "Beijing")
    assert(row.getString(1) === "M")
    assert(row.getInt(2) === 31) // 1990-05-03 → 2021-05-03
    assert(row.getString(3) === "spu seven")
    assert(row.getString(4) === "brand eight")
    assert(row.getString(5) === "cat nine")
  }

  test("paymentWide honors the asymmetric [−15min, +5s] window") {
    val ow = WideJobs.orderWide(orderInfo, orderDetail)
    val payments = Seq(
      (21L, 1L, 10L, "2021-05-03 12:10:00"), // order 10 min earlier: in
      (22L, 1L, 10L, "2021-05-03 12:16:00"), // order 15:50 earlier: out (>15min)
      (23L, 1L, 10L, "2021-05-03 12:00:05")  // order 5s later: in (+5s bound)
    ).toDF("id", "order_id", "user_id", "create_time")
    val pw = WideJobs.paymentWide(payments, ow)
    // each in-window payment matches the 2 joined details of order 1
    val ids = pw.select("payment_id").as[Long].collect()
    assert(ids.count(_ == 21L) === 2)
    assert(ids.count(_ == 23L) === 2)
    assert(!ids.contains(22L))
  }
}
