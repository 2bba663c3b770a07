package graft.tools

import graft.core.Graft
import graft.streaming.Warehouse

/** Minimal end-to-end sample of the library's public API: two ODS
  * inputs + a routing config in, all warehouse layers out. Run with
  * `sbt "runMain graft.tools.WarehouseDemo"`.
  */
object WarehouseDemo {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("warehouse-demo", "4")
    import spark.implicits._

    val logs = Seq(
      """{"common":{"mid":"m1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"1","ba":"X","md":"M","os":"A"},"page":{"page_id":"home","during_time":5,"item":"spark engine","item_type":"keyword"},"ts":1620043200000}""",
      """{"common":{"mid":"m2","uid":"u2","is_new":"1","vc":"v1","ch":"app","ar":"1","ba":"X","md":"M","os":"A"},"page":{"page_id":"home","during_time":3,"item":"尚硅谷大数据","item_type":"keyword"},"ts":1620043201000}""",
      "junk").toDF("value")
    val cdc = Seq(
      """{"database":"g","tableName":"order_info","before":{},"after":{"id":"1","province_id":"2","order_status":"1001","user_id":"10","total_amount":"5.00","create_time":"2021-05-03 12:00:00"},"type":"insert"}""",
      """{"database":"g","tableName":"order_detail","before":{},"after":{"id":"11","order_id":"1","sku_id":"100","sku_num":"1","split_total_amount":"5.00","create_time":"2021-05-03 12:00:01"},"type":"insert"}""")
      .toDF("value")
    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info",
        "id,province_id,order_status,user_id,total_amount,create_time"),
      ("order_detail", "insert", "kafka", "dwd_order_detail",
        "id,order_id,sku_id,sku_num,split_total_amount,create_time"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")

    val out = Warehouse.run(spark, logs, cdc, config)
    println("LAYERS=" + out.keys.toSeq.sorted.mkString(","))
    println("ORDER_WIDE_ROWS=" + out("order_wide").count())
    println("KEYWORDS=" + out("keyword_stats")
      .select("keyword").as[String].collect().sorted.mkString("|"))
    println("DIRTY=" + out("dirty").count())
    spark.stop()
  }
}
