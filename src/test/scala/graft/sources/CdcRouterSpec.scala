package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CdcRouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val envelopes = Seq(
    """{"database":"gmall","tableName":"order_info","before":{},"after":{"id":"1","user_id":"7","total_amount":"99.50","secret":"x"},"type":"insert"}""",
    """{"database":"gmall","tableName":"order_info","before":{"id":"2"},"after":{},"type":"delete"}""",
    """{"database":"gmall","tableName":"base_province","before":{},"after":{"id":"3","name":"Beijing"},"type":"create"}""",
    """not valid json"""
  ).toDF("value")

  private val config = Seq(
    ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount"),
    ("base_province", "insert", "hbase", "dim_base_province", "id,name")
  ).toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")

  test("envelope parse keeps dead letters; normalize + delete filter + route + prune") {
    val parsed = CdcRouter.parseEnvelope(envelopes)
    assert(parsed.filter(col("_corrupt").isNotNull).count() === 1)

    val rows = parsed.filter(col("_corrupt").isNull)
      .select(col("env.*"))
      .withColumn("type", CdcRouter.normalizeOp(col("type")))
    val alive = CdcRouter.filterDeletes(rows)
    assert(alive.count() === 2) // delete dropped, create→insert kept

    val routed = CdcRouter.route(alive, config)
    assert(routed.count() === 2)

    val pruned = CdcRouter.pruneColumns(routed)
    val orderAfter = pruned.filter(col("sinkTable") === "dwd_order_info")
      .select(col("after")).as[Map[String, String]].head()
    assert(orderAfter === Map("id" -> "1", "user_id" -> "7",
      "total_amount" -> "99.50")) // 'secret' pruned by allowlist
    val kafkaSide = pruned.filter(col("sinkType") === "kafka").count()
    val hbaseSide = pruned.filter(col("sinkType") === "hbase").count()
    assert(kafkaSide === 1 && hbaseSide === 1)
  }
}
