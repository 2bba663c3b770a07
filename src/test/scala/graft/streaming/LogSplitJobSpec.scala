package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LogSplitJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val startLog =
    """{"common":{"mid":"mid_1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"110000","ba":"X","md":"M","os":"A"},
      |"start":{"entry":"icon","open_ad_id":1,"loading_time":1500,"open_ad_ms":1200,"open_ad_skip_ms":0},
      |"ts":1620000000000}""".stripMargin.replaceAll("\n", "")

  private val pageLog =
    """{"common":{"mid":"mid_1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"110000","ba":"X","md":"M","os":"A"},
      |"page":{"page_id":"good_detail","last_page_id":"home","during_time":12000,"item":"sku_1","item_type":"sku_id"},
      |"displays":[{"item":"sku_2","item_type":"sku_id","display_type":"promotion","order":1,"pos_id":3},
      |            {"item":"sku_3","item_type":"sku_id","display_type":"query","order":2,"pos_id":4}],
      |"ts":1620086400000}""".stripMargin.replaceAll("\n", "")

  private val dirtyLine = "this is not json at all {{{"

  private def raw = Seq(startLog, pageLog, dirtyLine).toDF("value")

  test("parse splits clean vs dead-letter") {
    val (clean, dirty) = LogSplitJob.parse(raw)
    assert(clean.count() === 2)
    assert(dirty.as[String].collect().toSeq === Seq(dirtyLine))
  }

  test("3-way split routes start/page and explodes displays with parent stamps") {
    val out = LogSplitJob.run(raw)
    assert(out("start").count() === 1)
    assert(out("page").count() === 1)
    val disp = out("display")
      .select("page_id", "item", "ts").as[(String, String, Long)]
      .collect().toSet
    assert(disp === Set(
      ("good_detail", "sku_2", 1620086400000L),
      ("good_detail", "sku_3", 1620086400000L)))
  }

  test("is_new fix rewrites later-day claims to 0 but keeps first day") {
    // same mid on two days, both claiming is_new=1
    val (clean, _) = LogSplitJob.parse(raw)
    val fixed = LogSplitJob.isNewFixBatch(clean)
      .select($"ts", $"common.is_new".as[String])
      .collect().map { r => (r.getLong(0), r.getString(1)) }.toMap
    assert(fixed(1620000000000L) === "1") // first day keeps claim
    assert(fixed(1620086400000L) === "0") // next day corrected
  }
}
