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

  test("latestState keeps the last change per key and tombstones deletes") {
    val feed = Seq(
      // user 1: insert then update -> last is the update payload
      (1L, 100L, 1L, "insert", "a", 1.0),
      (1L, 200L, 2L, "update", "b", 2.0),
      // user 2: last change is a delete -> key absent
      (2L, 100L, 3L, "insert", "c", 3.0),
      (2L, 300L, 4L, "delete", "c", 0.0),
      // user 3: delete then REVIVED by a later insert -> present
      (3L, 100L, 5L, "delete", "d", 0.0),
      (3L, 200L, 6L, "insert", "e", 5.0),
      // user 4: same ts, event_id breaks the tie -> id 8 wins
      (4L, 100L, 7L, "insert", "f", 6.0),
      (4L, 100L, 8L, "update", "g", 7.0)
    ).toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    val out = CdcRouter.latestState(feed, keyCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"))
      .select("user_id", "event_id", "op", "event_type", "value")
      .as[(Long, Long, String, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet === Set(1L, 3L, 4L))
    assert(out(1L) === ((2L, "update", "b", 2.0)))
    assert(out(3L) === ((6L, "insert", "e", 5.0)))
    assert(out(4L) === ((8L, "update", "g", 7.0)))
    // null order rows cannot be sequenced and are excluded
    val withNull = feed.unionByName(Seq((5L, Option.empty[Long], 9L,
        "insert", "h", 1.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value"))
    val out2 = CdcRouter.latestState(withNull, keyCols = Seq("user_id"),
      orderCols = Seq("ts", "event_id"))
    assert(!out2.select("user_id").as[Long].collect().contains(5L))
  }

  test("latestState is partitioning-independent (agg, not a window sort)") {
    val feed = (1 to 500).map { i =>
      (i % 7L, i.toLong, i.toLong, if (i % 11 == 0) "delete" else "update",
        s"t$i", i * 1.5)
    }.toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      CdcRouter.latestState(d, Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_id").as[(Long, Long)].collect()
        .sortBy(_._1).toSeq
    assert(run(feed) === run(feed.repartition(13)))
  }

  test("schemaDrift reports undeclared payload columns with first-seen id") {
    import org.apache.spark.sql.functions._
    val config = Seq(("t1", "insert", "kafka", "s1", "id,name"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns")
    // change 3 is where upstream's ALTER adds `age` to t1
    val rows = Seq(
      (1L, "t1", Map("id" -> "1", "name" -> "a")),
      (2L, "t1", Map("id" -> "2", "name" -> "b")),
      (3L, "t1", Map("id" -> "3", "name" -> "c", "age" -> "9")),
      (4L, "t1", Map("id" -> "4", "age" -> "8")),
      (5L, "t2", Map("id" -> "5"))
    ).toDF("id", "tableName", "after")
    val out = CdcRouter.schemaDrift(rows, config)
      .select("source_table", "column_name", "ct", "first_seen",
        "is_declared")
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(out === Set(
      ("t1", "id", 4L, 1L, true),
      ("t1", "name", 3L, 1L, true),
      ("t1", "age", 2L, 3L, false), // the drift row
      ("t2", "id", 1L, 5L, false))) // whole table undeclared
  }

  test("streaming drift maintenance == batch report, replay-safe") {
    import org.apache.spark.sql.functions._
    val config = Seq(("t1", "insert", "kafka", "s1", "id,name"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable",
        "sinkColumns")
    val b0 = Seq((1L, "t1", Map("id" -> "1", "name" -> "a")),
      (2L, "t1", Map("id" -> "2", "name" -> "b")))
    val b1 = Seq((3L, "t1", Map("id" -> "3", "age" -> "9")),
      (4L, "t2", Map("id" -> "4")))
    val root = java.nio.file.Files.createTempDirectory("drift").toString
    def dfOf(rows: Seq[(Long, String, Map[String, String])]) =
      rows.toDF("id", "tableName", "after")
    CdcRouter.schemaDriftMergeBatch(spark, dfOf(b0), root, batchId = 0L)
    CdcRouter.schemaDriftMergeBatch(spark, dfOf(b1), root, batchId = 1L)
    // crash-replay of batch 1: ct must not double, first_seen stable
    CdcRouter.schemaDriftMergeBatch(spark, dfOf(b1), root, batchId = 1L)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("source_table", "column_name", "ct", "first_seen",
        "is_declared")
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    val served = canon(CdcRouter.schemaDriftServe(spark, root, config))
    val batch = canon(CdcRouter.schemaDrift(dfOf(b0 ++ b1), config))
    assert(served === batch)
    assert(served.contains(("t1", "age", 1L, 3L, false)))
  }
}
