package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}

/** Isolate where the events-table queries spend time:
  * `sbt "runMain graft.tools.ProfileEvents <sfDir>"`.
  */
object ProfileEvents {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("profile-events")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ev = Tables.events(spark, dir)
    (1 to 3).foreach(i => time(s"events.count $i")(ev.count()))
    (1 to 3).foreach(i => time(s"groupBy(event_type).count $i")(
      ev.groupBy(col("event_type")).count().count()))
    (1 to 3).foreach(i => time(s"countDistinct(user_id) $i")(
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"))).count()))
    val k = expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    (1 to 3).foreach(i => time(s"json k agg $i")(
      ev.select(k.as("k")).groupBy((col("k") % 10).as("m")).count().count()))
    val opTable = Array("update", "update", "delete", "create",
      "insert", "insert", "insert", "insert", "insert", "insert")
    val idx = when(k >= 0, (k % 10 + 1).cast("int")).when(k < 0, lit(1))
    val op = coalesce(element_at(lit(opTable), idx), lit("insert"))
    (1 to 3).foreach(i => time(s"opCol groupBy $i")(
      ev.select(op.as("op")).groupBy(col("op")).count().count()))
    // same op derived from a k parsed exactly once (aggregate on k's
    // remainder, map op afterwards over the tiny grouped result)
    val r = (k % 10).as("r")
    val idx2 = when(col("r") >= 0, (col("r") + 1).cast("int"))
      .when(col("r") < 0, lit(1))
    val op2 = coalesce(element_at(lit(opTable), idx2), lit("insert"))
    (1 to 3).foreach(i => time(s"post-agg op groupBy $i")(
      ev.select(r).groupBy(col("r")).count()
        .select(op2.as("op"), col("count")).groupBy(col("op"))
        .agg(sum(col("count"))).count()))
    // r2 decomposition: op + filter, then broadcast config join + agg
    import graft.sources.CdcRouter
    import spark.implicits._
    val config = Seq(
      ("view", "insert", "kafka", "dwd_page_view", "event_id,user_id,value"),
      ("view", "update", "kafka", "dwd_page_view", "event_id,user_id,value"),
      ("click", "insert", "kafka", "dwd_click", "event_id,user_id"),
      ("purchase", "insert", "hbase", "dim_purchase", "event_id,user_id,value"),
      ("purchase", "update", "hbase", "dim_purchase", "event_id,user_id,value"),
      ("signup", "insert", "hbase", "dim_user", "event_id,user_id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")
    val rows = CdcRouter.filterDeletes(
      ev.withColumn("op", CdcRouter.normalizeOp(op)), "op")
    (1 to 3).foreach(i => time(s"r2 filter only $i")(rows.count()))
    (1 to 3).foreach(i => time(s"r2 joined $i")(
      CdcRouter.route(rows, config, tableCol = "event_type", opCol = "op").count()))
    (1 to 3).foreach(i => time(s"r2 full $i")(
      CdcRouter.route(rows, config, tableCol = "event_type", opCol = "op")
        .groupBy(col("sinkType"), col("sinkTable"))
        .agg(count(lit(1)).as("ct")).count()))
    spark.stop()
  }
}
