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
    // the REAL query expression (not a copy — a drifting copy would
    // profile a different plan than the queries run)
    val op = graft.queries.RoutingOps.opCol
    (1 to 3).foreach(i => time(s"opCol groupBy $i")(
      ev.select(op.as("op")).groupBy(col("op")).count().count()))
    // r2 decomposition: op + filter, then broadcast config join + agg
    import graft.sources.CdcRouter
    val config = graft.queries.RoutingOps.configDf(spark)
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
