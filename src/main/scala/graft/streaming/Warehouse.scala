package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.CdcRouter

/** The full warehouse topology — the reference's job graph
  * (ODS → DWD → DWM → DWS, SURVEY.md §0 dataflow) composed as one
  * transform over the two ODS inputs:
  *
  *   logLines (ods_base_log)  → LogSplit   → start/page/display (+dirty)
  *   cdcLines (ods_base_db)   → CdcRouter  → fact frames + dim frames
  *   order_info × order_detail → OrderWide (interval join + dim join)
  *   payment_info × order_wide → PaymentWide (interval join)
  *   page/uv/bounce/order/payment → the four DWS stats frames
  *
  * In the reference each arrow is a Kafka topic between separate Flink
  * jobs; here each arrow is a DataFrame handed to the next transform,
  * and topics appear only at the edges (sources/sinks). The composition
  * is lazy — Catalyst optimizes across layer boundaries (e.g. DWS
  * column pruning reaches the ODS scan), something the topic-separated
  * original cannot do.
  */
object Warehouse {

  /** Typed facts extracted from a routed CDC frame's string-map
    * payload. Column types follow the reference beans.
    */
  private def factFrame(routed: DataFrame, table: String,
                        cols: Map[String, DataType]): DataFrame = {
    val base = routed.filter(col("sinkTable") === s"dwd_$table")
    cols.foldLeft(base) { case (df, (name, dt)) =>
      // try_cast: a junk field value in one CDC payload must yield a
      // null column, not abort the whole job under ANSI mode (the
      // dead-letter gate only catches unparseable envelopes)
      df.withColumn(name, expr(s"try_cast(after['$name'] AS ${dt.sql})"))
    }.select(cols.keys.toSeq.map(col): _*)
  }

  private val money = DecimalType(16, 2)

  def run(spark: SparkSession, logLines: DataFrame, cdcLines: DataFrame,
          config: DataFrame): Map[String, DataFrame] = {

    // ---- DWD: log side ----------------------------------------------------
    val logOut = LogSplitJob.run(logLines)
    val page = logOut("page")

    // ---- DWD: db side (routing) ------------------------------------------
    val env = CdcRouter.parseEnvelope(cdcLines)
    val rows = env.filter(col("_corrupt").isNull).select(col("env.*"))
      .withColumn("type", CdcRouter.normalizeOp(col("type")))
    val alive = CdcRouter.filterDeletes(rows)
    val routed = CdcRouter.pruneColumns(CdcRouter.route(alive, config))

    val dims = routed.filter(col("sinkType") === "hbase")

    val orderInfo = factFrame(routed, "order_info", Map(
      "id" -> LongType, "province_id" -> LongType,
      "order_status" -> StringType, "user_id" -> LongType,
      "total_amount" -> money, "create_time" -> StringType))
    val orderDetail = factFrame(routed, "order_detail", Map(
      "id" -> LongType, "order_id" -> LongType, "sku_id" -> LongType,
      "sku_num" -> LongType, "split_total_amount" -> money,
      "create_time" -> StringType))
    val paymentInfo = factFrame(routed, "payment_info", Map(
      "id" -> LongType, "order_id" -> LongType, "user_id" -> LongType,
      "total_amount" -> money, "create_time" -> StringType))

    // dim frames: map payload → columns via the config allowlist
    def dimAsColumns(table: String, columns: Seq[String]): DataFrame =
      columns.foldLeft(dims.filter(col("sinkTable") === table)) {
        (df, c) => df.withColumn(c, col("after")(c))
      }.select(columns.map(col): _*)

    val dimFrames = Map(
      "dim_base_province" -> dimAsColumns("dim_base_province",
        Seq("id", "name", "area_code", "iso_code", "iso_3166_2")),
      "dim_user_info" -> dimAsColumns("dim_user_info",
        Seq("id", "birthday", "gender")),
      "dim_sku_info" -> dimAsColumns("dim_sku_info",
        Seq("id", "spu_id", "tm_id", "category3_id")))

    // ---- DWM ---------------------------------------------------------------
    val orderWide = WideJobs.orderWide(orderInfo, orderDetail, dimFrames)
    val paymentWide = WideJobs.paymentWide(paymentInfo, orderWide)

    // ---- DWS ---------------------------------------------------------------
    val pageFlat = page.select(
      col("common.mid").as("mid"), col("common.vc").as("vc"),
      col("common.ch").as("ch"), col("common.ar").as("ar"),
      col("common.is_new").as("is_new"), col("ts"),
      col("page.last_page_id").as("last_page_id"),
      col("page.during_time").as("during_time"))
    val pageForStats = pageFlat.select(
      col("vc"), col("ch"), col("ar"), col("is_new"),
      timestamp_millis(col("ts")).as("event_time"),
      lit(1L).as("pv_ct"),
      // entry predicate must match bounceBatch's (null OR empty), or a
      // window could report more bounces than session entries
      when(col("last_page_id").isNull || col("last_page_id") === "", 1L)
        .otherwise(0L).as("sv_ct"),
      coalesce(col("during_time"), lit(0L)).as("dur_sum"))
    // uv: first page event per mid per day (A5), contributing uv_ct
    val uvIn = pageFlat
      .withColumn("dt", to_date(timestamp_millis(col("ts"))))
      .groupBy(col("mid"), col("dt"))
      .agg(min(struct(col("ts"), col("vc"), col("ch"), col("ar"),
        col("is_new"))).as("f"))
      .select(col("f.vc").as("vc"), col("f.ch").as("ch"),
        col("f.ar").as("ar"), col("f.is_new").as("is_new"),
        timestamp_millis(col("f.ts")).as("event_time"), lit(1L).as("uv_ct"))
    // uj: bounced session entries (the CEP-shaped operator), uj_ct
    val ujIn = StatefulOps.bounceBatch(pageFlat)
      .select(col("vc"), col("ch"), col("ar"), col("is_new"),
        timestamp_millis(col("ts")).as("event_time"), lit(1L).as("uj_ct"))
    val visitorStats = StatsJobs.visitorStats(Seq(pageForStats, uvIn, ujIn))
    // full A2 surface: display + click + order + payment streams merge
    // into one keyed windowed aggregation
    // try_cast: a junk sku id (the log fixtures carry items like
    // "sku_2") must null out, not abort the run under ANSI mode
    val displayIn = logOut("display")
      .filter(col("item_type") === "sku_id")
      .select(expr("try_cast(item AS BIGINT)").as("sku_id"),
        timestamp_millis(col("ts")).as("event_time"),
        lit(1L).as("display_ct"))
    val clickIn = page
      .filter(col("page.item_type") === "sku_id" && col("page.item").isNotNull)
      .select(expr("try_cast(page.item AS BIGINT)").as("sku_id"),
        timestamp_millis(col("ts")).as("event_time"),
        lit(1L).as("click_ct"))
    val orderIn = orderWide.select(col("sku_id"),
      col("order_event_time").as("event_time"),
      col("sku_num").as("order_sku_num"),
      col("split_total_amount").as("order_amount"),
      col("order_id"))
    val paymentIn = paymentWide.select(col("sku_id"),
      col("payment_event_time").as("event_time"),
      col("split_total_amount").as("payment_amount"),
      col("order_id").as("paid_order_id"))
    val productStats = StatsJobs.productStatsFull(
      Seq(displayIn, clickIn, orderIn, paymentIn))
    val provinceStats = StatsJobs.provinceStats(spark,
      orderWide.withColumnRenamed("order_id", "wide_order_id"))
    val keywordStats = StatsJobs.keywordStats(
      page.withColumn("event_time", timestamp_millis(col("ts"))))
    // true gap sessions per device (generalizes the reference's
    // last_page_id-entry heuristic; 30 min = the classic web gap)
    val sessions = StatsJobs.sessionStats(
      pageFlat.withColumn("event_time", timestamp_millis(col("ts"))),
      keyCol = "mid", tsCol = "event_time", gap = "30 minutes",
      extraAggs = Seq(sum(coalesce(col("during_time"), lit(0L))).as("dur_sum")))

    Map(
      "dirty" -> logOut("dirty"), "start" -> logOut("start"),
      "page" -> page, "display" -> logOut("display"),
      "order_wide" -> orderWide, "payment_wide" -> paymentWide,
      "visitor_stats" -> visitorStats, "product_stats" -> productStats,
      "province_stats" -> provinceStats, "keyword_stats" -> keywordStats,
      "sessions" -> sessions)
  }
}
