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

  // -------------------------------------------------------------------------
  // Streaming deployment
  // -------------------------------------------------------------------------

  /** The warehouse as a CHECKPOINTED streaming deployment — the
    * reference's actual production shape (`app/dwd/BaseDbApp.java:30-36`
    * checkpoint configs; one Flink job per layer, connected by Kafka
    * topics). Here each layer is one Structured Streaming query with
    * its own checkpoint, and the topics are exactly-once parquet file
    * sinks that the next layer consumes as a file stream (the file
    * sink's `_spark_metadata` commit log IS the topic offset log). On
    * a cluster the dirs become Kafka topics / Delta tables; every
    * query restarts from its checkpoint with state intact.
    *
    * Topology (→ = a file "topic" under `outRoot`):
    *   logDir  → parse+split → page / start / display / dirty
    *   page    → isNewFixStreaming → page_fixed        (keyed state)
    *   page_fixed → uniqueVisitStreaming → unique_visit (keyed state)
    *   page_fixed → bounceStreaming → user_jump        (keyed state)
    *   page_fixed ∪ unique_visit ∪ user_jump → visitor_stats (window agg)
    *   page_fixed → sessions                     (native session_window)
    *   page    → keyword_stats            (window agg, CJK-capable UDF)
    *   cdcDir  → route → order_info / order_detail + dim upserts
    *   order_info  (+ dim_base_province) → province_stats (window agg)
    *     └ the same sealed windows → province_rollup (ADS additive MERGE)
    *   display ∪ page-clicks ∪ order_detail → product_stats (window agg)
    *   order_detail → dedup → product_order_ct (EXACT distinct orders)
    *   order_detail → product_topn              (rank-on-seal top-N)
    *
    * Streaming-measure notes: `product_stats` carries the sum/count
    * surface (no distinct state); the EXACT distinct-order counts run
    * as their own `product_order_ct` query via the dedup-then-count
    * chain (the [[StatsJobs]] caveat applies only to `countDistinct`
    * INSIDE a streaming aggregate). The dim join for province runs
    * per sealed micro-batch against the upserted dim table — the
    * reference's J4 lookup-join shape — and both province sinks sit
    * behind batch-id ledgers ([[graft.sinks.Sinks.idempotentAppend]] /
    * [[graft.sinks.Sinks.mergeAgg]]), upgrading the reference's
    * at-least-once JDBC append to exactly-once.
    *
    * @return query-name → running [[StreamingQuery]]; stop them all and
    *         call again with the same roots to restart from checkpoints.
    */
  def streaming(spark: SparkSession, logDir: String, cdcDir: String,
                config: DataFrame, outRoot: String, ckRoot: String,
                width: String = "10 seconds", delay: String = "2 seconds",
                gapMillis: Long = 10000L)
      : Map[String, org.apache.spark.sql.streaming.StreamingQuery] = {
    import spark.implicits._
    import graft.streaming.StatefulOps.KeyedEvent

    def out(n: String) = s"$outRoot/$n"
    def ck(n: String) = s"$ckRoot/$n"
    // chained file "topics" must exist before a downstream file source
    // starts polling them
    Seq("page", "page_fixed", "unique_visit", "user_jump", "display",
      "order_info", "order_detail").foreach(n => new java.io.File(out(n)).mkdirs())

    def fileSink(name: String, df: DataFrame)
        : (String, org.apache.spark.sql.streaming.StreamingQuery) =
      name -> df.writeStream.format("parquet")
        .option("path", out(name)).option("checkpointLocation", ck(name))
        .outputMode("append").start()

    // ---- DWD log: parse + split (stateless; the is_new fix is the
    // NEXT query — isNewFixBatch's window function does not stream)
    val raw = spark.readStream.text(logDir)
    val (clean, dirty) = LogSplitJob.parse(raw)
    val splitFrames = LogSplitJob.split(clean)
    val page = splitFrames("page")

    // ---- DWD fix: keyed is_new correction, page → page_fixed
    val pageSchema = page.schema
    def pageStream() = spark.readStream.schema(pageSchema).parquet(out("page"))
    val toKeyed = (df: DataFrame) => df.select(
      col("common.mid").as("mid"), col("ts"),
      col("common.is_new").as("is_new"),
      col("page.page_id").as("page_id"),
      col("page.last_page_id").as("last_page_id"),
      timestamp_millis(col("ts")).as("event_time"),
      col("common.vc").as("vc"), col("common.ch").as("ch"),
      col("common.ar").as("ar"),
      coalesce(col("page.during_time"), lit(0L)).as("during_time"))
      .as[KeyedEvent]
    val fixed = StatefulOps.isNewFixStreaming(toKeyed(pageStream()))
    val keyedSchema = fixed.toDF().schema
    def fixedStream() = spark.readStream.schema(keyedSchema)
      .parquet(out("page_fixed")).as[KeyedEvent]

    // ---- DWM: UV dedup + bounce detection (keyed state + watermark).
    // The bounce stream carries heartbeat markers: its verdicts are
    // DERIVED rows stamped with the ENTRY's event time (a bounce is
    // decided gap+delay after its entry and must land in the entry's
    // window — the reference's uj_ct contract), so the user_jump
    // topic's own event times cannot advance a downstream watermark
    // on time — and with no bounce traffic at all they'd never
    // advance it. Heartbeat rows carry the stream's true horizon
    // (upstream watermark − gap) every micro-batch, so the topic's
    // watermark advances like any primary stream's
    // ([[StatefulOps.heartbeatMid]]).
    val uv = StatefulOps.uniqueVisitStreaming(
      StatefulOps.watermarked(fixedStream(), delay))
    val uj = StatefulOps.bounceStreaming(
      StatefulOps.watermarked(
        StatefulOps.withHeartbeatMarkers(fixedStream()), delay), gapMillis)

    // ---- DWS visitor: pv/sv/dur + uv + uj legs → one windowed agg.
    // UNIFORM per-leg watermark policy (Flink's channel-min): every
    // leg gets the same per-leg `withWatermark`, and the global
    // watermark is their min. Pre-heartbeat the uj leg needed a
    // special carve-out (its sparse derived rows couldn't keep up —
    // commit 19811b5); with the heartbeat protocol each leg advances
    // from its own topic uniformly, the derived leg via its horizon
    // rows. Heartbeats aggregate into a sentinel group dropped
    // post-agg (`dropHeartbeats` — see the StatsJobs scaladoc for why
    // it must not be a pre-watermark filter).
    def keyedLeg(dir: String) = spark.readStream.schema(keyedSchema)
      .parquet(out(dir)).withWatermark("event_time", delay)
    val pvLeg = keyedLeg("page_fixed").select(
      col("vc"), col("ch"), col("ar"), col("is_new"), col("event_time"),
      lit(1L).as("pv_ct"),
      when(col("last_page_id").isNull || col("last_page_id") === "", 1L)
        .otherwise(0L).as("sv_ct"),
      col("during_time").as("dur_sum"))
    val uvLeg = keyedLeg("unique_visit").select(
      col("vc"), col("ch"), col("ar"), col("is_new"), col("event_time"),
      lit(1L).as("uv_ct"))
    val ujLeg = keyedLeg("user_jump").select(
      col("vc"), col("ch"), col("ar"), col("is_new"), col("event_time"),
      // heartbeats contribute zero to the measure; their sentinel
      // group dies post-agg, never in a pushable filter
      when(col("mid") =!= StatefulOps.heartbeatMid, 1L).otherwise(0L)
        .as("uj_ct"))
    val visitorStats = StatsJobs.visitorStats(Seq(pvLeg, uvLeg, ujLeg),
      width, dropHeartbeats = true)

    // ---- DWS sessions: native session_window over the fixed page
    // stream — state is one merged [start, end) range per open
    // session (never a row buffer); sessions seal when the watermark
    // passes last_ts + gap
    val sessions = StatsJobs.sessionStats(
      keyedLeg("page_fixed"),
      keyCol = "mid", tsCol = "event_time", gap = "30 minutes",
      extraAggs = Seq(sum(col("during_time")).as("dur_sum")))

    // ---- DWS keyword: raw page search items → windowed keyword counts
    val keywordStats = StatsJobs.keywordStats(
      pageStream().withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", delay), width)

    // ---- DWD db: route CDC → fact topics + dim upserts
    val cdcRaw = spark.readStream.text(cdcDir)
    val env = CdcRouter.parseEnvelope(cdcRaw)
    val rows = env.filter(col("_corrupt").isNull).select(col("env.*"))
      .withColumn("type", CdcRouter.normalizeOp(col("type")))
    val routed = CdcRouter.pruneColumns(
      CdcRouter.route(CdcRouter.filterDeletes(rows), config))
    val orderInfo = factFrame(routed, "order_info", Map(
      "id" -> LongType, "province_id" -> LongType,
      "order_status" -> StringType, "user_id" -> LongType,
      "total_amount" -> money, "create_time" -> StringType))
    val orderDetail = factFrame(routed, "order_detail", Map(
      "id" -> LongType, "order_id" -> LongType, "sku_id" -> LongType,
      "sku_num" -> LongType, "split_total_amount" -> money,
      "create_time" -> StringType))
    val dimQuery = "dims" -> routed.filter(col("sinkType") === "hbase")
      .writeStream.option("checkpointLocation", ck("dims"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // MERGE by pk — idempotent under replay, the K3 contract
        val province = batch
          .filter(col("sinkTable") === "dim_base_province")
          .select(col("after")("id").as("id"), col("after")("name").as("name"),
            col("after")("area_code").as("area_code"))
        if (!province.isEmpty)
          graft.sinks.Sinks.upsertDim(spark, province, out("dim"),
            "dim_base_province")
        ()
      }.start()

    // ---- DWS province: windowed order count/amount at the ORDER grain
    // (one CDC row per order id ⇒ exact counts without distinct state),
    // dim name joined per sealed batch against the upserted table
    val oiSchema = orderInfo.schema
    val provAgg = spark.readStream.schema(oiSchema).parquet(out("order_info"))
      .withColumn("event_time", to_timestamp(col("create_time")))
      .withWatermark("event_time", delay)
      .groupBy(window(col("event_time"), width).as("w"), col("province_id"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("total_amount")).as("order_amount"))
    val provinceQuery = "province_stats" -> provAgg
      .writeStream.option("checkpointLocation", ck("province_stats"))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the dims query swap-publishes this dir CONCURRENTLY with
        // this read (independent streaming queries) — readDimSnapshot
        // retries through the swap window and pins an eager snapshot
        val dim = graft.sinks.Sinks
          .readDimSnapshot(spark, out("dim"), "dim_base_province")
          .map(_.select(expr("try_cast(id AS BIGINT)").as("province_id"),
            col("name").as("province_name")))
          .getOrElse(
            Seq.empty[(Long, String)].toDF("province_id", "province_name"))
        // batch-ledger append: exactly-once even for a crash BETWEEN
        // the write and the checkpoint commit (Sinks.idempotentAppend)
        val enriched = batch
          .withColumn("stt",
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
          .withColumn("edt",
            date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss"))
          .drop("w")
          .join(dim, Seq("province_id"), "left")
        graft.sinks.Sinks.idempotentAppend(enriched, batchId,
          out("province_stats"))
        // ADS tier: the same sealed windows ALSO maintain the
        // running per-province rollup (additive MERGE behind its own
        // ledger — a crash between the two sinks redoes only the
        // uncommitted one, so each stays exactly-once)
        graft.sinks.Sinks.mergeAgg(spark,
          enriched.select(col("province_id"), col("province_name"),
            col("order_count"), col("order_amount")),
          out("province_rollup"),
          keyCols = Seq("province_id", "province_name"),
          sumCols = Seq("order_count", "order_amount"), batchId = batchId)
        // ADS quantile tier: per-province window-amount DISTRIBUTION,
        // maintained as additive value counts behind a third ledger
        // (QuantileStreaming) — exact percentiles served with plain
        // SQL over the compacted counts table at any time. Amounts
        // quantize to cents (the t32 integral-metric lever).
        QuantileStreaming.mergeBatch(spark,
          enriched.select(col("province_id"),
            (col("order_amount") * 100).cast("long").as("amt_cents")),
          "province_id", col("amt_cents"),
          out("province_amount_quantiles"), batchId)
        // ADS drift tier: day-over-day PROVINCE-MIX drift — per-(day,
        // province) order counts maintained additively behind a
        // FOURTH ledger (the DriftStreaming state shape); TV
        // distances served anytime by `Series.driftFromCounts` over
        // the compacted table, bit-equal to the batch operator over
        // the windowed sink (restart-spec-pinned)
        graft.sinks.Sinks.mergeAgg(spark,
          batch.select(
              graft.core.Graft.floorDivExpr("unix_millis(w.start)",
                86400000L).as("day"),
              col("province_id").as("typ"), col("order_count").as("n"))
            .groupBy(col("day"), col("typ")).agg(sum(col("n")).as("n")),
          out("province_mix_drift"), keyCols = Seq("day", "typ"),
          sumCols = Seq("n"), batchId = batchId)
        ()
      }.start()

    // ---- DWS product: display + click + order-detail measure streams
    // → windowed sums per sku (the sum/count surface; distinct-order
    // counts are the batch path, see scaladoc)
    // display/click rows that aren't sku impressions are dropped by
    // NULLING the sku key, not by a filter: Catalyst pushes a plain
    // filter below the EventTimeWatermark node (predicate doesn't
    // reference event_time), after which non-sku rows would never
    // advance the watermark and product windows would stall. The null
    // group is one bounded state row per window, dropped post-agg.
    val displaySchema = splitFrames("display").schema
    val dispLeg = spark.readStream.schema(displaySchema).parquet(out("display"))
      .select(
        expr("try_cast(CASE WHEN item_type = 'sku_id' THEN item END AS BIGINT)")
          .as("sku_id"),
        timestamp_millis(col("ts")).as("event_time"),
        lit(1L).as("display_ct"), lit(0L).as("click_ct"),
        lit(0L).as("order_sku_num"),
        lit(null).cast(money).as("order_amount"))
    val clickLeg = pageStream()
      .select(
        expr("try_cast(CASE WHEN page.item_type = 'sku_id' THEN page.item END AS BIGINT)")
          .as("sku_id"),
        timestamp_millis(col("ts")).as("event_time"),
        lit(0L).as("display_ct"), lit(1L).as("click_ct"),
        lit(0L).as("order_sku_num"),
        lit(null).cast(money).as("order_amount"))
    val odSchema = orderDetail.schema
    val odLeg = spark.readStream.schema(odSchema).parquet(out("order_detail"))
      .select(col("sku_id"),
        to_timestamp(col("create_time")).as("event_time"),
        lit(0L).as("display_ct"), lit(0L).as("click_ct"),
        col("sku_num").as("order_sku_num"),
        col("split_total_amount").as("order_amount"))
    // ONE watermark over the unioned measure rows: per-leg watermark
    // operators would hold the query's global watermark at the min of
    // three independently-advancing values, and a leg whose operator
    // stalls (e.g. restored from a checkpoint and fed only via the
    // others) stalls every window
    val productStats = dispLeg.unionByName(clickLeg).unionByName(odLeg)
      .withWatermark("event_time", delay)
      .groupBy(window(col("event_time"), width).as("w"), col("sku_id"))
      .agg(sum("display_ct").as("display_ct"), sum("click_ct").as("click_ct"),
        sum("order_sku_num").as("order_sku_num"),
        coalesce(sum("order_amount"), lit(0).cast(money)).as("order_amount"))
      .filter(col("sku_id").isNotNull) // the nulled non-sku group
      .withColumn("stt", date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("w")

    // ---- DWS product distinct-order counts: the reference's
    // Set-accumulator measure (bean/ProductStats order_ct), EXACT in
    // streaming via the blessed multi-stateful chain — keyed
    // dropDuplicatesWithinWatermark (state: one (sku, order) marker
    // per watermark horizon) feeding the windowed count. StatsJobs'
    // "distinct aggregates don't stream" caveat applies to
    // countDistinct IN the aggregate; dedup-then-count is the
    // streaming-native form of the same measure.
    val orderCt = spark.readStream.schema(odSchema)
      .parquet(out("order_detail"))
      .select(col("sku_id"), col("order_id"),
        to_timestamp(col("create_time")).as("event_time"))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("sku_id", "order_id")
      .groupBy(window(col("event_time"), width).as("w"), col("sku_id"))
      .agg(count(lit(1)).as("order_ct"))
      .withColumn("stt", date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("w")

    // ---- DWS top-N: ranked top skus per window by order amount (the
    // q19 serving shape, incremental — TopNStreaming scaladoc)
    val topnQuery = "product_topn" -> TopNStreaming.windowedTopN(
      spark.readStream.schema(odSchema).parquet(out("order_detail"))
        .select(col("sku_id"),
          (col("split_total_amount") * 100).cast(LongType)
            .as("amount_cents"),
          to_timestamp(col("create_time")).as("event_time"))
        .withWatermark("event_time", delay),
      width, n = 3, keyCol = "sku_id", centsCol = "amount_cents",
      tsCol = "event_time") { (batchId, ranked) =>
        graft.sinks.Sinks.idempotentAppend(ranked, batchId,
          out("product_topn"))
      }
      .option("checkpointLocation", ck("product_topn")).start()

    Map(
      fileSink("page", page),
      fileSink("start", splitFrames("start")),
      fileSink("display", splitFrames("display")),
      fileSink("dirty", dirty),
      fileSink("page_fixed", fixed.toDF()),
      fileSink("unique_visit", uv.toDF()),
      fileSink("user_jump", uj.toDF()),
      fileSink("visitor_stats", visitorStats),
      fileSink("sessions", sessions),
      fileSink("keyword_stats", keywordStats),
      fileSink("order_info", orderInfo),
      fileSink("order_detail", orderDetail),
      fileSink("product_stats", productStats),
      fileSink("product_order_ct", orderCt),
      dimQuery, provinceQuery, topnQuery)
  }
}
