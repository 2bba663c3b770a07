package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.model.KeywordSource

/** DWS windowed aggregations. The reference snapshot declares these
  * via the four stats beans + ClickHouse sink (mains absent); we build
  * the full declared output surface as tumbling-window group-bys
  * (reference window bounds: `stt`/`edt` string fields,
  * e.g. bean/VisitorStats.java:13-15; 10s tumble per curriculum).
  *
  * Every job takes already-parsed DWD/DWM frames and returns the stats
  * frame. Streaming caveat: [[visitorStats]] and [[keywordStats]]
  * incrementalize as-is under `withWatermark`; the jobs built on
  * count(DISTINCT …) ([[productStats]], [[productStatsFull]],
  * [[provinceStats]]) do NOT — Spark rejects distinct aggregates on
  * streaming frames — and run per window via `foreachBatch` (compute
  * the batch plan over each micro-batch's closed windows), or swap
  * `countDistinct` for `approx_count_distinct` to stream natively at
  * sketch precision. The batch plans here are the correctness oracle
  * either way.
  */
object StatsJobs {

  private def win(tsCol: String, width: String) =
    window(col(tsCol), width)

  private def windowBounds(df: DataFrame): DataFrame =
    df.withColumn("stt", date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("w")

  /** VisitorStats: union of page-view / unique-visit / session-entry /
    * bounce inputs → per (vc, ch, ar, is_new) × window multi-counts
    * (bean/VisitorStats.java:11-35). Inputs carry marker columns
    * pv_ct/uv_ct/sv_ct/uj_ct/dur_sum; missing columns default 0 via
    * unionByName(allowMissingColumns).
    */
  /** @param watermark when streaming, the delay for ONE watermark
    *   applied AFTER the union: per-leg watermarks would hold the
    *   query's global watermark at the min of independently-advancing
    *   operators, and the bounce leg is inherently sparse — a quiet
    *   uj topic would keep every visitor window open (the product-
    *   stats lesson, SCALING.md round-10). Batch callers leave None.
    * @param dropHeartbeats when a leg carries watermark-heartbeat
    *   control rows ([[StatefulOps.heartbeatMid]]-keyed dims), drop
    *   their sentinel group AFTER the aggregation. The drop predicate
    *   deliberately references an AGGREGATED helper column (`_hb`),
    *   never the raw dims: a deterministic dim filter would be pushed
    *   below the `EventTimeWatermark` operator and the heartbeats
    *   would stop advancing the very watermark they exist to advance
    *   (the filter-below-watermark stall, SCALING.md round-10).
    */
  def visitorStats(inputs: Seq[DataFrame], width: String = "10 seconds",
                   watermark: Option[String] = None,
                   dropHeartbeats: Boolean = false): DataFrame = {
    val base0 = inputs.map { df =>
      Seq("pv_ct", "uv_ct", "sv_ct", "uj_ct", "dur_sum").foldLeft(df) {
        (d, c) => if (d.columns.contains(c)) d else d.withColumn(c, lit(0L))
      }
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val base = watermark.fold(base0)(d => base0.withWatermark("event_time", d))
    val hbAgg =
      if (dropHeartbeats)
        Seq(max(when(col("vc") === StatefulOps.heartbeatMid, 1L)
          .otherwise(0L)).as("_hb"))
      else Seq.empty
    val agged = base.groupBy(win("event_time", width).as("w"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(
        sum("uv_ct").as("uv_ct"),
        (Seq(sum("pv_ct").as("pv_ct"),
          sum("sv_ct").as("sv_ct"), sum("uj_ct").as("uj_ct"),
          sum("dur_sum").as("dur_sum")) ++ hbAgg): _*)
    windowBounds(
      if (dropHeartbeats) agged.filter(col("_hb") === 0L).drop("_hb")
      else agged)
  }

  /** Gap-based sessionization via Spark-native `session_window`: per
    * key, events closer than `gap` merge into one session spanning
    * [first_ts, last_ts + gap). The reference approximates sessions
    * with the log's last_page_id-null heuristic (sv_ct); this is the
    * engine-level generalization — identical plan incrementalizes
    * under streaming (sessions emit once the watermark passes
    * last_ts + gap; state is one [start, end) range per open session,
    * merged by the state store, never a row buffer).
    *
    * @param extraAggs additional aggregate columns (already aliased)
    */
  def sessionStats(events: DataFrame, keyCol: String = "user_id",
                   tsCol: String = "ts", gap: String = "4 hours",
                   extraAggs: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("ev_ct") +: extraAggs
    val agged = events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = agged.columns.toSeq.filterNot(c => c == keyCol || c == "w")
    agged.select((col(keyCol) +: col("w.start").as("stt") +:
      col("w.end").as("edt") +: aggCols.map(col)): _*)
  }

  /** ProductStats: per sku × window counts/amounts with exact distinct
    * order-id counts (the reference's Set-accumulator fields,
    * bean/ProductStats.java:74-84, are exactly a distinct-count partial
    * aggregate — Spark keeps that state internally).
    */
  def productStats(orderWide: DataFrame, width: String = "10 seconds"): DataFrame =
    windowBounds(
      orderWide.groupBy(win("order_event_time", width).as("w"), col("sku_id"))
        .agg(
          sum(col("sku_num")).as("order_sku_num"),
          sum(col("split_total_amount")).as("order_amount"),
          countDistinct(col("wide_order_id")).as("order_ct")))

  /** The measure surface of bean/ProductStats.java:21-87: long counts,
    * money sums, and the three distinct-id Set accumulators.
    */
  private val psLongCols = Seq("display_ct", "click_ct", "favor_ct",
    "cart_ct", "order_sku_num", "comment_ct", "good_comment_ct")
  private val psMoneyCols = Seq("order_amount", "payment_amount",
    "refund_amount")
  private val psIdCols = Seq("order_id", "paid_order_id", "refund_order_id")

  /** Full ProductStats: every input stream (display / click / favor /
    * cart / order / payment / refund / comment) contributes marker
    * columns; one keyed windowed aggregation produces the complete
    * declared bean surface. Inputs need `sku_id`, `event_time`, and
    * whichever measure columns they carry — the rest default to
    * 0 / null here (the reference's union → keyBy → reduce pattern).
    */
  def productStatsFull(inputs: Seq[DataFrame],
                       width: String = "10 seconds"): DataFrame = {
    val money = org.apache.spark.sql.types.DecimalType(16, 2)
    val base = inputs.map { df =>
      val withLongs = psLongCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(0L)))
      val withMoney = psMoneyCols.foldLeft(withLongs)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(money)))
      psIdCols.foldLeft(withMoney)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast("long")))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val aggs =
      psLongCols.map(c => sum(col(c)).as(c)) ++
        psMoneyCols.map(c => coalesce(sum(col(c)), lit(0).cast(money)).as(c)) ++
        Seq(
          countDistinct(col("order_id")).as("order_ct"),
          countDistinct(col("paid_order_id")).as("paid_order_ct"),
          countDistinct(col("refund_order_id")).as("refund_order_ct"))
    windowBounds(
      base.groupBy(win("event_time", width).as("w"), col("sku_id"))
        .agg(aggs.head, aggs.tail: _*))
  }

  /** ProvinceStats — expressed in SQL like the curriculum's Flink-SQL
    * layer (bean/ProvinceStats.java:16-39).
    */
  def provinceStats(spark: SparkSession, orderWide: DataFrame,
                    width: String = "10 seconds"): DataFrame = {
    orderWide.createOrReplaceTempView("order_wide")
    spark.sql(
      s"""SELECT date_format(window(order_event_time, '$width').start,
         |         'yyyy-MM-dd HH:mm:ss') AS stt,
         |       date_format(window(order_event_time, '$width').end,
         |         'yyyy-MM-dd HH:mm:ss') AS edt,
         |       province_id, province_name,
         |       sum(split_total_amount) AS order_amount,
         |       count(DISTINCT wide_order_id) AS order_count
         |FROM order_wide
         |GROUP BY window(order_event_time, '$width'), province_id,
         |         province_name""".stripMargin)
  }

  /** KeywordStats: tokenize the search text → explode → per keyword ×
    * source × window counts (bean/KeywordStats.java:13-19 +
    * KeywordUtil tokenizer + GmallConstant sources).
    */
  def keywordStats(pages: DataFrame, width: String = "10 seconds"): DataFrame = {
    // non-search rows are dropped by nulling the text into the
    // tokenizer (empty token array → explode emits nothing) rather
    // than by a filter: Catalyst pushes a plain filter BELOW the
    // input's EventTimeWatermark node (the predicate doesn't reference
    // the event-time column), after which non-search rows would never
    // advance the streaming watermark and windows would only seal on
    // search traffic. The explode sits safely above the watermark.
    val searches = pages
      .select(col("event_time"),
        explode(TextFunctions.tokenizeSmart(
          when(col("page.item_type") === "keyword", col("page.item"))))
          .as("keyword"),
        lit(KeywordSource.SEARCH).as("source"))
    windowBounds(
      searches.groupBy(win("event_time", width).as("w"),
          col("keyword"), col("source"))
        .agg(count(lit(1)).as("ct")))
  }
}
