package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DWM wide-row jobs: the reference's OrderWideApp / PaymentWideApp
  * interval joins + dimension enrichment, as plan-level transforms that
  * run identically in batch and Structured Streaming (both sides
  * `withWatermark` + a time-range join condition, which Spark turns
  * into watermark-pruned stream-stream join state).
  *
  * reference:
  *  - interval join ±5s  `app/dwm/OrderWideApp.java:81-89`
  *  - interval join −15min/+5s `app/dwm/PaymentWideApp.java:77-85`
  *  - dim columns populated `bean/OrderWide.java:37-51`
  *  - async dim lookup machinery `app/func/AsyncDimFunction.java:36-62`
  *    → replaced by broadcast equi-joins against dim snapshots (the
  *    cache/thread-pool plumbing is Flink-only latency hiding; a
  *    set-oriented join is the Spark-native equivalent and is what
  *    scales — dims re-resolve per micro-batch in streaming).
  */
object WideJobs {

  /** Event-time interval join:
    * left.keyL == right.keyR && right.ts ∈ [left.ts + lower, left.ts + upper].
    *
    * In streaming both inputs must have watermarks; Spark derives state
    * eviction from the range condition (SS watermark-pruned join). In
    * batch the same plan is a plain range-filtered equi-join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyL: String, keyR: String,
                   tsL: String, tsR: String,
                   lower: String, upper: String): DataFrame =
    left.join(right,
      left(keyL) === right(keyR) &&
        right(tsR) >= left(tsL) + expr(s"INTERVAL $lower") &&
        right(tsR) <= left(tsL) + expr(s"INTERVAL $upper"))

  /** Derive create_date / create_hour / create_ts from the
    * `"yyyy-MM-dd HH:mm:ss"` create_time string
    * (reference OrderWideApp.java:44-62).
    */
  def withTimeDerivations(df: DataFrame, timeCol: String = "create_time"): DataFrame = {
    val ts = to_timestamp(col(timeCol), "yyyy-MM-dd HH:mm:ss")
    df.withColumn("create_date", date_format(ts, "yyyy-MM-dd"))
      .withColumn("create_hour", date_format(ts, "HH"))
      .withColumn("create_ts", unix_millis(ts))
      .withColumn("event_time", ts)
  }

  /** OrderWide: order_info ⨝ order_detail within ±5s, then broadcast
    * dim enrichment (province, user, sku→spu/tm/category3).
    *
    * Dim frames are the Phoenix-table equivalents (FIXTURES.md §5);
    * pass only the ones available — missing dims skip their columns.
    */
  def orderWide(orderInfo: DataFrame, orderDetail: DataFrame,
                dims: Map[String, DataFrame] = Map.empty): DataFrame = {
    val oi = withTimeDerivations(orderInfo)
      .withColumnRenamed("create_time", "order_create_time")
      .withColumnRenamed("event_time", "order_event_time")
    val od = withTimeDerivations(
        orderDetail.withColumnRenamed("id", "detail_id")
          .withColumnRenamed("create_time", "detail_create_time"),
        "detail_create_time")
      .withColumnRenamed("event_time", "detail_event_time")
      .withColumnRenamed("create_date", "detail_create_date")
      .withColumnRenamed("create_hour", "detail_create_hour")
      .withColumnRenamed("create_ts", "detail_create_ts")
    val joined = intervalJoin(oi, od,
      keyL = "id", keyR = "order_id",
      tsL = "order_event_time", tsR = "detail_event_time",
      lower = "-5 SECONDS", upper = "5 SECONDS")

    var wide = joined
    dims.get("dim_base_province").foreach { p =>
      wide = wide.join(broadcast(p.select(
          col("id").as("province_join_id"),
          col("name").as("province_name"),
          col("area_code").as("province_area_code"),
          col("iso_code").as("province_iso_code"),
          col("iso_3166_2").as("province_3166_2_code"))),
        col("province_id").cast("string") === col("province_join_id"), "left")
        .drop("province_join_id")
    }
    dims.get("dim_user_info").foreach { u =>
      wide = wide.join(broadcast(u.select(
          col("id").as("user_join_id"),
          col("gender").as("user_gender"),
          col("birthday"))),
        col("user_id").cast("string") === col("user_join_id"), "left")
        .drop("user_join_id")
        // age from birthday at event time (reference computes age in the
        // dim join callback, bean/OrderWide.java:42 + OrderWideApp TODO)
        .withColumn("user_age",
          (datediff(col("order_event_time").cast("date"),
            to_date(col("birthday"))) / 365.25).cast("int"))
        .drop("birthday")
    }
    dims.get("dim_sku_info").foreach { sk =>
      wide = wide.join(broadcast(sk.select(
          col("id").as("sku_join_id"),
          col("spu_id"), col("tm_id"), col("category3_id"))),
        col("sku_id").cast("string") === col("sku_join_id"), "left")
        .drop("sku_join_id")
    }
    dims.get("dim_spu_info").foreach { sp =>
      wide = wide.join(broadcast(sp.select(col("id").as("spu_join_id"),
          col("spu_name"))),
        col("spu_id") === col("spu_join_id"), "left").drop("spu_join_id")
    }
    dims.get("dim_base_trademark").foreach { tm =>
      wide = wide.join(broadcast(tm.select(col("id").as("tm_join_id"),
          col("tm_name"))),
        col("tm_id") === col("tm_join_id"), "left").drop("tm_join_id")
    }
    dims.get("dim_base_category3").foreach { c3 =>
      wide = wide.join(broadcast(c3.select(col("id").as("c3_join_id"),
          col("name").as("category3_name"))),
        col("category3_id") === col("c3_join_id"), "left").drop("c3_join_id")
    }
    wide
  }

  /** PaymentWide: payment_info ⨝ order_wide with the asymmetric
    * window order_time ∈ [pay_time − 15 min, pay_time + 5 s]
    * (reference PaymentWideApp.java:79).
    */
  def paymentWide(paymentInfo: DataFrame, orderWide: DataFrame): DataFrame = {
    val pay = withTimeDerivations(
        paymentInfo.withColumnRenamed("id", "payment_id")
          .withColumnRenamed("create_time", "payment_create_time")
          .withColumnRenamed("user_id", "payment_user_id")
          .withColumnRenamed("total_amount", "payment_amount"),
        "payment_create_time")
      .withColumnRenamed("event_time", "payment_event_time")
      .withColumnRenamed("create_date", "payment_create_date")
      .withColumnRenamed("create_hour", "payment_create_hour")
      .withColumnRenamed("create_ts", "payment_create_ts")
    val ow = orderWide.withColumnRenamed("order_id", "wide_order_id")
    intervalJoin(pay, ow,
      keyL = "order_id", keyR = "wide_order_id",
      tsL = "payment_event_time", tsR = "order_event_time",
      lower = "-15 MINUTES", upper = "5 SECONDS")
  }
}
