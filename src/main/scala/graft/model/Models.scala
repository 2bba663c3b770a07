package graft.model

import java.math.{BigDecimal => JBigDecimal}

/** Case-class mirrors of the reference's DWM/DWS beans (snake_case
  * field names kept so JSON round-trips match byte-for-byte).
  * Money is BigDecimal (reference uses java.math.BigDecimal for all
  * amounts, e.g. `gmall-realtime/src/main/java/com/atguigu/bean/OrderInfo.java:13-17`);
  * event times are both the source `"yyyy-MM-dd HH:mm:ss"` string and a
  * derived epoch-millis `*_ts` long.
  */

/** reference bean/OrderInfo.java:8-23 */
case class OrderInfo(
    id: Long, province_id: Long, order_status: String, user_id: Long,
    total_amount: JBigDecimal, activity_reduce_amount: JBigDecimal,
    coupon_reduce_amount: JBigDecimal, original_total_amount: JBigDecimal,
    feight_fee: JBigDecimal, expire_time: String, create_time: String,
    operate_time: String,
    create_date: String, create_hour: String, create_ts: Long)

/** reference bean/OrderDetail.java:8-19 */
case class OrderDetail(
    id: Long, order_id: Long, sku_id: Long, order_price: JBigDecimal,
    sku_num: Long, sku_name: String, create_time: String,
    split_total_amount: JBigDecimal, split_activity_amount: JBigDecimal,
    split_coupon_amount: JBigDecimal, create_ts: Long)

/** reference bean/PaymentInfo.java:8-17 */
case class PaymentInfo(
    id: Long, order_id: Long, user_id: Long, total_amount: JBigDecimal,
    subject: String, payment_type: String, create_time: String,
    callback_time: String)

/** reference bean/VisitorStats.java:11-35 — dims (stt..is_new) +
  * measures (uv/pv/sv/uj counts, duration sum).
  */
case class VisitorStats(
    stt: String, edt: String, vc: String, ch: String, ar: String,
    is_new: String, uv_ct: Long, pv_ct: Long, sv_ct: Long, uj_ct: Long,
    dur_sum: Long, ts: Long)

/** reference bean/ProvinceStats.java:16-39 */
case class ProvinceStats(
    stt: String, edt: String, province_id: Long, province_name: String,
    area_code: String, iso_code: String, iso_3166_2: String,
    order_amount: JBigDecimal, order_count: Long, ts: Long)

/** reference bean/KeywordStats.java:13-19; source ∈
  * {SEARCH, CLICK, CART, ORDER} (common/GmallConstant.java:293-296).
  */
case class KeywordStats(
    keyword: String, source: String, ct: Long, stt: String, edt: String,
    ts: Long)

object KeywordSource {
  val SEARCH = "SEARCH"
  val CLICK = "CLICK"
  val CART = "CART"
  val ORDER = "ORDER"
}

/** reference bean/ProductStats.java:21-87 — the distinct-id accumulator
  * Sets (:74-84) become exact distinct counts; `@TransientSink` fields
  * are never materialized here (they're partial-aggregate state, which
  * Spark keeps internal to the agg).
  */
case class ProductStats(
    stt: String, edt: String, sku_id: Long, sku_name: String,
    sku_price: JBigDecimal, spu_id: Long, spu_name: String, tm_id: Long,
    tm_name: String, category3_id: Long, category3_name: String,
    display_ct: Long, click_ct: Long, favor_ct: Long, cart_ct: Long,
    order_sku_num: Long, order_amount: JBigDecimal, order_ct: Long,
    payment_amount: JBigDecimal, paid_order_ct: Long,
    refund_order_ct: Long, refund_amount: JBigDecimal,
    comment_ct: Long, good_comment_ct: Long, ts: Long)
