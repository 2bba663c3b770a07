package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}

/** Shared preludes for the streaming twins — the parity-critical
  * pieces live ONCE so the batch-equivalence rules can't drift between
  * copies (they already had: the EWMA overflow guard existed while the
  * CUSUM copy could poison-pill on the same input).
  */
private[streaming] object EventTime {

  /** Attach a watermark to a Dataset whose case class carries an
    * `event_time` Timestamp column — the standard prelude of every
    * stateful twin here.
    */
  def attach[T: Encoder](events: Dataset[T], delay: String): Dataset[T] =
    events.toDF().withWatermark("event_time", delay).as[T]
}

private[streaming] object Cents {

  /** HALF_UP integer cents of a raw double measurement:
    *  - None for null-equivalent inputs — NaN/±Infinity AND finite
    *    |value| ≥ 1e16 — exactly the rows the batch twins'
    *    `Graft.cents` nulls (via `Graft.finite`) and filters, so
    *    stream and batch drop the identical set;
    *  - a clear IllegalArgumentException when |cents| exceeds `bound`
    *    on the remaining [bound/100, 1e16) range — a fail-fast with a
    *    diagnosable message instead of either a silent Long wrap in
    *    the downstream integer arithmetic or a bare
    *    ArithmeticException poison-pill from toLongExact. On that
    *    range the batch side's bounded-cents guard raises too, so the
    *    contract stays "divergence nowhere, or an error on both
    *    sides".
    *
    * HALF_UP (away from zero) matches DECIMAL(18,2)'s cast rounding;
    * Math.round would disagree on negative half-cents (see the CUSUM
    * twin's spec).
    */
  def halfUp(value: Double, bound: Long = Long.MaxValue): Option[Long] =
    if (value.isNaN || value.isInfinite || math.abs(value) >= 1e16) None
    else {
      val bd = BigDecimal(value)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
      require(bd.abs <= BigDecimal(bound),
        s"|cents|=$bd exceeds the operator's bound $bound " +
          "(corrupt measurement? the integer fold would overflow)")
      Some(bd.toLongExact)
    }
}
