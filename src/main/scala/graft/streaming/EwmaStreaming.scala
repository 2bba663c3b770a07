package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA smoother: the incremental twin of
  * [[graft.operators.Series.ewma]] — per key, the α=1/2
  * integer-weighted average over the last `horizon` events in
  * (ts, id) order, emitted once per event.
  *
  * Same watermark-closed determinism contract as [[CusumStreaming]]:
  * the fold is order-sensitive (each event's EWMA depends on which
  * events precede it), so events above the watermark BUFFER in state
  * and fold only once sealed — each event emits exactly once, in
  * event-time order, under any arrival order or replay.
  *
  * State per key = the last `horizon − 1` sealed cents (the fold
  * frontier the next event's window needs) plus the out-of-orderness
  * buffer — O(horizon + watermark delay), never O(history). Arithmetic
  * is the batch twin's exactly: integer cents, power-of-two weights,
  * one IEEE divide — spec-pinned bit equality.
  */
object EwmaStreaming {

  case class Pt(key: String, id: Long, ts: Long, value: Double,
                event_time: Timestamp)

  def pt(key: String, id: Long, ts: Long, value: Double): Pt =
    Pt(key, id, ts, value, new Timestamp(ts))

  case class Smoothed(key: String, id: Long, ts: Long, value: Double,
                      ewma: Double)

  /** `recent` = last ≤ horizon−1 sealed cents, oldest first;
    * `pending` = (ts, id, cents) not yet at-or-below the watermark.
    */
  case class EwmaState(recent: Seq[Long], pending: Seq[(Long, Long, Long)])

  def withEventTime(events: Dataset[Pt],
                    delay: String = "0 seconds"): Dataset[Pt] = {
    import events.sparkSession.implicits._
    EventTime.attach(events, delay)
  }

  def ewmaStreaming(events: Dataset[Pt],
                    horizon: Int = 16): Dataset[Smoothed] = {
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1, 32], got $horizon")
    import events.sparkSession.implicits._
    val maxAbs = Long.MaxValue >> horizon
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Pt],
         state: GroupState[EwmaState]) => {
          val st0 = state.getOption.getOrElse(EwmaState(Nil, Nil))
          // shared Cents.halfUp: non-finite rows drop (the batch
          // twin's Graft.cents contract), |cents| beyond the horizon
          // bound raises with a diagnosable message
          val incoming = rows
            .flatMap(p => Cents.halfUp(p.value, maxAbs)
              .map(c => (p.ts, p.id, c))).toSeq
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = (st0.pending ++ incoming)
            .sortBy(p => (p._1, p._2))
            .partition(_._1 < wm)
          var recent = st0.recent
          val out = Seq.newBuilder[Smoothed]
          ready.foreach { case (ts, id, c) =>
            val window = (recent :+ c).takeRight(horizon) // oldest first
            // weights 2^0 (oldest) .. 2^(len-1) (current): identical to
            // the batch lag-chain's 2^(H-1-j) renormalized over the
            // weights actually present
            var num = 0L; var weight = 1L
            window.foreach { x => num += x * weight; weight <<= 1 }
            val den = weight - 1 // Σ 2^k, k < len
            out += Smoothed(key, id, ts, c.toDouble / 100.0,
              num.toDouble / (den * 100L).toDouble)
            recent = window.takeRight(horizon - 1)
          }
          state.update(EwmaState(recent, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 1, pending.map(_._1).min + 1))
          out.result().iterator
        })
  }
}
