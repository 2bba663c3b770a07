package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor: the incremental twin of
  * [[graft.operators.Series.cusumFixedTarget]] — per key, fold the
  * classic S := max(0, S + (x − target)) over events in (ts, id)
  * order and emit a flag row whenever S exceeds the drift threshold.
  *
  * Order is the whole problem in a stream: the fold is
  * order-sensitive, so events above the watermark BUFFER in state and
  * fold only once the watermark passes them — each event folds exactly
  * once, in event-time order, regardless of arrival order or replay
  * (the same watermark-closed determinism contract as
  * [[AsofStreaming]]/[[ResampleStreaming]]).
  *
  * State per key is one running BIGINT plus the out-of-orderness
  * buffer — O(watermark delay), never O(history). All arithmetic is
  * integer cents (the batch twin's scheme), so the flag set is
  * bit-identical to the batch formulation on the same data —
  * spec-pinned.
  */
object CusumStreaming {

  case class Pt(key: String, id: Long, ts: Long, value: Double,
                event_time: Timestamp)

  def pt(key: String, id: Long, ts: Long, value: Double): Pt =
    Pt(key, id, ts, value, new Timestamp(ts))

  case class Flag(key: String, id: Long, ts: Long, cusum: Double)

  /** `s` = running CUSUM (cents) at the fold frontier; `pending` =
    * (ts, id, cents) not yet at-or-below the watermark.
    */
  case class CusumState(s: Long, pending: Seq[(Long, Long, Long)])

  def withEventTime(events: Dataset[Pt],
                    delay: String = "0 seconds"): Dataset[Pt] = {
    import events.sparkSession.implicits._
    EventTime.attach(events, delay)
  }

  /** |cents| bound — the single shared constant with the batch twin
    * ([[graft.operators.Series.CusumCentsBound]]): both sides raise on
    * a value beyond it, so the twin contract stays "divergence nowhere
    * or an error on both sides". Headroom: 2²⁰ max-magnitude events
    * before the stream's running Long could wrap; the raise carries a
    * diagnosable message instead of a bare ArithmeticException (which
    * would re-kill the query on every checkpoint restart with no clue).
    */
  val CentsBound: Long = graft.operators.Series.CusumCentsBound

  def cusumStreaming(events: Dataset[Pt], targetCents: Long,
                     driftCents: Long): Dataset[Flag] = {
    require(driftCents >= 0, s"driftCents must be >= 0, got $driftCents")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Pt],
         state: GroupState[CusumState]) => {
          val st0 = state.getOption.getOrElse(CusumState(0L, Nil))
          // shared Cents.halfUp: non-finite rows drop — the identical
          // set the batch twin's Graft.cents nulls-and-filters — and a
          // magnitude beyond CentsBound raises a diagnosable error
          val incoming = rows
            .flatMap(p => Cents.halfUp(p.value, CentsBound)
              .map(c => (p.ts, p.id, c))).toSeq
          val wm = state.getCurrentWatermarkMs()
          // fold everything the watermark has sealed, in event order
          val (ready, pending) = (st0.pending ++ incoming)
            .sortBy(p => (p._1, p._2))
            .partition(_._1 < wm)
          var s = st0.s
          val out = Seq.newBuilder[Flag]
          ready.foreach { case (ts, id, c) =>
            s = math.max(0L, s + (c - targetCents))
            if (s > driftCents)
              out += Flag(key, id, ts, s.toDouble / 100.0)
          }
          state.update(CusumState(s, pending))
          // wake when the watermark can seal the oldest buffered event
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(wm + 1, pending.map(_._1).min + 1))
          out.result().iterator
        })
  }
}
