package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream AS-OF join: each left (probe) row is enriched with the
  * most recent right (reference) row at-or-before its event time on the
  * same key — the streaming twin of `graft.operators.Temporal.asofJoin`
  * (point-in-time dim enrichment: "what was the last known price /
  * config / state when this event happened").
  *
  * Spark's built-in stream-stream joins can't express this: a time-BOUND
  * interval join emits every right row in the window, not the single
  * most recent, and an unbounded `rts <= lts` condition would retain
  * all history. This operator holds exactly the state AS-OF needs:
  *
  *  - rights newer than the watermark (still reorderable), plus ONE
  *    floor row — the latest right at-or-below the watermark — which is
  *    the only older right any future left can match;
  *  - lefts newer than the watermark (their match set isn't final yet).
  *
  * A left row is emitted exactly once, when the watermark passes
  * STRICTLY beyond its timestamp: Spark admits rows with event time
  * equal to the watermark as on-time, so a right at `rts == lts == wm`
  * can still arrive — only `lts < wm` guarantees every admissible
  * `rts <= lts` right has been seen, making emission deterministic
  * under replay and arrival order — verified in the spec against the
  * batch [[graft.operators.Temporal.asofJoin]] on identical data. Rows on EITHER side older than the watermark at
  * arrival are late data and dropped before the operator (the standard
  * watermark contract) — size the [[withEventTime]] delay to the
  * expected cross-stream skew.
  *
  * Scale shape: state per key is O(out-of-orderness window), not
  * O(history) — the floor compaction is what makes an unbounded
  * reference stream joinable forever. Keys partition across executors
  * by groupByKey; no broadcast, no per-row RPC (contrast the
  * reference's async Phoenix lookup pattern,
  * `gmall-realtime/src/main/java/com/atguigu/app/func/AsyncDimFunction.java:36-62`
  * — set-oriented state replaces the cache + thread pool).
  *
  * Equal right timestamps on one key are deduplicated to the lexico-
  * graphically greatest value, so results don't depend on arrival
  * order (the batch twin instead requires callers to pre-dedup ties).
  */
object AsofStreaming {

  /** Input row: `side` 0 = right/reference, 1 = left/probe. Build with
    * [[AsofEvent.left]]/[[AsofEvent.right]]; `event_time` must carry
    * the watermark (see [[withEventTime]]).
    */
  case class AsofEvent(key: String, ts: Long, side: Int, value: String,
                       event_time: Timestamp = null)

  object AsofEvent {
    def left(key: String, ts: Long, value: String): AsofEvent =
      AsofEvent(key, ts, 1, value, new Timestamp(ts))
    def right(key: String, ts: Long, value: String): AsofEvent =
      AsofEvent(key, ts, 0, value, new Timestamp(ts))
  }

  /** One emitted probe row: the left's own fields plus the matched
    * right's (null when no right at-or-before exists).
    */
  case class AsofMatch(key: String, ts: Long, value: String,
                       asof_ts: java.lang.Long, asof_value: String)

  /** Buffered (ts, value) rows pending watermark passage. */
  case class AsofState(lefts: Seq[(Long, String)],
                       rights: Seq[(Long, String)])

  /** Attach the watermark the stateful operator requires. */
  def withEventTime(events: Dataset[AsofEvent],
                    delay: String = "0 seconds"): Dataset[AsofEvent] = {
    import events.sparkSession.implicits._
    EventTime.attach(events, delay)
  }

  def asofStreaming(events: Dataset[AsofEvent]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[AsofEvent],
         state: GroupState[AsofState]) => {
          val st = state.getOption.getOrElse(AsofState(Nil, Nil))
          val (newL, newR) =
            rows.toSeq.partition(_.side == 1) match {
              case (l, r) => (l.map(e => (e.ts, e.value)),
                r.map(e => (e.ts, e.value)))
            }
          val wm = state.getCurrentWatermarkMs()
          // dedup equal right timestamps to the max value — arrival-
          // order-independent, so replay emits identical rows
          val rights = (st.rights ++ newR)
            .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
            .toSeq.sortBy(_._1)
          val lefts = st.lefts ++ newL
          // watermark-closed lefts emit now, in deterministic order;
          // STRICT <: a right at rts == wm is still on-time, so a left
          // at lts == wm is not final yet
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.sorted.map { case (lts, lv) =>
            rights.takeWhile(_._1 <= lts).lastOption match {
              case Some((rts, rv)) => AsofMatch(key, lts, lv, rts, rv)
              case None => AsofMatch(key, lts, lv, null, null)
            }
          }
          // evict rights the floor row supersedes
          val floor = rights.filter(_._1 <= wm).lastOption
          val keptRights = floor.toSeq ++ rights.filter(_._1 > wm)
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofState(pending, keptRights))
            // wake when the watermark passes the oldest pending left
            // (pending ts > wm by construction, as the API requires);
            // with only a floor row there's nothing left to emit — no
            // timeout, the row idles as the key's standing dim state
            pending.map(_._1).minOption.foreach(t =>
              state.setTimeoutTimestamp(t + 1))
          }
          out.iterator
        })
  }
}
