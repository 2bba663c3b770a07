package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming grid resample with forward fill: the streaming twin of
  * `graft.operators.Series.resample`. For each key, one output row per
  * step-aligned grid instant between the key's first and latest
  * observation, carrying the most recent observation at-or-before the
  * instant — emitted exactly once, when the watermark passes STRICTLY
  * beyond it (an observation stamped exactly at the watermark is still
  * on-time and could change the fill, same strictness argument as
  * [[AsofStreaming]]).
  *
  * Spark's built-ins can't express this: a windowed aggregation emits
  * only windows that contain events (gap fill needs rows for EMPTY
  * steps), and stream-stream joins would need the grid side generated
  * from the stream itself. Keyed state holds:
  *
  *  - at most ONE observation per not-yet-final grid bucket (two obs
  *    in one bucket: the earlier can never be "last at-or-before" any
  *    grid instant — compacted on arrival);
  *  - one floor row — the latest observation at-or-below the emission
  *    frontier — which fills every future empty step.
  *
  * So state per key is O(out-of-orderness / step), never O(history):
  * the same floor compaction that makes [[AsofStreaming]]'s reference
  * side joinable forever. Grid emission is bounded by the latest
  * observation seen so far — a silent key stops producing rows (and
  * resumes, gap-filled, when it speaks again), which is exactly the
  * batch twin's [ceil(min), floor(max)] contract applied to a stream
  * — equivalence is spec-pinned on identical data.
  *
  * Equal observation timestamps on one key deduplicate to the greatest
  * value, matching the batch twin's MAX tie rule — replay and arrival
  * order can't change emitted rows.
  */
object ResampleStreaming {

  /** One observation; `event_time` carries the watermark. */
  case class Obs(key: String, ts: Long, value: Double,
                 event_time: Timestamp)

  def obs(key: String, ts: Long, value: Double): Obs =
    Obs(key, ts, value, new Timestamp(ts))

  /** One emitted grid row: instant, filled value, and the timestamp of
    * the observation that supplied it (staleness).
    */
  case class GridPoint(key: String, grid_ts: Long, value: Double,
                       obs_ts: Long)

  /** `nextBucket` = first unemitted grid index; `kept` = compacted
    * (ts, value) observations (floor + one per in-flight bucket).
    */
  case class ResampleState(nextBucket: Long, kept: Seq[(Long, Double)])

  /** Attach the watermark the stateful operator requires; size `delay`
    * to the expected out-of-orderness.
    */
  def withEventTime(events: Dataset[Obs],
                    delay: String = "0 seconds"): Dataset[Obs] = {
    import events.sparkSession.implicits._
    EventTime.attach(events, delay)
  }

  def resampleStreaming(events: Dataset[Obs],
                        stepMs: Long): Dataset[GridPoint] = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    import events.sparkSession.implicits._
    // grid index whose instant (b*step) is the first at-or-after ts
    def ceilBucket(ts: Long) = math.floorDiv(ts + stepMs - 1, stepMs)

    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Obs],
         state: GroupState[ResampleState]) => {
          val newObs = rows.map(o => (o.ts, o.value)).toSeq
          val st0 = state.getOption.getOrElse(
            ResampleState(ceilBucket(newObs.map(_._1).min), Nil))
          // an on-time obs BELOW the seeded grid start lowers the
          // frontier (batch twin starts at ceil of the true min). This
          // can never re-emit: every emitted instant is strictly below
          // the watermark, every admissible obs is at-or-above it, and
          // ceil only moves the instant further up from the obs.
          val st = if (newObs.isEmpty) st0
            else st0.copy(nextBucket = math.min(st0.nextBucket,
              ceilBucket(newObs.map(_._1).min)))
          val wm = state.getCurrentWatermarkMs()
          // merge + compact: equal ts → max value; per bucket keep the
          // latest obs (an earlier same-bucket obs can never fill any
          // grid instant); everything at-or-below the frontier folds
          // into one floor row
          val merged = (st.kept ++ newObs)
            .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
            .toSeq.sortBy(_._1)
          val frontier = (st.nextBucket - 1) * stepMs
          val floor = merged.filter(_._1 <= frontier).lastOption
          val inFlight = merged.filter(_._1 > frontier)
            .groupBy(o => ceilBucket(o._1))
            .map { case (_, vs) => vs.maxBy(_._1) }
            .toSeq.sortBy(_._1)
          var kept = floor.toSeq ++ inFlight
          val maxTs = kept.map(_._1).maxOption.getOrElse(Long.MinValue)

          var next = st.nextBucket
          val out = Seq.newBuilder[GridPoint]
          // strict < wm: an obs at ts == wm is still admissible and
          // could become the fill for g == wm
          while (next * stepMs < wm && next * stepMs <= maxTs) {
            val g = next * stepMs
            // seeded at ceil(first obs), so a fill always exists
            val (ots, ov) = kept.takeWhile(_._1 <= g).last
            out += GridPoint(key, g, ov, ots)
            // advance the floor; earlier rows are dead
            kept = Seq((ots, ov)) ++ kept.filter(_._1 > g)
            next += 1
          }
          state.update(ResampleState(next, kept))
          // wake when the watermark passes the next awaited instant;
          // a fully-drained key idles (state = its standing floor)
          // until new observations extend the grid
          if (next * stepMs <= maxTs)
            state.setTimeoutTimestamp(next * stepMs + 1)
          out.result().iterator
        })
  }
}
