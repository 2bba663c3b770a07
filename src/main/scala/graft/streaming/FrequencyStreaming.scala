package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Frequency.MisraGries

/** Streaming windowed frequent items: per tumbling window, a bounded
  * Misra–Gries sketch maintained in keyed state, emitted when the
  * watermark closes the window.
  *
  * The built-in alternative — windowed `groupBy(token).count()` —
  * keeps one state row per DISTINCT token per open window: fine for a
  * bounded vocabulary, unbounded growth for an open one (urls,
  * n-grams, ids). Here state is ≤ k counters per window subshard
  * REGARDLESS of vocabulary, the same mergeable sketch the batch
  * [[graft.operators.Frequency.heavyHitters]] uses for its candidate
  * pass. The price is the MG guarantee instead of exactness: emitted
  * counts are within n_window/(k+1) of truth, and every token above
  * that threshold is present (no false negatives). A batch exact pass
  * over the window's archived data refines candidates when needed —
  * the streaming sketch is the alerting/candidate tier.
  *
  * Emission is watermark-closed and deterministic for a given input
  * set: rows fold into the sketch in (ts, token) order, so replayed
  * batches rebuild the identical sketch. (MG itself is arrival-order
  * sensitive at the margin — pinning the fold order is what makes the
  * streaming result reproducible.)
  */
object FrequencyStreaming {

  case class TokenEvent(token: String, ts: Long, event_time: Timestamp)

  object TokenEvent {
    def at(token: String, ts: Long): TokenEvent =
      TokenEvent(token, ts, new Timestamp(ts))
  }

  /** One frequent item of a closed window: window start millis, the
    * token, and its MG count (true count − at most n_window/(k+1)).
    */
  case class WindowedItem(window_start: Long, token: String, ct: Long)

  /** Input must carry a watermark on `event_time` (see
    * [[StatefulOps.watermarked]] for the standard prelude shape).
    *
    * `subshards` spreads each window over that many state keys by a
    * hash of the token — without it, one tumbling window funnels the
    * whole stream through a single task. Tokens are DISJOINT across
    * subshards (hash-partitioned), so the union of the emitted rows
    * IS the window's result with no merge stage, state is ≤ k·subshards
    * counters per window, and the retention guarantee tightens to
    * "count > n_subshard/(k+1)" per token's own subshard. 1 reproduces
    * the single-sketch semantics exactly.
    */
  def windowedHeavyHitters(events: Dataset[TokenEvent],
                           windowMillis: Long,
                           k: Int,
                           subshards: Int = 16): Dataset[WindowedItem] = {
    require(windowMillis > 0 && k >= 1 && subshards >= 1)
    import events.sparkSession.implicits._
    val mg = new MisraGries(k)
    // floorDiv, not /: Long division truncates toward zero, which
    // would merge pre-epoch (negative) timestamps into window 0 —
    // floor semantics match the batch window()/DIV bucketing
    events.groupByKey(e => (Math.floorDiv(e.ts, windowMillis),
        Math.floorMod(if (e.token == null) 0 else e.token.hashCode,
          subshards)))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Long, Int), rows: Iterator[TokenEvent],
         state: GroupState[Map[String, Long]]) => {
          val window = key._1
          if (state.hasTimedOut) {
            val sketch = state.get
            state.remove()
            sketch.iterator
              .map { case (t, c) => WindowedItem(window * windowMillis, t, c) }
              .toSeq.sortBy(i => (i.token)).iterator
          } else {
            // deterministic fold order → replay-identical sketches
            val sorted = rows.filter(_.token != null).toSeq
              .sortBy(e => (e.ts, e.token))
            state.update(sorted.foldLeft(
              state.getOption.getOrElse(mg.zero))((b, e) => mg.reduce(b, e.token)))
            // close when the watermark passes window end (must stay
            // strictly ahead of the current watermark)
            state.setTimeoutTimestamp(
              math.max((window + 1) * windowMillis,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        })
  }
}
