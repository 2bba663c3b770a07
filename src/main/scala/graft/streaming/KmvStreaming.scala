package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming windowed distinct-count sketch: per tumbling window, a
  * KMV (k-minimum-values) buffer maintained in keyed state, emitted
  * when the watermark closes the window — the streaming twin of
  * `Dedup.kmvDistinct` (d5), sharing its insert fold and its hash, so
  * a closed window's estimate is BIT-IDENTICAL to the batch sketch
  * over the same rows (spec-pinned).
  *
  * The built-in alternative — windowed
  * `approx_count_distinct`/`dropDuplicates` — either keeps one state
  * row per distinct value per open window (unbounded for open
  * vocabularies: urls, ids) or gives a seeded, engine-specific HLL
  * estimate. Here state is ≤ k longs per open window REGARDLESS of
  * cardinality, and KMV is a deterministic function of the value SET:
  * arrival order, batch boundaries, and replays cannot change the
  * emitted row (no fold-order pinning needed, unlike the MG sketch in
  * [[FrequencyStreaming]] — set semantics give it for free).
  *
  * One window is one state key; per-row work and state are O(k), so
  * a hot window bounds task work by the stream's arrival rate, not by
  * distinct cardinality. (Sharding a window is possible — k-mins
  * union/re-min at emission — but unnecessary until a single key's
  * INGEST rate, not its cardinality, is the bottleneck.)
  */
object KmvStreaming {

  case class ValueEvent(value: String, ts: Long, event_time: Timestamp)

  object ValueEvent {
    def at(value: String, ts: Long): ValueEvent =
      ValueEvent(value, ts, new Timestamp(ts))
  }

  /** One closed window: exact distinct while below k (estimate null),
    * the (k−1)·2⁴⁸/kth estimator once the sketch is full — the same
    * output contract as the batch `kmvDistinct`.
    */
  case class WindowedDistinct(window_start: Long, distinct_le_k: Long,
                              kmv_estimate: java.lang.Double)

  /** Input must carry a watermark on `event_time`. */
  def windowedDistinct(events: Dataset[ValueEvent], windowMillis: Long,
                       k: Int = 64): Dataset[WindowedDistinct] = {
    require(windowMillis > 0, s"windowMillis must be positive")
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import events.sparkSession.implicits._
    events.groupByKey(e => Math.floorDiv(e.ts, windowMillis))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (window: Long, rows: Iterator[ValueEvent],
         state: GroupState[Seq[Long]]) => {
          if (state.hasTimedOut) {
            val mins = state.get
            state.remove()
            val est: java.lang.Double =
              if (mins.size == k)
                (k - 1).toDouble * 281474976710656.0 / mins.last
              else null
            Iterator.single(WindowedDistinct(
              window * windowMillis, mins.size.toLong, est))
          } else {
            // set semantics: fold order is irrelevant, no sort needed
            val merged = rows.filter(_.value != null)
              .foldLeft(state.getOption.getOrElse(Vector.empty[Long]))(
                (b, e) => Dedup.kmvInsert(k)(b, Dedup.kmvHash(e.value)))
            // an all-null window must not materialize state: the batch
            // twin (kmvDistinct) filters nulls BEFORE groupBy and emits
            // no row for such a group — creating state here would emit
            // a phantom (window, 0, null) row on timeout
            if (merged.isEmpty && state.getOption.isEmpty) Iterator.empty
            else {
              state.update(merged)
              // close when the watermark passes window end (must stay
              // strictly ahead of the current watermark)
              state.setTimeoutTimestamp(
                math.max((window + 1) * windowMillis,
                  state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
        })
  }
}
