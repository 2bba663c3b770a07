package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CDC latest-state maintenance: the incremental twin of
  * [[graft.sources.CdcRouter.latestState]] — per key, keep the change
  * with the highest (ts, id) and emit the refreshed snapshot row each
  * time it advances (update semantics; the sink upserts by key, the
  * reference's dim-upsert contract).
  *
  * Unlike the CUSUM/as-of/resample twins, NO watermark buffering is
  * needed: "latest by (ts, id)" is a max — commutative and idempotent
  * — so any arrival order, replay, or duplicate delivery folds to the
  * same state (spec-pinned). State per key is ONE snapshot row,
  * independent of history length; deletes stay in state (a later
  * revive must compare against them) and surface as `deleted = true`
  * so the sink can tombstone.
  */
object LatestStateStreaming {

  case class Change(key: Long, ts: Long, id: Long, op: String,
                    payload: String, value: Double)

  case class Snapshot(key: Long, ts: Long, id: Long, op: String,
                      payload: String, value: Double, deleted: Boolean)

  private def snap(c: Change): Snapshot =
    Snapshot(c.key, c.ts, c.id, c.op, c.payload, c.value,
      deleted = c.op == "delete")

  /** Run with `OutputMode.Update`: each batch emits one row per key
    * whose latest change ADVANCED (or arrived) — a batch of only
    * stale/duplicate changes emits nothing, so an upserting sink sees
    * no redundant traffic under replay. (maxBy keeps the FIRST max, so
    * a replayed change tying the stored (ts, id) resolves to the
    * stored snapshot and stays silent.)
    */
  def latestStateStreaming(changes: Dataset[Change]): Dataset[Snapshot] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[Change],
         state: org.apache.spark.sql.streaming.GroupState[Snapshot]) => {
          val prior = state.getOption
          val best = (prior.iterator ++ rows.map(snap))
            .maxBy(s => (s.ts, s.id))
          if (prior.contains(best)) Iterator.empty
          else { state.update(best); Iterator.single(best) }
        })
  }

  /** TTL variant: identical semantics to [[latestStateStreaming]] for
    * live keys, but DELETE tombstones are evicted from state once the
    * event-time watermark passes `ts + tombstoneTtlMs` — without this,
    * state grows with total key cardinality forever on high-churn CDC
    * feeds (dead keys never leave). Live snapshots still live forever:
    * they ARE the maintained table.
    *
    * Contract changes vs the NoTimeout variant (both are consequences
    * of having a watermark, and both require
    * `tombstoneTtlMs` > the feed's out-of-orderness horizon):
    *  - changes older than the watermark are dropped (standard
    *    stateful-op late-data semantics);
    *  - a revive arriving AFTER its key's tombstone was evicted
    *    re-inserts as a fresh key (the stored (ts, id) it would have
    *    had to beat is gone).
    * A revive arriving BEFORE eviction leaves the pending timeout in
    * place; the timeout callback checks `deleted` and keeps the live
    * snapshot, so no live row is ever evicted.
    */
  def latestStateStreamingTtl(changes: Dataset[Change],
                              watermarkDelay: String,
                              tombstoneTtlMs: Long): Dataset[Snapshot] = {
    import changes.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    require(tombstoneTtlMs > 0, s"tombstoneTtlMs must be > 0, got $tombstoneTtlMs")
    changes.toDF()
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[Change],
         state: org.apache.spark.sql.streaming.GroupState[Snapshot]) => {
          if (state.hasTimedOut) {
            // only a still-tombstoned key is evicted; a key revived
            // after its delete keeps its (stale-timeout) live snapshot
            if (state.getOption.forall(_.deleted)) state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
            val best = (prior.iterator ++ rows.map(snap))
              .maxBy(s => (s.ts, s.id))
            if (prior.contains(best)) Iterator.empty
            else {
              state.update(best)
              if (best.deleted)
                // a tombstone already older than watermark+ttl must
                // still be settable (Spark rejects timestamps <= wm)
                state.setTimeoutTimestamp(math.max(
                  best.ts + tombstoneTtlMs,
                  state.getCurrentWatermarkMs() + 1))
              Iterator.single(best)
            }
          }
        })
  }

  /** Convenience: the output mode this operator is correct under. */
  val outputMode: OutputMode = OutputMode.Update
}
