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

  /** Convenience: the output mode this operator is correct under. */
  val outputMode: OutputMode = OutputMode.Update
}
