package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed-state streaming operators: the reference's ValueState patterns
  * (is_new fix `BaseLogApp.java:62-95`, UV dedup
  * `UniqueVisitApp.java:44-84` with 1-day TTL :52-55, and the
  * UserJumpDetailApp bounce detection — a stub in the snapshot, rebuilt
  * here from the declared `uj_ct` output surface) as
  * `flatMapGroupsWithState`.
  *
  * State-size discipline for scale: every operator keeps O(1) state per
  * key (a date string or a small timestamp buffer), and TTL is enforced
  * with processing-time timeouts exactly like the reference's
  * StateTtlConfig.
  */
object StatefulOps {

  private def dayOf(tsMillis: Long): String =
    LocalDate.ofInstant(Instant.ofEpochMilli(tsMillis), ZoneOffset.UTC).toString

  /** Keyed event for the stateful ops. `event_time` mirrors `ts` as a
    * timestamp — the watermark column must remain in scope at the
    * stateful operator or event-time timeouts are rejected. The
    * trailing dimension fields (vc/ch/ar/during_time) are pure
    * pass-through — the reference's keyed operators carry the whole
    * JSONObject, so downstream stats keep their grouping dimensions;
    * they default to null/0 for callers that don't need them.
    */
  case class KeyedEvent(mid: String, ts: Long, is_new: String,
      page_id: String, last_page_id: String,
      event_time: Timestamp = null,
      vc: String = null, ch: String = null, ar: String = null,
      during_time: Long = 0L)

  object KeyedEvent {
    def at(mid: String, ts: Long, is_new: String = "1",
           page_id: String = null, last_page_id: String = null): KeyedEvent =
      KeyedEvent(mid, ts, is_new, page_id, last_page_id, new Timestamp(ts))
  }

  /** Stamp event_time from `ts` and attach a watermark — the standard
    * prelude for every stateful op here.
    */
  def watermarked(events: Dataset[KeyedEvent],
                  delay: String = "0 seconds"): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", delay)
      .as[KeyedEvent]
  }

  /** Streaming UV dedup: emit only the first event per (mid, day).
    * State = last seen day per mid (exactly the reference's
    * `ValueState<String>` holding a date). TTL is event-time driven:
    * state expires one day after the stored day ends (the reference's
    * 24h processing-time TTL, re-expressed in event time so idle
    * streams don't busy-poll — with processing-time timeouts the
    * micro-batch engine runs continuous empty batches).
    * Input must carry a watermark.
    *
    * Contract note: like the reference's keyed ValueState, "first" is
    * first-PROCESSED — events sort by ts within a micro-batch, but an
    * out-of-order earlier event arriving in a LATER batch is dropped
    * (its day is already marked), so the emitted row can differ from
    * the batch twin's min(ts) pick by up to the out-of-orderness
    * horizon. The batch UV input (Warehouse.uvIn, min(struct(ts,…)))
    * is normative for replay; this op mirrors the reference's
    * low-latency arrival semantics by design.
    */
  def uniqueVisitStreaming(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (mid: String, rows: Iterator[KeyedEvent], state: GroupState[String]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val lastDay = state.getOption
            val sorted = rows.toSeq.sortBy(e => (e.ts))
            val out = scala.collection.mutable.ArrayBuffer[KeyedEvent]()
            var cur = lastDay
            sorted.foreach { e =>
              val d = dayOf(e.ts)
              // strictly-later day only: a late previous-day event
              // arriving after rollover is dropped rather than
              // re-emitted (which would also double-count the current
              // day's next event); ISO dates compare lexicographically
              if (cur.forall(_ < d)) { out += e; cur = Some(d) }
            }
            cur.foreach { d =>
              state.update(d)
              // expire at end-of-day + 1 day (≈ reference 24h TTL),
              // but always strictly past the current watermark
              val dayStart = LocalDate.parse(d).atStartOfDay(ZoneOffset.UTC)
                .toInstant.toEpochMilli
              val deadline = dayStart + 2 * 86400000L
              state.setTimeoutTimestamp(
                math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
        })
  }

  /** Streaming is_new fix: a mid claiming is_new=1 after its first-seen
    * day is rewritten to 0 (reference `BaseLogApp.java:75-89`).
    *
    * The stored first-seen day is the MINIMUM day observed, not the
    * first-arrived: an on-time out-of-order earlier-day event lowers
    * the state, so every SUBSEQUENT event classifies exactly as the
    * batch twin ([[isNewFixBatch]], min over all days) would. Rows
    * already emitted before such a correction arrived cannot be
    * retracted in Append mode — the batch twin remains normative for
    * replay; this keeps the divergence window to the out-of-orderness
    * horizon instead of forever.
    */
  def isNewFixStreaming(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (mid: String, rows: Iterator[KeyedEvent], state: GroupState[String]) => {
          val sorted = rows.toSeq.sortBy(_.ts)
          var firstDay = state.getOption
          val out = sorted.map { e =>
            val d = dayOf(e.ts)
            if (firstDay.forall(_ > d)) { firstDay = Some(d); state.update(d) }
            if (e.is_new == "1" && firstDay.exists(_ < d)) e.copy(is_new = "0")
            else e
          }
          out.iterator
        })
  }

  /** Bounce (user-jump) detection: a page visit that *enters* a session
    * (last_page_id null) with no follow-up page within `gapMillis` is a
    * bounce. The reference curriculum does this with Flink CEP; the
    * declared output is `uj_ct` (bean/VisitorStats.java:31). Here:
    * event-time timeout state machine per mid.
    *
    * Batch twin ([[bounceBatch]]) uses a lead() window — used by the
    * correctness harness; the streaming path folds WATERMARK-SEALED
    * events in event-time order, so both paths emit the same rows for
    * any arrival order of watermark-admissible input (not just
    * in-order arrival).
    */
  // state = the open entry event (so a bounce emits the original row —
  // is_new/page/event_time intact, exactly like bounceBatch's
  // pass-through) plus the out-of-orderness buffer: the bounce verdict
  // is only rendered from WATERMARK-SEALED events in event-time order.
  // Deciding from arrival order would irrevocably emit a false bounce
  // in Append mode when an on-time out-of-order follow-up lands in a
  // later micro-batch (the batch twin's lead() would disagree).
  case class BounceState(entry: Option[KeyedEvent],
                         pending: Seq[KeyedEvent])

  /** Reserved key for watermark-heartbeat rows on DERIVED topics —
    * Flink's idle-channel watermark forwarding, re-expressed. A
    * derived stream (bounce verdicts) emits rows stamped with their
    * ORIGINAL event time, so its topic's event times trail the
    * upstream watermark by construction; worse, when the derivation
    * produces NO rows (no bounces all day), a downstream per-leg
    * watermark never advances and every fan-in window stays open.
    * Heartbeat rows close that liveness gap: each micro-batch the
    * derivation also emits one control row carrying the stream's
    * TRUE horizon (`upstream watermark − gap`: every entry older is
    * decided, so no future verdict can be older), letting every
    * downstream leg advance uniformly whether or not verdicts flow.
    * Consumers aggregate heartbeats into a sentinel-keyed group with
    * zero-valued measures and drop that group POST-aggregation (a
    * pre-watermark filter would be pushed below the watermark
    * operator and re-open the stall — the SCALING.md round-10
    * lesson).
    */
  val heartbeatMid = "__hb__"

  /** Inject one heartbeat-keyed marker row per non-empty partition —
    * apply BEFORE `withWatermark` (the marker copies a data row's
    * event time, so it never distorts the watermark) and before
    * [[bounceStreaming]], whose state function turns the markers into
    * heartbeat output rows. Without markers the bounce operator emits
    * no heartbeats — the batch-twin-compatible default.
    */
  def withHeartbeatMarkers(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.mapPartitions { it =>
      var injected = false
      it.flatMap { e =>
        if (!injected) { injected = true
          Iterator(e, e.copy(mid = heartbeatMid))
        } else Iterator.single(e)
      }
    }
  }

  def bounceStreaming(events: Dataset[KeyedEvent],
                      gapMillis: Long = 10000L): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    // Input must carry a watermark (the caller sets withWatermark before
    // converting to Dataset): it both seals events for in-order folding
    // and fires the timeout for entries with no follow-up at all.
    events.groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (mid: String, rows: Iterator[KeyedEvent], state: GroupState[BounceState]) => {
          if (mid == heartbeatMid) {
            // control group ([[heartbeatMid]]): drain markers, emit the
            // derived stream's horizon, and keep a standing timeout so
            // the group wakes on every watermark advance — including
            // no-data batches — for as long as the query lives
            rows.foreach(_ => ())
            val wm = state.getCurrentWatermarkMs()
            state.update(BounceState(None, Nil))
            state.setTimeoutTimestamp(wm + 1)
            val horizon = wm - gapMillis
            if (horizon > 0)
              Iterator.single(KeyedEvent(heartbeatMid, horizon, "0",
                null, null, new Timestamp(horizon),
                heartbeatMid, heartbeatMid, heartbeatMid, 0L))
            else Iterator.empty
          } else {
          val st0 = state.getOption.getOrElse(BounceState(None, Nil))
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = (st0.pending ++ rows)
            .sortBy(_.ts)
            .partition(_.ts < wm)
          var entry = st0.entry
          val out = scala.collection.mutable.ArrayBuffer[KeyedEvent]()
          ready.foreach { e =>
            entry.foreach { prev =>
              // the sealed next event renders the verdict for the open
              // entry either way: bounce iff it came too late
              if (e.ts - prev.ts > gapMillis) out += prev
              entry = None
            }
            if (e.last_page_id == null || e.last_page_id.isEmpty)
              entry = Some(e)
          }
          // no sealed follow-up AND the watermark passed the gap →
          // nothing admissible can still rescue the entry: bounce
          entry.foreach { prev =>
            if (wm > prev.ts + gapMillis) { out += prev; entry = None }
          }
          if (entry.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(BounceState(entry, pending))
            // wake at whichever decision point comes first: the open
            // entry's gap deadline or the sealing of the oldest
            // buffered event — always strictly past the watermark
            val wake = (entry.map(_.ts + gapMillis + 1).toSeq ++
              pending.map(_.ts + 1)).min
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          out.iterator
          }
        })
  }

  /** Batch bounce detection: entry pages whose next page view for the
    * same mid is > gap away (or absent). Passes the full entry row
    * through (minus the helper column) so downstream stats keep their
    * dimension columns.
    */
  def bounceBatch(df: DataFrame, gapMillis: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("mid")).orderBy(col("ts"))
    df.withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter((col("last_page_id").isNull || col("last_page_id") === "") &&
        (col("next_ts").isNull || col("next_ts") - col("ts") > gapMillis))
      .drop("next_ts")
  }
}
