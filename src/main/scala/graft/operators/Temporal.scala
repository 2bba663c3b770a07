package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively.
  *
  * [[asofJoin]]: for every left row, the single most recent right row
  * with `rts <= lts` on the same key (point-in-time join — "what was
  * the last purchase/price/state as of this event"). Built by
  * composition, per the custom-operator preference order: no custom
  * plan node needed.
  *
  * Scale shape: the naive formulation (range join + row_number) pairs
  * every left row with ALL earlier right rows per key before ranking —
  * quadratic in history. This implementation unions the two sides and
  * takes a running `last(right, ignoreNulls)` over (key, time) — one
  * shuffle on key, one ordered scan per partition, O(n log n) total,
  * no pairwise blowup regardless of history depth. (The window is
  * running-frame, so Spark evaluates it in a single pass; at extreme
  * per-key cardinality, pre-bucketing by coarse time range bounds the
  * sort.)
  */
object Temporal {

  /** Range (interval-containment) join with NO equi key: each left
    * point row joins the right interval rows containing it. A naive
    * theta-join plans as a nested loop (quadratic); here both sides
    * bucket by `bucketMicros` — intervals explode into the buckets
    * they cover, points map to their single bucket — so the physical
    * join is an equi-join on the bucket id, then an exact containment
    * filter. Each qualifying (point, interval) pair surfaces exactly
    * once: the point's own bucket. Choose bucketMicros ≈ typical
    * interval length: wider ⇒ fewer interval replicas, narrower ⇒
    * fewer false bucket-mates to filter.
    */
  def rangeJoin(points: DataFrame, pointTs: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketMicros: Long): DataFrame = {
    // CAST to TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ columns;
    // the session is pinned UTC so the cast is value-preserving
    val pb = points.withColumn("_bucket",
      expr(s"unix_micros(CAST($pointTs AS TIMESTAMP)) DIV $bucketMicros"))
    // guard the explode: an INVERTED interval (corrupt row) would
    // silently generate a DESCENDING sequence (Spark counts down for
    // b < a) whose pairs die in the containment filter — pure wasted
    // blowup — and an open-ended sentinel (valid_to 9999-12-31) at a
    // fine bucket would build a job-killing multi-billion-element
    // array. Inverted rows drop (DuckDB's range() yields empty for
    // them, so the oracle agrees); over-wide rows raise with the
    // remedy rather than dying deep inside array allocation.
    val b0 = expr(s"unix_micros(CAST($startCol AS TIMESTAMP)) DIV $bucketMicros")
    val b1 = expr(s"unix_micros(CAST($endCol AS TIMESTAMP)) DIV $bucketMicros")
    val maxBuckets = 1L << 20
    val ib = intervals
      .filter(b1 >= b0)
      .withColumn("_bucket",
        explode(sequence(b0,
          when(b1 - b0 < maxBuckets, b1)
            .otherwise(raise_error(concat(
              lit(s"rangeJoin: interval spans >= $maxBuckets buckets of "),
              lit(s"$bucketMicros micros — use a coarser bucketMicros or "),
              lit("clamp open-ended sentinels first"))).cast(org.apache.spark.sql.types.LongType)))))
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("_bucket")
  }

  /** Nearest-event join: for every left row, the single right row on
    * the same key minimizing |rts − lts|, ties broken toward the
    * EARLIER right row (the at-or-before side). The bidirectional
    * complement of [[asofJoin]] — sensor alignment, "closest
    * measurement to this event" — where as-of's backward-only rule
    * would miss a reading 1s in the future in favor of one 10min old.
    *
    * Same scale shape as [[asofJoin]]: union the sides, ONE shuffle on
    * key, one ordered partition scan serving two running frames — the
    * last right at-or-before (running `last ignoreNulls`) and the
    * first right strictly-after (forward `first ignoreNulls`) — then a
    * per-row arithmetic pick. Never a pairwise product, O(n log n) at
    * any history depth. Both window frames reuse the SAME sort order,
    * so the physical plan is one Exchange + one Sort with two Window
    * ops over it.
    *
    * Null handling mirrors [[asofJoin]]: null-key/null-ts right rows
    * never match; null-key/null-ts left rows pass through with a null
    * `_nearest`. The carry struct gains the matched right timestamp as
    * `_rts` (callers need the gap; also makes the pick auditable).
    */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  keyL: String, keyR: String,
                  leftTs: String, rightTs: String,
                  rightCarry: Seq[String]): DataFrame = {
    val carryStruct = struct(
      col(rightTs).as("_rts") +: rightCarry.map(col): _*)
    val leftCols = left.columns.toSeq
    val r = right
      .filter(col(keyR).isNotNull && col(rightTs).isNotNull)
      .select(col(keyR).as(keyL), col(rightTs).as(leftTs),
        carryStruct.as("_carry"), lit(0).as("_side"))
    val l = left.withColumn("_carry",
        lit(null).cast(r.schema("_carry").dataType))
      .withColumn("_side", lit(1))
      .select(r.columns.toIndexedSeq.map(col) ++
        leftCols.filterNot(c => c == keyL || c == leftTs).map(col): _*)
    // right rows sort before left at equal ts ⇒ an equal-ts right is
    // in the BACKWARD frame with gap 0 — which also implements the
    // tie-break (a gap-0 prev always beats any next)
    val ord = Seq(col(leftTs), col("_side"))
    val wPrev = Window.partitionBy(col(keyL)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyL)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevC = col("_prev")
    val nextC = col("_next")
    val gapPrev = unix_micros(col(leftTs).cast("timestamp")) -
      unix_micros(prevC.getField("_rts").cast("timestamp"))
    val gapNext = unix_micros(nextC.getField("_rts").cast("timestamp")) -
      unix_micros(col(leftTs).cast("timestamp"))
    l.unionByName(r.select(r.columns.toIndexedSeq.map(col): _*), allowMissingColumns = true)
      .withColumn("_prev", last(col("_carry"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", first(col("_carry"), ignoreNulls = true).over(wNext))
      .filter(col("_side") === 1)
      .withColumn("_nearest",
        // guard FIRST: a null-ts left row sorts nulls-first, where the
        // forward frame would otherwise hand it the earliest right row
        when(col(leftTs).isNull, lit(null).cast(r.schema("_carry").dataType))
          .when(prevC.isNull, nextC)
          .when(nextC.isNull, prevC)
          .when(gapPrev <= gapNext, prevC)
          .otherwise(nextC))
      .select(leftCols.map(col) :+ col("_nearest"): _*)
  }

  /** @param leftTs  left event-time column (same type as rightTs)
    * @param rightTs right event-time column
    * @param rightCarry right-side columns carried onto each left row
    *                   as a `_asof` struct (null when no right row
    *                   precedes it)
    * Right-side ties on (key, ts) must be pre-deduplicated by the
    * caller if a deterministic winner matters. Null-keyed or null-ts
    * right rows never match (SQL ASOF semantics: `lts >= null` is
    * never true); null-keyed/null-ts left rows pass through with a
    * null `_asof`.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String,
               leftTs: String, rightTs: String,
               rightCarry: Seq[String]): DataFrame = {
    val carryStruct = struct(rightCarry.map(col): _*)
    val leftCols = left.columns.toSeq
    // a null key or ts can never satisfy key-equal && rts <= lts;
    // dropping such right rows also keeps them out of the nulls-first
    // sort position, where their carry would otherwise be served to
    // every left row (null-keyed left rows then partition alone and
    // null-ts left rows sort before every surviving right row → null)
    val r = right
      .filter(col(keyR).isNotNull && col(rightTs).isNotNull)
      .select(col(keyR).as(keyL), col(rightTs).as(leftTs),
        carryStruct.as("_carry"), lit(0).as("_side"))
    val l = left.withColumn("_carry",
        lit(null).cast(r.schema("_carry").dataType))
      .withColumn("_side", lit(1))
      .select(r.columns.toIndexedSeq.map(col) ++
        leftCols.filterNot(c => c == keyL || c == leftTs).map(col): _*)
    // right rows sort before left rows at the same timestamp, so an
    // equal-ts right row IS visible to the left row ("at or before")
    val w = Window.partitionBy(col(keyL))
      .orderBy(col(leftTs), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(r.columns.toIndexedSeq.map(col): _*), allowMissingColumns = true)
      .withColumn("_asof", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col("_asof"): _*)
  }
}
