package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Series
import graft.sinks.Sinks

/** Streaming distribution-drift monitor — the streaming twin of
  * `Series.distributionDrift` (s10), on the same additive-state
  * recipe as [[QuantileStreaming]]: the drift statistic is a pure
  * function of per-(day, category) COUNTS, counts are additive, so
  * each micro-batch MERGEs its counts into a compacted table behind
  * the batch-id ledger (`Sinks.mergeAgg`, exactly-once under replay)
  * and the shared finisher (`Series.driftFromCounts`) serves
  * day-over-day total-variation distances BIT-IDENTICAL to the batch
  * operator over the same events — at any arrival order, batch
  * slicing, or crash/replay history. Late events are NOT dropped:
  * an event for an old day merges into that day's counts and the
  * served drift for that day (and the next) simply becomes more
  * accurate — the monitoring semantics a watermarked windowed agg
  * can't give without discarding stragglers.
  *
  * Scale shape: per batch, a map-side reduction of arriving rows to
  * their distinct (day, typ) pairs; the MERGE rewrite is bounded by
  * the compacted table (days × categories — monitoring-sized, never
  * event-sized); serving is two tiny aggregations and a day-shifted
  * self-join on the same table.
  */
object DriftStreaming {

  /** Per-batch maintenance body: (day, typ) counts → `path/table`. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tsCol: String,
                 typeCol: String, path: String, batchId: Long): Unit =
    Sinks.mergeAgg(spark,
      batch.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
        .groupBy(
          graft.core.Graft.floorDivExpr(s"unix_millis($tsCol)", 86400000L)
            .as("day"),
          col(typeCol).as("typ"))
        .agg(count(lit(1)).as("n")),
      path, keyCols = Seq("day", "typ"), sumCols = Seq("n"),
      batchId = batchId)

  /** Start the maintenance query for a streaming event frame. */
  def maintain(stream: DataFrame, tsCol: String, typeCol: String,
               path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch.sparkSession, batch, tsCol, typeCol, path, batchId)
      }
      .start()

  /** Serve current day-over-day drift from the compacted counts. */
  def serve(spark: SparkSession, path: String): DataFrame =
    Series.driftFromCounts(spark.read.parquet(s"$path/table"))

  /** Serve the s12 seasonal decomposition from the SAME compacted
    * counts table — the drift ledger's (day, typ, n) state is exactly
    * the daily-volume series, so one maintenance query feeds both
    * monitoring surfaces (bit-identical to the batch twin; spec-pinned).
    */
  def serveSeasonal(spark: SparkSession, path: String,
                    halfWindow: Int = 3): DataFrame =
    Series.seasonalFromCounts(
      spark.read.parquet(s"$path/table")
        .select(col("typ"), col("day"), col("n").as("ev_ct")),
      halfWindow)
}
