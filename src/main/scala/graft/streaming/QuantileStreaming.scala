package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

import graft.operators.Quantiles
import graft.sinks.Sinks

/** Streaming exact quantiles — the streaming twin of
  * `Quantiles.groupQuantiles` (t32), built on the additivity of its
  * value-count state: per micro-batch the batch's (group, value)
  * counts MERGE additively into a compacted counts table behind the
  * batch-id ledger (`Sinks.mergeAgg`, exactly-once under replay), and
  * quantiles are served on read by the shared finisher
  * (`Quantiles.fromCounts`) — so a served quantile is BIT-IDENTICAL
  * to the batch operator over the same rows, at any arrival order,
  * batch slicing, or crash/replay history (spec-pinned).
  *
  * Contrast the alternatives: there is no built-in streaming
  * percentile; a `flatMapGroupsWithState` sketch would be
  * approximate or hold the same value→count map as opaque per-key
  * state (invisible to SQL, lost to other readers). Here the state IS
  * a readable table — any consumer (or a rollup tier summing per-day
  * counts into weekly quantiles) reads it with plain SQL.
  *
  * Scale shape: the per-batch aggregation reduces the arriving rows
  * map-side to their distinct (group, value) pairs; the MERGE rewrite
  * cost is bounded by the compacted table's size — the distinct-value
  * universe, thousands of rows for integer metrics regardless of
  * stream volume (continuous metrics pre-quantize, the t32 lever).
  */
object QuantileStreaming {

  /** The per-batch maintenance body: additive counts → `path/table`.
    * Exposed for direct use in multi-sink foreachBatch closures (the
    * Warehouse pattern); idempotent under batch replay via the ledger.
    */
  def mergeBatch(spark: SparkSession, batch: DataFrame, groupCol: String,
                 value: Column, path: String, batchId: Long): Unit =
    Sinks.mergeAgg(spark,
      batch.groupBy(col(groupCol), value.cast(LongType).as("v"))
        .agg(count(lit(1)).as("c")),
      path, keyCols = Seq(groupCol, "v"), sumCols = Seq("c"),
      batchId = batchId)

  /** Start the maintenance query for a streaming DataFrame. */
  def maintain(stream: DataFrame, groupCol: String, value: Column,
               path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch.sparkSession, batch, groupCol, value, path, batchId)
      }
      .start()

  /** Serve current quantiles from the compacted counts table. */
  def serve(spark: SparkSession, path: String, groupCol: String,
            qsPermille: Seq[Int]): DataFrame =
    Quantiles.fromCounts(spark.read.parquet(s"$path/table"),
      groupCol, "v", "c", qsPermille)
}
