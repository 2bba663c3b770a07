package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming windowed top-N — the incremental twin of the q19 batch
  * shape (per tumbling window, rank keys by a summed measure, keep the
  * top N). The reference's DWS layer serves exactly this ("top skus
  * per window") from its ClickHouse tables.
  *
  * Composition, not custom state: the per-(window, key) sums are a
  * NATIVE windowed aggregation (partial-aggregated map-side, exact
  * integer cents, one shuffle — the identical plan shape the batch
  * q19 runs), and the rank stage exploits an append-mode invariant:
  * when the watermark crosses a window's end, ALL of that window's
  * finalized groups evict in the SAME micro-batch. So `foreachBatch`
  * sees every closed window complete, and a per-batch rank over the
  * batch's own rows is the window's exact global top-N — no keyed
  * rank state, no second stateful operator, nothing to restore beyond
  * the aggregation state Spark already checkpoints.
  *
  * Scale: state is one integer sum per (open window × live key) —
  * the catalog-bounded cardinality the DWS layer assumes; the rank
  * runs over one batch's sealed rows (windows × keys that just
  * closed), not the stream.
  *
  * Determinism: integer-cents sums are order-free; rank ties break by
  * ascending key, mirroring the batch twin. Emitted rows are
  * (window start, key, summed cents, rank), rank ≤ n.
  */
object TopNStreaming {

  /** @param measures streaming frame carrying `keyCol`, an integer
    *   measure `centsCol`, and a watermarked `tsCol` (the caller
    *   attaches the watermark — the standard prelude)
    * @param onRanked  (batchId, ranked rows) per micro-batch; rows:
    *   (stt timestamp, keyCol, amount_cents, rnk)
    */
  def windowedTopN(measures: DataFrame, width: String, n: Int,
                   keyCol: String, centsCol: String, tsCol: String)
                  (onRanked: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    require(n >= 1, s"n must be >= 1, got $n")
    measures
      .groupBy(window(col(tsCol), width).as("w"), col(keyCol))
      .agg(sum(col(centsCol)).as("amount_cents"))
      .select(col("w.start").as("stt"), col(keyCol), col("amount_cents"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onRanked(id, batch
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("stt"))
              .orderBy(col("amount_cents").desc, col(keyCol))))
          .filter(col("rnk") <= n))
        ()
      }
  }

  /** The batch twin of the rank stage, for equality pinning: identical
    * rank over a batch frame of (stt, key, amount_cents).
    */
  def rankBatch(agged: DataFrame, n: Int, keyCol: String): DataFrame =
    agged.withColumn("rnk", row_number().over(
        Window.partitionBy(col("stt"))
          .orderBy(col("amount_cents").desc, col(keyCol))))
      .filter(col("rnk") <= n)
}
