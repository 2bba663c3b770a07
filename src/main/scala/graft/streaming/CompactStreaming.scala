package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.Sinks

/** Streaming changelog COMPACTOR — the streaming twin of
  * `CdcRouter.compactChangelog` (r8), on the mergeable-state recipe of
  * [[DriftStreaming]]: the compacted row for a (key, bucket) is
  * `max(struct(order…, op, payload…))`, and MAX is associative,
  * commutative and IDEMPOTENT — so each micro-batch pre-compacts its
  * own rows map-side and MERGEs them into the compacted table behind
  * the batch-id ledger (`Sinks.mergeAgg` maxCols), and the served
  * table is bit-identical to the batch operator over the same feed at
  * any arrival order, batch slicing, or crash/replay history. A late
  * change for an old bucket simply merges into that bucket's row —
  * exactly the semantics a nightly partition rewrite gives a
  * straggler, without re-running the night.
  *
  * Scale shape: per batch, a map-side reduction of arriving changes
  * to one candidate row per (key, bucket) touched; the MERGE rewrite
  * is bounded by the compacted table (keys × buckets). Tombstones are
  * kept (the r8 contract): a key whose bucket-last change is a delete
  * stays visible as a delete row.
  */
object CompactStreaming {

  private def lastStruct(rows: DataFrame, keyCols: Seq[String],
                         orderCols: Seq[String], opCol: String): Column = {
    val payload = rows.columns.toSeq
      .filterNot(keyCols.contains).filterNot(orderCols.contains)
    struct((orderCols ++ (opCol +: payload.filterNot(_ == opCol)))
      .map(col): _*)
  }

  /** Per-batch maintenance body: (key…, bucket, max struct) →
    * `path/table` via the max-merge ledger.
    */
  def mergeBatch(spark: SparkSession, batch: DataFrame,
                 keyCols: Seq[String], orderCols: Seq[String],
                 bucket: Column, bucketName: String, path: String,
                 batchId: Long, opCol: String = "op"): Unit = {
    val state = batch
      .filter(orderCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols.map(col) :+ bucket.as(bucketName) :+
        lastStruct(batch, keyCols, orderCols, opCol).as("_last")): _*)
    Sinks.mergeAgg(spark, state, path, keyCols :+ bucketName,
      sumCols = Nil, minCols = Nil, maxCols = Seq("_last"),
      batchId = batchId)
  }

  /** Start the maintenance query for a streaming change feed. */
  def maintain(stream: DataFrame, keyCols: Seq[String],
               orderCols: Seq[String], bucket: Column, bucketName: String,
               path: String, checkpoint: String,
               opCol: String = "op"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch.sparkSession, batch, keyCols, orderCols, bucket,
          bucketName, path, batchId, opCol)
      }
      .start()

  /** Serve the compacted changelog (flattened back to the batch
    * operator's column layout).
    */
  def serve(spark: SparkSession, path: String, keyCols: Seq[String],
            bucketName: String): DataFrame =
    spark.read.parquet(s"$path/table")
      .select((keyCols.map(col) :+ col(bucketName) :+
        col("_last.*")): _*)
}
