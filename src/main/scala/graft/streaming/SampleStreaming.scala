package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.DoubleType

import graft.operators.Mixing

/** Streaming k-per-stratum weighted sampling — the unbounded-stream
  * twin of `Mixing.prioritySample` (sequential-Poisson / priority
  * sampling, Ohlsson 1998): maintain, per stratum, the k rows with the
  * SMALLEST priority u(id)/weight seen so far. Because the priority is
  * a pure deterministic function of (id, weight) — the salted-md5
  * uniform of [[Mixing.priorityOf]] — the top-k relation is an
  * ASSOCIATIVE, COMMUTATIVE, IDEMPOTENT merge: union any two partial
  * top-k sets, keep the k smallest, and the result is the top-k of the
  * union. Hence the spec-pinned contract: after ANY batch slicing and
  * ANY arrival order, the held sample is bit-equal to
  * `Mixing.prioritySample` run over everything seen (a true uniform
  * weighted sample without replacement of the whole history —
  * reservoir sampling without the mutable reservoir).
  *
  * State and exactly-once: the state is ≤ k rows × strata — bounded
  * regardless of stream length — written as a FULL top-k snapshot
  * under `batch_id=N` (dynamic partition overwrite), so a replayed
  * batch rewrites its own snapshot instead of double-merging, and each
  * batch merges the batch's candidates with the latest STRICTLY-PRIOR
  * snapshot (the `DupSpans.streamingExactSubstrings` index recipe;
  * idempotence also holds algebraically — the merge is idempotent —
  * the partition discipline just keeps the directory replay-clean).
  * Old snapshots are tiny (strata × k rows each) and prunable with the
  * same `Compaction` pattern as every other batch-id-partitioned
  * state table in this package.
  *
  * Per batch the work is: score the batch map-side, one per-stratum
  * rank window over (batch candidates ∪ k·strata prior rows) — the
  * window input is batch-bounded, never history-bounded.
  */
object SampleStreaming {

  /** Start building the sampler. `onBatch` receives the post-merge
    * top-k snapshot (strataCol, idCol, weight, _pr) after each batch —
    * "the sample so far". `weightCol` must be a concrete column (the
    * snapshot has to round-trip through parquet).
    */
  def prioritySampleStream(stream: DataFrame, stateDir: String,
      onBatch: (Long, DataFrame) => Unit,
      strataCol: String, idCol: String, weightCol: String,
      k: Int): DataStreamWriter[Row] = {
    require(k >= 1, s"k must be >= 1, got $k")
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val w = col(weightCol).cast(DoubleType)
      val cand = batch
        .filter(col(idCol).isNotNull && w.isNotNull && w > 0)
        .select(col(strataCol), col(idCol), w.as(weightCol),
          Mixing.priorityOf(col(idCol), w).as("_pr"))
      val statePath = new org.apache.hadoop.fs.Path(stateDir)
      val fs = statePath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val merged0 =
        if (!fs.exists(statePath)) cand
        else {
          val st = spark.read.option("basePath", stateDir).parquet(stateDir)
          // strictly-prior snapshot only: a replayed batch must not
          // merge with its own half-written rows
          // partition-directory inference types batch_id as INT for
          // small values — normalize to long before comparing
          val prior = st.withColumn("batch_id",
              col("batch_id").cast("long"))
            .filter(col("batch_id") < batchId)
          val latest = prior.agg(max(col("batch_id"))).head()
          if (latest.isNullAt(0)) cand
          else cand.unionByName(
            prior.filter(col("batch_id") === latest.getLong(0))
              .select(col(strataCol), col(idCol), col(weightCol),
                col("_pr")))
        }
      // the same (priority, id) order as Mixing.prioritySample; the
      // distinct guards a doc arriving twice (its priority is
      // identical both times — the merge is idempotent)
      val win = Window.partitionBy(col(strataCol))
        .orderBy(col("_pr").asc, col(idCol))
      val topk = merged0.distinct()
        .withColumn("_rk", row_number().over(win))
        .filter(col("_rk") <= k)
        .drop("_rk")
        .persist()
      topk.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(stateDir)
      onBatch(batchId, topk)
      topk.unpersist()
      ()
    }
  }
}
