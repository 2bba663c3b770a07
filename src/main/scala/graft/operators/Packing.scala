package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data pipelines: assign every document
  * a contiguous `chunk_id` such that each chunk holds ~`budget` tokens
  * in a global deterministic order — the dataloader sharding step that
  * turns a corpus into fixed-token-budget units while preserving
  * order (curriculum, dedup locality) and reproducibility.
  *
  * chunk_id = exclusive-prefix-sum(weight) DIV budget over rows ordered
  * by `orderCol`. The prefix sum is computed with the classic
  * two-phase distributed scan — never a single-partition window:
  *
  *  1. rows shard deterministically by `orderCol >> b` (arithmetic
  *     shift = floor division by 2^b), with b sized from one min/max
  *     aggregate so ~`shards` buckets cover the observed range — NOT
  *     a sampling range partitioner, whose boundaries change run to
  *     run. The shift is overflow-free over the entire Long range
  *     (a `(id - lo) / width` scheme would overflow ANSI arithmetic
  *     for hash-derived ids spanning more than half the Long range)
  *     and monotonic, so shard order is global order;
  *  2. one small aggregate yields per-shard totals; their running
  *     total (driver-side, O(shards)) is each shard's global offset;
  *  3. each shard computes its local running sum in parallel and adds
  *     its offset — a per-shard window, so the sort is per-shard too.
  *
  * Driver work is O(shards), data work is one narrow shuffle on the
  * shard id — at 100 TB the same three steps hold with more shards.
  * Even-width sharding assumes a roughly uniform `orderCol` (ids from
  * a sequence); a pathologically skewed id space concentrates rows in
  * few shards — still correct, just less parallel.
  *
  * `orderCol` must be unique per row (a doc id) — ties would make the
  * within-shard order, and thus chunk assignment, nondeterministic.
  * Null weights count as 0. Null `orderCol` rows have no place in the
  * global order: they pass through with a null `chunk_id` (poison
  * rows must never abort the job — callers dead-letter them), and
  * they never contribute to any other row's prefix.
  */
object Packing {

  /** @param cacheInput persist the annotated input across this
    *   operator's three actions (bounds agg, shard totals, final
    *   window job) — the [[Frequency]] convention; pass false when the
    *   caller already persists (CorpusPipeline does).
    */
  def packByBudget(docs: DataFrame, orderCol: String,
                   weight: org.apache.spark.sql.Column, budget: Long,
                   shards: Int = 256, cacheInput: Boolean = true): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val base0 = docs.withColumn("_w", coalesce(weight.cast(LongType), lit(0L)))
    val base = if (cacheInput) base0.persist() else base0
    val bounds = base.agg(
      min(col(orderCol).cast(LongType)), max(col(orderCol).cast(LongType)))
      .head()
    if (bounds.isNullAt(0)) return base.drop("_w") // empty / all-null ids
      .withColumn("chunk_id", lit(null).cast(LongType))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // shift width b: 2^b ≈ span/shards, so the observed range maps to
    // [shards, 2·shards) buckets; span via BigInt — hi−lo itself can
    // exceed Long.MaxValue for ids spread across the full Long range
    val span = BigInt(hi) - BigInt(lo) + 1
    val b = math.max(0, (span / shards).bitLength - 1)
    val shardCol = shiftright(col(orderCol).cast(LongType), b)
    val sharded = base.withColumn("_shard", shardCol)
    // per-shard totals -> exclusive global offsets (O(shards) driver);
    // the null shard (null-id rows) stays out of every offset. Shard
    // ids are raw shifted values (possibly negative) — only their
    // ORDER matters for the running total
    val totals = sharded.groupBy(col("_shard")).agg(sum(col("_w")).as("t"))
      .filter(col("_shard").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (s, t)) =>
      (s, acc + t)
    }.tail.zip(totals).map { case ((s, cum), (_, t)) => s -> (cum - t) }.toMap
    val win = Window.partitionBy(col("_shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("_prefix",
        sum(col("_w")).over(win) - col("_w") +
          element_at(typedLit(offsets), col("_shard")))
      .withColumn("chunk_id", expr(s"_prefix DIV $budget"))
      .drop("_w", "_shard", "_prefix")
  }
}
