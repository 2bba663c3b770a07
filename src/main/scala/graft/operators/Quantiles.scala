package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact distributed quantiles without sorting rows.
  *
  * The per-group percentile machinery a corpus-QC pipeline needs
  * (length/quality score distributions per source, percentile-gated
  * filtering a la Gopher's per-slice thresholds) — computed EXACTLY
  * and scalably via a value-count reduction:
  *
  *   1. `groupBy(group, value).count()` — the only pass over the raw
  *      rows; map-side partial aggregation collapses each partition to
  *      its distinct (group, value) pairs before the exchange, so the
  *      shuffle carries |distinct values per group| rows, not |rows|.
  *   2. one keyed window over the reduced set: cumulative count
  *      (ordered by value) and group total share a single exchange +
  *      sort on `group`.
  *   3. quantile q = MIN(value | cum >= ceil(q * n)) — the standard
  *      `percentile_disc` convention (smallest value whose CDF
  *      reaches q), selected by a plain conditional aggregate.
  *
  * Contrast the two standard alternatives: Spark's exact `percentile`
  * buffers every value of a group in one aggregation buffer (OOM at
  * 100-TB group sizes); `approx_percentile` is not exact and its
  * per-engine sketch can't be oracle-checked. This shape keeps state
  * bounded by the metric's distinct-value count — for integer metrics
  * (token counts, byte lengths, integer quality scores) that is
  * thousands regardless of row count. For continuous metrics, quantize
  * to a fixed grid first (the documented lever — same plan, bounded
  * error chosen by the grid).
  *
  * Quantile fractions are permille integers and the rank threshold
  * `ceil(q*n)` is derived in pure integer arithmetic (`DIV`), so the
  * selected element is bit-identical cross-engine — no float boundary
  * (0.1*30 = 3.0000000000000004-style) can shift the index.
  *
  * Reference behavior anchor: per-key percentile profiling as in
  * `Skew.keyProfile` (gmall's key-skew pre-flight), generalized to
  * first-class exact quantiles over data columns.
  */
object Quantiles {

  /** Column name for a permille fraction: multiples of 10 render as
    * percent (`p25`, `p50`), others keep the permille suffix (`p995m`
    * = 99.5%).
    */
  private[graft] def qName(permille: Int): String =
    if (permille % 10 == 0) s"p${permille / 10}" else s"p${permille}m"

  /** Exact per-group discrete quantiles of an integral metric.
    *
    * Output: one row per group — `groupCol`, `n` (group row count,
    * BIGINT), and one BIGINT column per requested fraction (see
    * [[qName]]), null for empty groups only (which don't appear).
    *
    * @param value integral metric expression (cast to BIGINT; callers
    *   with continuous metrics pre-quantize — see the class doc)
    * @param qsPermille quantile fractions in permille, each in
    *   [1, 1000]; e.g. Seq(250, 500, 750, 950) = p25/p50/p75/p95
    */
  def groupQuantiles(df: DataFrame, groupCol: String, value: Column,
                     qsPermille: Seq[Int]): DataFrame =
    fromCounts(
      df.groupBy(col(groupCol), value.cast(LongType).as("_v"))
        .agg(count(lit(1)).as("_c")),
      groupCol, "_v", "_c", qsPermille)

  /** Weighted discrete quantiles: quantile q is the smallest value v
    * whose cumulative WEIGHT reaches ceil(q × total-weight) — e.g.
    * "the doc-length median by token mass", where a 10k-token doc
    * counts 10k× a one-token doc (the distribution a token-budget
    * mixing decision actually cares about; row-counted quantiles
    * over-weight short docs). Same value-count reduction shape as
    * [[groupQuantiles]] with `sum(weight)` as the count; output `n`
    * is the group's total weight. Zero-weight rows never shift a
    * selection (they add nothing to any cumulative sum).
    */
  def groupQuantilesWeighted(df: DataFrame, groupCol: String, value: Column,
                             weight: Column,
                             qsPermille: Seq[Int]): DataFrame =
    fromCounts(
      df.groupBy(col(groupCol), value.cast(LongType).as("_v"))
        .agg(sum(weight.cast(LongType)).as("_c")),
      groupCol, "_v", "_c", qsPermille)

  /** The counts→quantiles finisher: discrete quantiles per group from
    * an already-reduced (group, value, count) table. Split out because
    * the value-count state is ADDITIVE — a streaming job maintains it
    * incrementally with the exactly-once additive-MERGE sink and this
    * finisher serves quantiles from the compacted counts
    * ([[graft.streaming.QuantileStreaming]]); rollup tiers (per-day
    * counts → weekly quantiles) sum counts then finish the same way.
    */
  def fromCounts(counts: DataFrame, groupCol: String, valueCol: String,
                 countCol: String, qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty, "need at least one quantile fraction")
    require(qsPermille.forall(q => q >= 1 && q <= 1000),
      s"permille fractions must be in [1, 1000], got $qsPermille")
    require(qsPermille.distinct.size == qsPermille.size,
      s"duplicate fractions in $qsPermille")
    val vc = counts.select(col(groupCol),
      col(valueCol).cast(LongType).as("_v"),
      col(countCol).cast(LongType).as("_c"))
    // both windows partition on the group key: one exchange, and the
    // unordered total rides the ordered window's sort
    val byGroup = Window.partitionBy(groupCol)
    val cum = vc
      .withColumn("_cum", sum(col("_c")).over(byGroup.orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(byGroup))
    // rank threshold ceil(q*n/1000) in integer arithmetic (DIV, not /)
    val aggs = qsPermille.map { q =>
      min(when(col("_cum") >= expr(s"(_n * $q + 999) DIV 1000"), col("_v")))
        .as(qName(q))
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"), aggs: _*)
  }

  /** Percentile-gated filter: keep rows whose metric is at or above
    * their group's q-th discrete percentile — the per-slice adaptive
    * threshold pattern (each source sheds its own worst tail instead
    * of one global cutoff penalizing verbose or terse sources).
    *
    * Adds `thr` (the group's threshold) and `kept` to the input.
    * Thresholds are one row per group, broadcast back onto the fact —
    * the raw rows are never shuffled by the gate itself.
    */
  def percentileGate(df: DataFrame, groupCol: String, value: Column,
                     qPermille: Int): DataFrame = {
    val thr = groupQuantiles(df, groupCol, value, Seq(qPermille))
      .select(col(groupCol), col(qName(qPermille)).as("thr"))
    df.join(broadcast(thr), Seq(groupCol), "left")
      .withColumn("kept", value.cast(LongType) >= col("thr"))
  }
}
