package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.hashBucket

/** Domain mixing to token budgets: from each domain (source, corpus
  * slice, language…), keep a deterministic pseudo-random subset of
  * documents whose token counts fill that domain's budget — the "mix
  * 30 B tokens of web + 5 B of code" step that turns curated corpora
  * into a training mixture. Selection priority is a salted md5 of the
  * doc id, so the chosen subset is a pure function of (id, domain
  * budgets): stable across runs, engines, and partitioning, and
  * statistically independent of [[graft.functions.TextFunctions.stableSplit]]'s
  * unsalted hash (different salt).
  *
  * A document is kept iff the tokens of strictly-higher-priority docs
  * in its domain (`tok_prefix`) haven't already filled the budget —
  * i.e. budgets overshoot by at most one document, never undershoot.
  *
  * The per-domain running sum is the two-phase distributed scan of
  * [[Packing]], generalized to keyed prefix sums: a naive
  * `Window.partitionBy(domain)` puts each domain's ENTIRE corpus slice
  * in one task — with tens of domains over 100 TB that's a handful of
  * multi-TB stragglers. Instead the 16-bit priority hash is cut into
  * `buckets` ordered ranges, so:
  *
  *  1. one small aggregate computes per-(domain, bucket) token totals
  *     (domains × buckets rows — model-sized, collected);
  *  2. the driver turns them into exclusive per-bucket offsets within
  *     each domain (priority order = bucket order, since the bucket is
  *     the hash's high bits);
  *  3. each (domain, bucket) computes its local window sum in
  *     parallel and adds its offset — per-domain parallelism × buckets.
  *
  * Rows with a null id have no priority and are never kept (poison
  * rows pass through with kept=false, they don't abort the job).
  */
object Mixing {

  /** Sequential Poisson (priority) sampling: exactly `k` rows per
    * stratum, with inclusion probability ∝ `weight` (Ohlsson 1998;
    * Duffield et al., "Priority Sampling", 2007) — the
    * "sample 1M docs, longer/higher-quality docs proportionally more
    * often" step of corpus curation, where [[mixByTokenBudget]] fills
    * budgets and [[graft.functions.TextFunctions.stratifiedKeep]]
    * applies flat rates. Priority = u / w with u a salted-md5 48-bit
    * uniform: a pure function of (id, weight), so the chosen sample is
    * stable across runs, engines, and partitioning; the k smallest
    * priorities per stratum win (ties broken by id).
    *
    * Scale shape: one exchange on the stratum key; the per-stratum
    * top-k runs through the rank window with WindowGroupLimit pruning
    * (each task keeps k rows before the final sort), so no stratum's
    * full slice is ever sorted. Rows with null/≤0 weight or null id
    * can't be sampled and are excluded.
    */
  /** The sequential-Poisson priority: salted-md5 48-bit uniform (a
    * pure function of the id — exact in BIGINT and DOUBLE on every
    * engine) over the weight. Exposed so streaming twins rank with
    * the IDENTICAL key and their samples stay bit-equal to the batch
    * operators'.
    */
  def priorityOf(id: Column, weight: Column): Column = {
    val u = conv(substring(md5(concat(lit("p:"),
      id.cast(StringType))), 1, 12), 16, 10).cast(LongType)
    u.cast(DoubleType) / weight.cast(DoubleType)
  }

  def prioritySample(docs: DataFrame, strataCol: String, idCol: String,
                     weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = weight.cast(DoubleType)
    val pr = priorityOf(col(idCol), weight)
    val win = Window.partitionBy(col(strataCol))
      .orderBy(col("_pr").asc, col(idCol))
    docs
      .filter(col(idCol).isNotNull && w.isNotNull && w > 0)
      .withColumn("_pr", pr)
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") <= k)
      .drop("_pr", "_rk")
  }

  /** Two-pass [[prioritySample]]: identical output, but the rank
    * window only ever sorts ~k survivors per stratum instead of the
    * stratum's whole slice — the 100 TB shape, where a stratum can be
    * multi-TB and even WindowGroupLimit's per-task top-k still sorts
    * every task's full input locally.
    *
    *  1. One exact aggregate counts rows per (stratum, ⌊log2 pr⌋)
    *     priority octave — strata × ~2100 possible octaves, in practice
    *     a few dozen per stratum: model-sized, collected (the
    *     [[mixByTokenBudget]] phase-1 pattern, NOT an approx-percentile
    *     sketch, so the retention guarantee is unconditional).
    *  2. The driver scans each stratum's octaves in ascending order and
    *     cuts at the first prefix holding ≥ k rows; the cutoff is that
    *     octave's UPPER edge, so at least min(k, n) rows survive —
    *     never an undershoot, and the overshoot is bounded by the
    *     cutoff octave's own population (≈k again when priorities
    *     spread across octaves, since octave counts grow geometrically
    *     for anything uniform-ish; degenerate only if one octave holds
    *     the whole stratum).
    *  3. Survivors flow through the exact [[prioritySample]] rank
    *     window — same ordering, same ties, bit-identical output
    *     (spec-pinned in MixingSpec).
    */
  def prioritySampleThresholded(docs: DataFrame, strataCol: String,
                                idCol: String, weight: Column,
                                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = weight.cast(DoubleType)
    val base = docs
      .filter(col(idCol).isNotNull && w.isNotNull && w > 0)
      .withColumn("_pr", priorityOf(col(idCol), weight))
      // string stratum key for the broadcast cutoff map; null strata
      // group under the same sentinel the map uses (the
      // mixByTokenBudget convention)
      .withColumn("_st", coalesce(col(strataCol).cast(StringType), lit("")))
      // clamp before log2: pr = 0 (md5 prefix 0x000000000000) and
      // double overflow to +inf both land in finite edge octaves
      .withColumn("_oct", floor(log2(greatest(least(col("_pr"),
        lit(1e300)), lit(1e-300)))).cast(IntegerType))
    val counts = base.groupBy(col("_st"), col("_oct"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    if (counts.isEmpty) return base.drop("_pr", "_st", "_oct")
    // driver scan: per stratum, the first ascending-octave prefix with
    // >= k rows; cutoff = 2^(oct+1), the octave's exclusive upper edge
    val cutoffs: Map[String, Double] = counts.groupBy(_._1).map {
      case (st, rows) =>
        val sorted = rows.sortBy(_._2)
        val cum = sorted.map(_._3).scanLeft(0L)(_ + _).tail
        val idx = cum.indexWhere(_ >= k)
        val cut =
          if (idx < 0) Double.PositiveInfinity // n < k: keep the lot
          // the top clamp octave (floor(log2 1e300) = 996) also holds
          // rows clamped DOWN from above its true edge — only +inf is
          // a safe upper bound there
          else if (sorted(idx)._2 >= 996) Double.PositiveInfinity
          else math.pow(2.0, sorted(idx)._2 + 1.0)
        st -> cut
    }
    val win = Window.partitionBy(col("_st"))
      .orderBy(col("_pr").asc, col(idCol))
    val cut = element_at(typedLit(cutoffs), col("_st"))
    base
      // an infinite cutoff means "keep the whole stratum" (underfull,
      // or the clamp-edge octave): it must admit pr = +Inf (subnormal
      // weight) and pr = NaN (NaN weight passes w > 0 under Spark's
      // NaN-is-largest ordering) — `Inf < Inf` and `NaN < Inf` are
      // both false, so a bare < filter would drop rows the exact
      // one-pass sampler keeps, breaking the pinned equivalence
      .filter(col("_pr") < cut || cut === Double.PositiveInfinity)
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") <= k)
      .drop("_pr", "_st", "_oct", "_rk")
  }

  /** Temperature-flattened mixture resampling at α = 0.5 — the
    * multinomial-smoothing step a multilingual / multi-source
    * training mix runs so head domains stop drowning the tail
    * (the mBERT/XLM exponent-smoothing recipe): each domain's share
    * of the token `budget` is ∝ √(its token mass), i.e. sampling
    * weights n_d^α with α = 1/2, renormalized. Per-domain keep rates
    * come out in permyriad and each doc keeps deterministically via
    * the salted-hash predicate (the t9 discipline — stable across
    * runs, engines, and repartitioning).
    *
    * EXACT cross-engine arithmetic: per-domain masses are integer
    * sums; √ is `floor(IEEE sqrt)` (exact below ~4.5e15 — audited);
    * shares and rates are two integer floor-divisions evaluated in
    * BigInt on the driver (domains are bounded — the
    * [[mixByTokenBudget]] phase-1 collect rationale), mirrored by
    * HUGEINT division in the oracle. No FP sum anywhere, so the
    * result is bit-stable at any parallelism.
    *
    * Scale shape: one partial-aggregated groupBy for the masses
    * (domains-sized result), a literal when-chain rate lookup
    * (no join), and a codegen'd hash predicate per row — the corpus
    * is scanned twice, shuffled never (beyond the domains-sized agg).
    *
    * Output: input rows + `n_tokens` (the weight read), `rate_pmyr`,
    * `kept`.
    */
  def temperatureMix(docs: DataFrame, domainCol: String, idCol: String,
                     weight: Column, budget: Long,
                     salt: String = "tm:"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = docs
      .withColumn("_dom", coalesce(col(domainCol).cast(StringType), lit("")))
      .withColumn("n_tokens", coalesce(weight.cast(LongType), lit(0L)))
    val masses = base.groupBy(col("_dom"))
      .agg(sum(col("n_tokens")).as("_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_d = floor(sqrt(n_d)): IEEE sqrt is correctly rounded, and
    // below n ≈ 4.5e15 the rounding can never cross an integer
    // boundary, so floor is exact and engine-agnostic
    val roots = masses.view.mapValues(n =>
      if (n <= 0L) 0L else math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val totalRoot = roots.values.map(BigInt(_)).sum
    val rates: Map[String, Long] = masses.map { case (d, n) =>
      val share =
        if (totalRoot == 0) BigInt(0)
        else BigInt(budget) * roots(d) / totalRoot // floor: positive ints
      val r = if (n <= 0L) BigInt(0) else BigInt(10000) * share / n
      d -> r.min(10000).toLong
    }
    val rateCol = rates.foldLeft(lit(0L): Column) {
      case (acc, (d, r)) => when(col("_dom") === d, lit(r)).otherwise(acc)
    }
    base
      .withColumn("rate_pmyr", rateCol)
      // long arithmetic: 65535 × 10000 and 10000 × 65536 both ≪ 2^63
      .withColumn("kept",
        hashBucket(col(idCol), salt).cast(LongType) * 10000L <
          col("rate_pmyr") * 65536L)
      .drop("_dom")
  }

  def mixByTokenBudget(docs: DataFrame, domainCol: String, idCol: String,
                       weight: Column, budgets: Map[String, Long],
                       defaultBudget: Long, buckets: Int = 16): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    require(buckets > 0 && 65536 % buckets == 0,
      s"buckets must divide 65536, got $buckets")
    val width = 65536 / buckets
    val base = docs
      .withColumn("_w", coalesce(weight.cast(LongType), lit(0L)))
      .withColumn("_pr", hashBucket(col(idCol), salt = "m:"))
      .withColumn("_b", (col("_pr") / width).cast(IntegerType))
      .withColumn("_dom", coalesce(col(domainCol).cast(StringType), lit("")))

    // phase 1: per-(domain, bucket) totals — domains × buckets rows
    val totals = base.filter(col("_b").isNotNull)
      .groupBy(col("_dom"), col("_b")).agg(sum(col("_w")).as("t"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))

    // phase 2 (driver, O(domains × buckets)): exclusive offsets in
    // bucket order within each domain
    val offsets: Map[String, Long] = totals.groupBy(_._1._1).flatMap {
      case (dom, rows) =>
        val sorted = rows.sortBy(_._1._2)
        sorted.map(_._1).zip(
          sorted.map(_._2).scanLeft(0L)(_ + _).init)
          .map { case ((d, b), off) => s"$d:$b" -> off }
    }

    // budget lookup on _dom, NOT the raw column: null domains fold
    // into the "" group for the prefix-sum stream, so their budget
    // must come from the same key — comparing the raw (null) column
    // would hand the shared stream defaultBudget for the null rows and
    // budgets("") for the rest, undershooting both guarantees
    val budgetFor = budgets.foldLeft(lit(defaultBudget): Column) {
      case (acc, (d, b)) => when(col("_dom") === d, lit(b)).otherwise(acc)
    }

    if (offsets.isEmpty) // empty input (or all-null ids)
      return base.drop("_w", "_pr", "_b", "_dom")
        .withColumn("tok_prefix", lit(null).cast(LongType))
        .withColumn("kept", lit(false))

    // phase 3: local window per (domain, bucket) + broadcast offset
    val win = Window.partitionBy(col("_dom"), col("_b"))
      .orderBy(col("_pr"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("tok_prefix",
        when(col("_b").isNotNull,
          sum(col("_w")).over(win) - col("_w") +
            element_at(typedLit(offsets), concat_ws(":", col("_dom"), col("_b")))))
      .withColumn("kept", coalesce(col("tok_prefix") < budgetFor, lit(false)))
      .drop("_w", "_pr", "_b", "_dom")
  }
}
