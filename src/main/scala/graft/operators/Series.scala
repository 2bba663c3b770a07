package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.Graft.{cents, dec2, finite}

/** Time-series similarity search over event streams, PAA-style
  * (piecewise aggregate approximation): each series collapses to
  * per-segment volume sums, fixed-length windows of segments become
  * small exact vectors, and similar windows are found by a GRID
  * bucket equi-join + exact L1 verify — the time-series analogue of
  * the LSH/IVF pattern the dedup and vector families use (candidate
  * generation by equality key, never all-pairs).
  *
  * All arithmetic is exact: segment sums go through DECIMAL(18,2) and
  * surface as integer cents, quantization is integer division, and L1
  * distance is an integer sum — results are bit-identical across
  * engines and partitionings (no float means/σ/sqrt as in z-normalized
  * schemes, which are not portably exact).
  *
  * Recall contract (same family as v4's LSH): only windows agreeing in
  * EVERY quantized dimension become candidates, so near pairs straddling
  * a grid boundary are missed — production multi-probes ±1 cells per
  * dimension, exactly like v4's band multi-probe. Width tunes the
  * recall/cost trade: coarser grid → more candidates → closer to
  * all-pairs; a degenerate cell (constant series) is capped the same
  * way Dedup.candidatePairs caps degenerate buckets.
  *
  * Segment sums assume non-negative values (integer DIV truncation ==
  * floor only for non-negatives; both engines agree there).
  */
object Series {

  /** Per (series key, window) volume vector: `segsPerWindow` integer
    * cents sums of `valueCol` over `segMicros`-long segments. Windows
    * missing a segment (no events) are dropped — a fixed-length
    * vector is what makes the downstream grid join an equi-join.
    */
  def volumeSketch(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, segMicros: Long = 7200000000L,
                   segsPerWindow: Int = 4): DataFrame = {
    require(segMicros > 0 && segsPerWindow > 0)
    val seg = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) DIV $segMicros")
    events
      // row-level castability filter (not inside the sum): an
      // all-non-finite segment must VANISH — a null cents entry would
      // still count toward the fixed-length window and poison the
      // integer-vector contract downstream (null L1, aliased cell ids)
      .filter(col(tsCol).isNotNull && finite(col(valueCol)).isNotNull)
      .groupBy(col(keyCol).as("series_key"), seg.as("seg"))
      .agg((sum(dec2(col(valueCol))) * 100).cast(LongType).as("cents"))
      .groupBy(col("series_key"),
        expr(s"seg DIV $segsPerWindow").as("w"))
      .agg(sort_array(collect_list(struct(col("seg"), col("cents"))))
        .as("sv"))
      .filter(size(col("sv")) === segsPerWindow)
      .select(col("series_key"), col("w"),
        expr("transform(sv, s -> s.cents)").as("v"))
  }

  /** Fixed-step grid resample with forward fill: for each series key,
    * one row per `stepMicros`-aligned grid instant inside the key's
    * observed time range, carrying the most recent observation at or
    * before that instant (its value and its timestamp, so staleness is
    * queryable). The standard gap-fill / downsample primitive for
    * feature pipelines over irregular event streams.
    *
    * Deterministic: observations are first reduced to one row per
    * (key, µs) — ties at the same microsecond resolve to MAX(value) —
    * and the fill is [[Temporal.asofJoin]]'s union + running-last
    * window: one shuffle on key, one ordered pass, O(n log n), no
    * per-grid-point range scan. Grid size is bounded by each key's own
    * span ÷ step, so a short-lived key never inflates the output;
    * `stepMicros` is the caller's density knob.
    *
    * By construction the first grid instant is ≥ the key's first
    * observation, so `value`/`obs_ts` are never null.
    */
  def resample(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive, got $stepMicros")
    val obs = events
      // finite() here too, although no decimal cast follows: max() over
      // a NaN orders differently per engine (Spark: NaN greatest;
      // DuckDB: its own rule), so non-finite junk must drop for the
      // oracle contract like every other value ingester
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        finite(col(valueCol)).isNotNull)
      .groupBy(col(keyCol).as("key"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tus"))
      .agg(max(col(valueCol)).as("v"))
    // ceil-align the first grid instant, floor-align the last; all
    // epochs are post-1970 so truncating DIV == floor on both engines
    val grid = obs.groupBy(col("key"))
      .agg(min(col("tus")).as("mn"), max(col("tus")).as("mx"))
      .select(col("key"),
        expr(s"(mn + ${stepMicros - 1}) DIV $stepMicros").as("b0"),
        expr(s"mx DIV $stepMicros").as("b1"))
      // a key whose whole span sits inside one step straddling no
      // boundary has no grid instants (Spark's sequence(a,b) would
      // count DOWN for a > b rather than yield empty)
      .filter(col("b0") <= col("b1"))
      .select(col("key"),
        explode(sequence(col("b0"), col("b1"))).as("b"))
      .select(col("key"), (col("b") * stepMicros).as("gus"))
    Temporal.asofJoin(grid, obs, "key", "key", "gus", "tus",
        rightCarry = Seq("tus", "v"))
      .select(col("key").as(keyCol),
        timestamp_micros(col("gus")).as("grid_ts"),
        col("_asof.v").as("value"),
        timestamp_micros(col("_asof.tus")).as("obs_ts"))
  }

  /** CUSUM drift detection per key (Page 1954): flag the points where
    * the cumulative deviation from the key's own mean exceeds a
    * threshold — the sequential changepoint test that catches slow
    * drifts a per-point z-score gate (q28) never sees.
    *
    * The textbook recurrence S_i = max(0, S_{i-1} + x_i) is a fold,
    * not a window sum — but it equals P_i − min(0, min_{j≤i} P_j)
    * with P the plain prefix sum of x, so two window functions over
    * one (key)-partitioned sort compute it exactly.
    *
    * Exactness: everything is INTEGER. Values go to cents via
    * DECIMAL(18,2); the per-key mean is avoided by scaling through n
    * (x_i·n = n·cents_i − total_cents), and the flag compare
    * (S' > driftCents·n) has no float boundary at any parallelism.
    * The scaled deviations and their prefix sums run as DECIMAL(38,0),
    * not BIGINT: the per-point term n·cents is long-safe, but the
    * window's PREFIX SUM accumulates up to ~n²·maxCents, which clears
    * 2⁶³ for large hot keys — a silent wrap in non-ANSI Spark while
    * the oracle's HUGEINT stays exact. Decimal sums keep both engines
    * exact to 10³⁸.
    *
    * Scale shape: the per-key (n, total) aggregate joins back on the
    * SAME key partitioning the windows sort on — the join is
    * deliberately NOT broadcast (the stats frame has one row per key
    * and grows with key count; forcing it through the driver is the
    * q28 shape misapplied — q28 broadcasts because its event side has
    * no downstream key exchange to ride). Total cost: one exchange +
    * sort per key for the join and both windows together — the same
    * class as any per-key sessionization.
    *
    * @return flagged rows only: (key, id, ts, cusum) with `cusum` the
    *         running exceedance in value units (S_i, descaled).
    */
  def cusum(events: DataFrame, keyCol: String, tsCol: String,
            idCol: String, valueCol: String,
            driftCents: Long): DataFrame = {
    require(driftCents >= 0, s"driftCents must be >= 0, got $driftCents")
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(idCol), col(tsCol),
        cents(col(valueCol)).as("_cents"))
      .filter(col("_cents").isNotNull) // non-finite dropped (ANSI-safe)
    // per-key totals as WHOLE-PARTITION window aggregates, not a
    // separate groupBy + join-back: every window shares the (key)
    // partitioning, so the whole operator is ONE exchange + sort over
    // one scan — the agg+join form costs a second scan, a second
    // shuffle, and a join. The totals deliberately use the SAME
    // (ts, id) ordering with an unbounded-following frame: an
    // unordered partition window would plan its own Sort(key) beside
    // the running windows' Sort(key, ts, id); sharing the ordering
    // keeps the plan at exactly one Sort (pinned).
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val whole = ordered.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("_n", count(lit(1)).over(whole))
      .withColumn("_tot",
        sum(col("_cents").cast(DecimalType(38, 0))).over(whole))
      .withColumn("_x",
        (col("_cents").cast(DecimalType(38, 0)) * col("_n") - col("_tot"))
          .cast(DecimalType(38, 0)))
      .withColumn("_p", sum(col("_x")).over(w))
      .withColumn("_m", min(col("_p")).over(w))
      .withColumn("_s", col("_p") - least(col("_m"), lit(0L)))
      .filter(col("_s") > col("_n") * driftCents)
      .select(col(keyCol), col(idCol), col(tsCol),
        (col("_s").cast(DoubleType) / (col("_n") * lit(100.0))).as("cusum"))
  }

  /** Fixed-target CUSUM: [[cusum]] against a KNOWN reference level
    * (cents) instead of the key's own mean — the deployment shape,
    * where the target comes from history and monitoring runs forward.
    * No n-scaling needed (no mean to avoid): x = cents − target, S
    * via the same prefix-sum − running-min rewrite, flag S > drift.
    * This is the exact fold [[graft.streaming.CusumStreaming]] runs
    * incrementally; twin equality is spec-pinned.
    */
  /** [[graft.core.Graft.cents]] with a magnitude bound: null-equivalent
    * junk drops (stays null, callers filter), a finite value whose
    * cents exceed `bound` RAISES with a diagnosable message — the
    * downstream integer folds would silently wrap on it, and the
    * streaming twins' Cents.halfUp raises on the identical input.
    */
  private def boundedCents(c: Column, bound: Long, msg: String): Column = {
    val raw = cents(c)
    when(raw.isNull, lit(null).cast(LongType))
      .when(abs(raw) <= bound, raw)
      .otherwise(raise_error(concat(lit(s"$msg "), lit(bound.toString)))
        .cast(LongType))
  }

  /** |cents| bound shared with the streaming twin: headroom of 2²⁰
    * max-magnitude events before the stream's running Long could wrap.
    * BOTH sides raise on a value beyond it — the twin contract is
    * divergence nowhere or an error on both sides, never results on
    * one and a crash on the other.
    */
  val CusumCentsBound: Long = Long.MaxValue >> 20

  def cusumFixedTarget(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valueCol: String,
                       targetCents: Long, driftCents: Long): DataFrame = {
    require(driftCents >= 0, s"driftCents must be >= 0, got $driftCents")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(idCol), col(tsCol),
        // decimal for the same prefix-sum-overflow reason as [[cusum]]
        // (here the bound is ~n·maxCents — smaller, but the wrap mode
        // would be the same silent one); non-finite values drop like
        // every cents ingester (and like the streaming twin), instead
        // of aborting under ANSI or ghosting through the prefix sum
        (boundedCents(col(valueCol), CusumCentsBound,
          s"cusumFixedTarget input exceeds |cents| bound") - targetCents)
          .cast(DecimalType(38, 0)).as("_x"))
      .filter(col("_x").isNotNull)
      .withColumn("_p", sum(col("_x")).over(w))
      .withColumn("_m", min(col("_p")).over(w))
      .withColumn("_s", col("_p") - least(col("_m"), lit(0L)))
      .filter(col("_s") > driftCents)
      .select(col(keyCol), col(idCol), col(tsCol),
        (col("_s").cast(DoubleType) / 100.0).as("cusum"))
  }

  /** Similar-window pairs: grid-cell equi-join on the per-dimension
    * quantized vector (`widthCents` per cell), then exact integer L1
    * ≤ `maxL1Cents`. Each unordered pair surfaces once via the
    * (key, window) tie-break.
    */
  def similarWindows(sketch: DataFrame, widthCents: Long,
                     maxL1Cents: Long): DataFrame = {
    require(widthCents > 0 && maxL1Cents >= 0)
    // string cell id: portable join key (array equality as a join key
    // is legal but a delimited string hashes everywhere)
    val cell = expr(
      s"concat_ws(',', transform(v, c -> CAST(c DIV $widthCents AS STRING)))")
    // persist: a self-join otherwise recomputes the whole two-level
    // sketch aggregation per side (AQE's broadcast path bypasses
    // ReusedExchange — same seam as Dedup.candidatePairs)
    val withCell = sketch.withColumn("_cell", cell).persist()
    val a = withCell.select(col("series_key").as("key_a"),
      col("w").as("w_a"), col("v").as("v_a"), col("_cell"))
    val b = withCell.select(col("series_key").as("key_b"),
      col("w").as("w_b"), col("v").as("v_b"), col("_cell").as("_cell_b"))
    a.join(b, col("_cell") === col("_cell_b") &&
        (col("key_a") < col("key_b") ||
          (col("key_a") === col("key_b") && col("w_a") < col("w_b"))))
      .withColumn("l1", expr(
        "aggregate(zip_with(v_a, v_b, (x, y) -> abs(x - y)), 0L, (a, d) -> a + d)"))
      .filter(col("l1") <= maxL1Cents)
      .select(col("key_a"), col("w_a"), col("key_b"), col("w_b"), col("l1"))
  }

  /** Multi-probe [[similarWindows]]: closes the documented grid-boundary
    * recall gap the same way v15's multiprobe closes IVF's — one side
    * of the self-join additionally probes neighboring grid cells, the
    * other side keeps its single home cell, and candidate generation
    * stays an equi-join on the cell id.
    *
    * The probe set is ADAPTIVE, not a blind ±1 box: dimension i probes
    * offset −1 only when `v_i mod width < maxL1` (a partner within the
    * L1 budget could sit below the cell floor) and +1 only when
    * `v_i mod width + maxL1 ≥ width` (one could sit at or above the
    * ceiling). A window centered in its cells probes nothing extra, so
    * with the usual tuning `maxL1 ≪ width` the expansion is ~1×, not
    * 3^dims — the blind box is the worst case, reached only when
    * `maxL1 = width`.
    *
    * Recall contract: EXACT (every pair with L1 ≤ `maxL1Cents`
    * surfaces) whenever `widthCents ≥ maxL1Cents`, because then no
    * qualifying pair can differ by more than one cell in any dimension
    * and the offset conditions characterize one-cell reachability
    * precisely. Below that, recall still strictly dominates
    * single-probe but >1-cell straddles are missed.
    *
    * Each unordered pair surfaces at most once: probe offset vectors
    * are distinct, so distinct probe cells; the partner holds exactly
    * one home cell; the (key, window) tie-break kills the mirrored
    * orientation.
    */
  /** Per-key linear trend: exact-sum OLS slope/intercept of value vs
    * time — the "is this metric drifting and how fast" fit behind
    * monitoring dashboards and feature drift reports, complementing
    * [[cusum]] (which detects a drift) with its RATE.
    *
    * Exactness: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * are INTEGER sums — x in whole seconds since the key's own first
    * observation (the shift keeps magnitudes small and the fit
    * origin-invariant), y in cents via DECIMAL(18,2) — accumulated as
    * DECIMAL(38,0) (HUGEINT in the oracle), so they are bit-identical
    * at any parallelism; slope/intercept are then single double
    * expressions over those exact integers, deterministic cross-engine.
    *
    * Scale shape: one unordered per-key window (min, no sort) + one
    * partial-aggregatable groupBy on the same key — no joins, no
    * driver state. Degenerate keys (one point, or all points in the
    * same second) get null slope/intercept via the nullif'd
    * denominator, never a divide error.
    */
  /** Per-key weekday seasonal profile — the baseline a monitoring
    * stack subtracts before calling something drift (a Friday spike
    * that happens every Friday is seasonality, not anomaly): per
    * (key, weekday) event counts, exact-decimal value sums, and the
    * mean. The weekday is the INTEGER formula
    * `(epoch_day + 3) % 7` (0 = Monday; 1970-01-01 was a Thursday) —
    * calendar functions disagree across engines on numbering, the
    * arithmetic doesn't. One partial-aggregatable groupBy; the only
    * float op is the final mean divide of an exact DECIMAL sum.
    */
  def weekdayProfile(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String): DataFrame = {
    val e = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
      graft.core.Graft.finite(col(valueCol)).isNotNull)
    e.groupBy(col(keyCol),
        ((graft.core.Graft.floorDivExpr(s"unix_millis($tsCol)", 86400000L)
          + 3) % 7).as("wd"))
      .agg(count(lit(1)).as("ev_ct"),
        graft.core.Graft.moneySum(col(valueCol)).as("val_sum"))
      .withColumn("val_mean", col("val_sum") / col("ev_ct"))
  }

  /** Day-over-day categorical distribution drift — the pipeline
    * health check a continuously-ingesting corpus runs so a schema
    * break or upstream mix shift is caught as data (not as a model
    * regression weeks later): per day, the total-variation distance
    * between that day's category distribution and the previous
    * day's, TV = ½ · Σ_t |p_t − q_t|. Days without a previous day
    * are absent; categories missing on one side count as 0.
    *
    * EXACT cross-engine arithmetic (the s-family discipline): the
    * natural Σ|n/N − m/M| is an order-dependent float sum, so the
    * sum runs over the integer cross-products |n·M − m·N| instead
    * (exact BIGINT), and TV = that one integer over 2·N·M in a
    * single final divide — both operands below 2^53, so the divide
    * is one correctly-rounded op and bit-equal on any engine at any
    * parallelism. BIGINT cross-products hold to ~3e9 events/day;
    * beyond that (a 100 TB firehose) swap the products to
    * DECIMAL(38,0) — same plan, wider lanes.
    *
    * Scale shape: two partial-aggregatable groupBys (days × types,
    * then days) and a self-join on (day, type) shifted by one day —
    * all result sets are days-sized, never event-sized.
    */
  def distributionDrift(events: DataFrame, tsCol: String,
                        typeCol: String): DataFrame =
    driftFromCounts(events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(
        graft.core.Graft.floorDivExpr(s"unix_millis($tsCol)", 86400000L)
          .as("day"),
        col(typeCol).as("typ"))
      .agg(count(lit(1)).as("n")))

  /** The counts→drift finisher: day-over-day TV distance from an
    * already-reduced (day, typ, n) table. Split out because the
    * count state is ADDITIVE — a streaming job maintains it
    * incrementally through the exactly-once additive-MERGE sink and
    * this finisher serves drift bit-identical to the batch twin
    * ([[graft.streaming.DriftStreaming]]) — the same build/serve
    * split as `Quantiles.fromCounts`.
    */
  def driftFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("day")).agg(sum(col("n")).as("nn"))
    val prev = counts.select((col("day") + 1).as("day"), col("typ"),
      col("n").as("m"))
    // full outer on (day, typ): a category present on only one side
    // still contributes its whole mass to the distance
    val paired = counts.join(prev, Seq("day", "typ"), "full_outer")
      .select(col("day"), col("typ"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("m"), lit(0L)).as("m"))
    paired
      .join(totals, Seq("day")) // keeps only days that exist...
      .join(totals.select((col("day") + 1).as("day"),
        col("nn").as("mm")), Seq("day")) // ...and have a previous day
      .groupBy(col("day"), col("nn"), col("mm"))
      .agg(sum(abs(col("n") * col("mm") - col("m") * col("nn"))).as("num"))
      .select(col("day"),
        (col("num").cast(DoubleType) /
          (lit(2L) * col("nn") * col("mm")).cast(DoubleType)).as("tv"))
  }

  def trend(events: DataFrame, keyCol: String, tsCol: String,
            valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val pts = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tus"),
        cents(col(valueCol)).as("cents"))
      .filter(col("cents").isNotNull) // non-finite values null the cast
    val x = expr("(tus - min(tus) OVER (PARTITION BY key)) DIV 1000000")
    val agg = pts
      .select(col("key"), x.as("x"), col("cents"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("cents").cast(d38)).as("sy"),
        sum((col("x") * col("cents")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast(DoubleType)
    val den = nullif((col("n") * col("sxx") - col("sx") * col("sx"))
      .cast(DoubleType), lit(0.0))
    agg.select(col("key"), col("n"),
      (num / den / 100.0).as("slope"),
      ((col("sy").cast(DoubleType) - num / den * col("sx").cast(DoubleType))
        / col("n") / 100.0).as("intercept"))
  }

  /** Robust per-key outliers by median absolute deviation: flag points
    * whose |value − median| exceeds `k` × MAD — the outlier gate that,
    * unlike q28's z-score, a few extreme points cannot drag (median
    * and MAD have a 50% breakdown point; mean/σ have 0%).
    *
    * Exactness: values are integer cents, medians are exact
    * (`percentile` / `quantile_cont` — the mid-pair average, a
    * .5-grained value exactly representable in double), deviations are
    * |int − .5-grain| and the MAD is again an exact mid-pair average —
    * every compare is over exactly-representable doubles, so the
    * flagged set is bit-identical cross-engine. A zero MAD (≥ half the
    * key's points AT the median) flags every off-median point, the
    * standard degenerate-MAD behavior.
    *
    * Scale shape: two per-key aggregations and two equi-joins, all
    * riding one key partitioning — the [[cusum]] stats-join rule: the
    * per-key frames grow with key count, so neither is broadcast.
    * Exact `percentile` buffers one key's values per group; keys are
    * assumed executor-sized (the same contract as any per-key sort —
    * for multi-TB single keys you'd swap in approx_percentile and
    * lose the oracle).
    */
  def madOutliers(events: DataFrame, keyCol: String, idCol: String,
                  tsCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pts = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        col(tsCol).as("ts"),
        cents(col(valueCol)).as("cents"))
      .filter(col("cents").isNotNull)
    // both exact medians as WHOLE-PARTITION window aggregates: the two
    // percentile windows share the (key) partitioning, so the operator
    // is one exchange over one scan — the groupBy+join form scans the
    // input three times and shuffles it three times. Each percentile
    // evaluates once per partition frame, not per row. At 100× scale
    // the documented lever stands: swap `percentile` for
    // `approx_percentile` (same shape, sketch-sized state).
    val part = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    pts
      .withColumn("med", expr("percentile(cents, 0.5)").over(part))
      .withColumn("dev", abs(col("cents") - col("med")))
      .withColumn("mad", expr("percentile(dev, 0.5)").over(part))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col("key"), col("id"), col("ts"),
        (col("cents") / 100.0).as("value"),
        (col("med") / 100.0).as("median"),
        (col("mad") / 100.0).as("mad"))
  }

  /** Exponentially-weighted moving average over a finite `horizon` of
    * events per key, α = 1/2 — EXACT-decimal, unlike the textbook
    * recursive form: the recursion `e_i = αx_i + (1-α)e_{i-1}` folds
    * floats in data order, which no two engines (or partitionings of a
    * retry) reproduce bit-for-bit. With α = 1/2 the weights are powers
    * of two, so the truncated-horizon EWMA is a ratio of two INTEGER
    * sums: Σ 2^(H-1-j)·cents_{i-j} / (100·Σ 2^(H-1-j)), both exact in
    * long, followed by one correctly-rounded IEEE divide — hash-equal
    * everywhere. Truncating at H=16 discards < 2⁻¹⁶ of the mass.
    *
    * Shape: `horizon` lag() terms over ONE per-key window sort (a
    * single exchange + sort, all map-side after); ramp-up rows (< H
    * priors) renormalize over the weights actually present.
    */
  def ewma(events: DataFrame, keyCol: String, idCol: String,
           tsCol: String, valueCol: String, horizon: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1, 32], got $horizon")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
    // overflow guard: Σ_j cents·2^(H-1-j) < |cents|·2^H must fit a
    // long, so |cents| is bounded at Long.MaxValue >> horizon
    // (≈ 1.4e15 dollars at H=16 — unreachable for real money, but a
    // corrupt row must fail fast, not wrap: the DuckDB mirror raises
    // on the same multiplication and the twin contract is divergence
    // nowhere or an error on both sides)
    val maxAbs = Long.MaxValue >> horizon
    val pts = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        col(tsCol).as("ts"),
        boundedCents(col(valueCol), maxAbs,
          s"ewma(horizon=$horizon) input exceeds |cents| bound")
          .as("cents"))
      .filter(col("cents").isNotNull)
    val terms = (0 until horizon).map { j =>
      val weight = 1L << (horizon - 1 - j)
      val lagged = lag(col("cents"), j).over(w)
      (coalesce(lagged * weight, lit(0L)),
        when(lagged.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    pts
      .withColumn("_num", terms.map(_._1).reduce(_ + _))
      .withColumn("_den", terms.map(_._2).reduce(_ + _))
      .select(col("key"), col("id"), col("ts"),
        (col("cents") / 100.0).as("value"),
        (col("_num").cast(DoubleType) /
          (col("_den") * 100L).cast(DoubleType)).as("ewma"))
  }

  def similarWindowsMultiprobe(sketch: DataFrame, widthCents: Long,
                               maxL1Cents: Long,
                               dims: Int = 4): DataFrame = {
    require(widthCents > 0 && maxL1Cents >= 0)
    require(dims >= 1 && dims <= 8,
      s"dims must be in [1, 8] (probe box is 3^dims), got $dims")
    // all 3^dims offset vectors, enumerated driver-side as literals;
    // the per-row filter below prunes to the reachable ones
    val combos: Seq[Seq[Int]] = Seq.fill(dims)(Seq(-1, 0, 1))
      .foldLeft(Seq(Seq.empty[Int]))((acc, o) =>
        acc.flatMap(c => o.map(c :+ _)))
    val withCell = sketch.filter(size(col("v")) === dims).persist()
    val probed = withCell
      .withColumn("_combo", explode(typedLit(combos)))
      // values are non-negative (volumeSketch contract) so % == mod
      .filter(expr(
        s"""forall(zip_with(v, _combo, (x, o) -> CASE
           |  WHEN o = 0 THEN true
           |  WHEN o = -1 THEN x % $widthCents < ${maxL1Cents}L
           |    AND x DIV $widthCents > 0
           |  ELSE x % $widthCents + ${maxL1Cents}L >= $widthCents
           |END), p -> p)""".stripMargin))
      .select(col("series_key").as("key_a"), col("w").as("w_a"),
        col("v").as("v_a"),
        expr(s"""concat_ws(',', zip_with(v, _combo,
                |(x, o) -> CAST(x DIV $widthCents + o AS STRING)))"""
          .stripMargin).as("_probe"))
    val home = withCell.select(col("series_key").as("key_b"),
      col("w").as("w_b"), col("v").as("v_b"),
      expr(s"concat_ws(',', transform(v, c -> " +
        s"CAST(c DIV $widthCents AS STRING)))").as("_cell_b"))
    probed.join(home, col("_probe") === col("_cell_b") &&
        (col("key_a") < col("key_b") ||
          (col("key_a") === col("key_b") && col("w_a") < col("w_b"))))
      .withColumn("l1", expr(
        "aggregate(zip_with(v_a, v_b, (x, y) -> abs(x - y)), 0L, (a, d) -> a + d)"))
      .filter(col("l1") <= maxL1Cents)
      .select(col("key_a"), col("w_a"), col("key_b"), col("w_b"), col("l1"))
  }

  /** Classic additive seasonal decomposition of the per-type daily
    * volume series: `ev_ct = trend + seasonal + residual`, where trend
    * is the centered (2·halfWindow+1)-row moving mean, seasonal is the
    * per-(type, weekday) mean of the detrended series, and residual is
    * what monitoring actually alarms on — s6 (drift rate), s9 (weekday
    * baseline), and s7 (outlier gate) fused into the one decomposition
    * a volume-health dashboard plots. Weekday is the integer formula
    * `(epoch_day + 3) % 7` (s9's discipline — calendar functions
    * disagree across engines, arithmetic doesn't).
    *
    * EXACT cross-engine arithmetic: both means are floor(Σ/n) with the
    * divide in double (operands day-count-sized, far under 2^53, so
    * the quotient is one correctly-rounded op) — floor, not integer
    * DIV, because detrended sums go negative and Spark's DIV truncates
    * toward zero while DuckDB's `//` floors.
    *
    * Scale shape: one partial-aggregatable groupBy reduces the event
    * stream to (types × days) rows; the trend window and the seasonal
    * whole-partition window both run on that tiny frame in ONE
    * pipeline (no join — see [[seasonalFromCounts]]). At 100 TB the
    * only full-data pass is the first count.
    */
  def seasonalDecompose(events: DataFrame, typeCol: String, tsCol: String,
                        halfWindow: Int = 3): DataFrame =
    seasonalFromCounts(events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      // FLOOR day bucket, same hazard as the means below: Spark DIV
      // truncates toward zero, DuckDB `//` floors — a pre-1970
      // timestamp would land on different days (all-integer floor
      // division via Graft.floorDivExpr, total over the long range).
      .groupBy(col(typeCol).as("typ"),
        graft.core.Graft.floorDivExpr(s"unix_millis($tsCol)", 86400000L)
          .as("day"))
      .agg(count(lit(1)).as("ev_ct")), halfWindow)

  /** The counts→decomposition finisher: [[seasonalDecompose]] from an
    * already-reduced (typ, day, ev_ct) table. Split out because the
    * count state is ADDITIVE — the SAME compacted (day, typ, n) table
    * the streaming drift monitor maintains ([[driftFromCounts]] /
    * `graft.streaming.DriftStreaming`) serves this decomposition
    * bit-identical to the batch twin; one ledger, two monitoring
    * surfaces.
    */
  def seasonalFromCounts(daily: DataFrame, halfWindow: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val w = Window.partitionBy(col("typ")).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    // the seasonal mean is a whole-partition WINDOW over (typ, wd),
    // not a re-aggregation joined back: a groupBy+join formulation
    // duplicates the entire daily lineage (Spark cannot reuse a
    // self-joined subplan) and scans the event table TWICE — the
    // window form is one scan, one pipeline
    val ws = Window.partitionBy(col("typ"), col("wd"))
    daily
      .withColumn("trend", floor(sum(col("ev_ct")).over(w)
        .cast(DoubleType) / count(lit(1)).over(w)).cast(LongType))
      .withColumn("detrended", col("ev_ct") - col("trend"))
      .withColumn("wd", (col("day") + 3) % 7)
      .withColumn("seasonal", floor(sum(col("detrended")).over(ws)
        .cast(DoubleType) / count(lit(1)).over(ws)).cast(LongType))
      .select(col("typ"), col("day"), col("wd"), col("ev_ct"), col("trend"),
        col("seasonal"),
        (col("detrended") - col("seasonal")).as("residual"))
  }

  /** The alarm on top of [[seasonalDecompose]]: days whose residual —
    * the volume left after trend AND weekly seasonality are removed —
    * sits more than k×MAD from the per-type residual median. This is
    * what closes the monitoring loop: a Friday spike every Friday is
    * seasonal (s9's lesson), a ramp is trend, and what survives both
    * is the thing worth paging on; s7's raw-value MAD gate would page
    * on all three. Exact medians over the days-sized decomposition
    * frame (whole-partition windows riding the decomposition's own
    * typ partitioning — no extra exchange), integer k as a permille
    * so the gate replays engine-exact.
    */
  def seasonalOutliers(events: DataFrame, typeCol: String, tsCol: String,
                       halfWindow: Int = 3,
                       kPermille: Long = 3000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kPermille > 0, s"kPermille must be positive, got $kPermille")
    val part = Window.partitionBy(col("typ"))
    seasonalDecompose(events, typeCol, tsCol, halfWindow)
      .withColumn("med", expr("percentile(residual, 0.5)").over(part))
      .withColumn("dev", abs(col("residual") - col("med")))
      .withColumn("mad", expr("percentile(dev, 0.5)").over(part))
      // integer-permille gate: dev and mad are exact (medians of
      // integers are x.0 or x.5 — exact in double), so the comparison
      // replays bit-for-bit
      .filter(col("dev") * 1000 > lit(kPermille) * col("mad"))
      .select(col("typ"), col("day"), col("ev_ct"), col("trend"),
        col("seasonal"), col("residual"), col("med").as("resid_median"),
        col("mad").as("resid_mad"))
  }
}
