package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.Series

/** Time-series similarity over the `events` stream table: per-type
  * 2-hour volume segments → 4-segment PAA windows → grid-bucketed
  * similar-window pairs with exact integer L1 verify.
  */
object SeriesOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_series_similar" -> { (s, dir) =>
      Series.similarWindows(
        Series.volumeSketch(Tables.events(s, dir), keyCol = "event_type",
          tsCol = "ts", valueCol = "value"),
        widthCents = 10000L, maxL1Cents = 10000L)
    },

    // multi-probe variant at width = maxL1, where the adaptive ±1
    // probe set makes recall EXACT — so the oracle is the brute-force
    // all-pairs L1 join with NO grid at all: matching it cross-engine
    // proves the boundary-recall gap (Series.scala scaladoc) is closed
    "s5_series_multiprobe" -> { (s, dir) =>
      Series.similarWindowsMultiprobe(
        Series.volumeSketch(Tables.events(s, dir), keyCol = "event_type",
          tsCol = "ts", valueCol = "value"),
        widthCents = 10000L, maxL1Cents = 10000L, dims = 4)
    },

    // per-user daily grid with forward fill — each user spans ~30 days
    // at sf0.01, so every key exercises multi-point fill
    "s2_resample" -> { (s, dir) =>
      Series.resample(Tables.events(s, dir), keyCol = "user_id",
        tsCol = "ts", valueCol = "value", stepMicros = 86400000000L)
    },

    // per-user CUSUM drift flags; 420.00 value-units of cumulative
    // exceedance sits at the ~95th percentile of this fixture's
    // natural random-walk drift, so both flag branches carry signal
    "s3_cusum" -> { (s, dir) =>
      Series.cusum(Tables.events(s, dir), keyCol = "user_id",
        tsCol = "ts", idCol = "event_id", valueCol = "value",
        driftCents = 42000L)
    },

    // deployment-shape CUSUM: reference level 50.00 (the corpus mean,
    // as history would supply it), drift 600.00 at the ~95th
    // percentile — this is the exact fold CusumStreaming runs
    // incrementally (twin equality spec-pinned)
    "s4_cusum_fixed" -> { (s, dir) =>
      Series.cusumFixedTarget(Tables.events(s, dir), keyCol = "user_id",
        tsCol = "ts", idCol = "event_id", valueCol = "value",
        targetCents = 5000L, driftCents = 60000L)
    },

    // per-user OLS drift rate — integer sufficient statistics, one
    // double expression at the end; complements s3 (detection) with
    // the RATE of the drift
    "s6_trend" -> { (s, dir) =>
      Series.trend(Tables.events(s, dir), keyCol = "user_id",
        tsCol = "ts", valueCol = "value")
    },

    // robust outliers: 3×MAD gate per user — medians exact on both
    // engines, so the flagged set is hash-comparable
    "s7_mad_outliers" -> { (s, dir) =>
      Series.madOutliers(Tables.events(s, dir), keyCol = "user_id",
        idCol = "event_id", tsCol = "ts", valueCol = "value", k = 3.0)
    },

    // α=1/2 EWMA smoothing over a 16-event horizon — power-of-two
    // weights make it a ratio of exact integer sums (see Series.ewma),
    // so the smoothed series hash-matches across engines
    "s8_ewma" -> { (s, dir) =>
      Series.ewma(Tables.events(s, dir), keyCol = "user_id",
        idCol = "event_id", tsCol = "ts", valueCol = "value", horizon = 16)
    },

    // per-user weekday seasonal baseline: integer weekday formula
    // (calendar functions number weekdays differently per engine),
    // exact-decimal sums, one final mean divide
    "s9_weekday_profile" -> { (s, dir) =>
      Series.weekdayProfile(Tables.events(s, dir), keyCol = "user_id",
        tsCol = "ts", valueCol = "value")
    },

    // day-over-day categorical drift: total-variation distance via
    // integer cross-products, one final divide — the ingest health
    // check a continuously-growing corpus runs (Series scaladoc)
    "s10_dist_drift" -> { (s, dir) =>
      Series.distributionDrift(Tables.events(s, dir),
        tsCol = "ts", typeCol = "event_type")
    },

    // nearest-event join (bidirectional as-of): each view matched to
    // the CLOSEST purchase by the same user in either direction, tie
    // to the earlier one — q22's as-of would miss a purchase 1s later
    // in favor of one 10min earlier. Right side pre-deduped per
    // (user, ts) exactly like q22 so the winner is deterministic;
    // integer microsecond gap, so the pick replays bit-exactly
    "s11_nearest_join" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val e = Tables.events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy(col("p_uid"), col("p_ts"))
        .orderBy(col("p_id").desc)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      graft.operators.Temporal.nearestJoin(views, purchases,
          keyL = "user_id", keyR = "p_uid", leftTs = "ts", rightTs = "p_ts",
          rightCarry = Seq("p_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_nearest.p_id").as("np_id"),
          col("_nearest._rts").as("np_ts"),
          abs(unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("_nearest._rts").cast("timestamp"))).as("gap_us"))
    },

    // additive seasonal decomposition of per-type daily volume:
    // ev_ct = trend (7-row centered moving mean) + seasonal (per-
    // weekday mean of detrended) + residual — the series the volume
    // dashboard alarms on; all-integer outputs (floor-means)
    "s12_seasonal" -> { (s, dir) =>
      Series.seasonalDecompose(Tables.events(s, dir),
        typeCol = "event_type", tsCol = "ts", halfWindow = 3)
    },

    // the alarm on the decomposition: days whose residual exceeds
    // 2×MAD of the per-type residuals — trend ramps and weekly spikes
    // are already removed, so the flags are genuine volume anomalies
    // (k=2.0 because the fixture's residuals are well-behaved; 3×MAD
    // flags nothing at sf0.01, a dead gate the oracle can't certify)
    "s13_residual_outliers" -> { (s, dir) =>
      Series.seasonalOutliers(Tables.events(s, dir),
        typeCol = "event_type", tsCol = "ts", halfWindow = 3,
        kPermille = 2000L)
    })

  /** s8's lag-chain SQL, generated for the 16-term horizon: numerator
    * Σ 2^(15-j)·lag_j, denominator Σ 2^(15-j) over present lags.
    */
  private val sqlEwmaTerms: (String, String) = {
    val horizon = 16
    val num = (0 until horizon).map { j =>
      val w = 1L << (horizon - 1 - j)
      s"COALESCE(LAG(cents, $j) OVER w * $w, 0)"
    }.mkString(" + ")
    val den = (0 until horizon).map { j =>
      val w = 1L << (horizon - 1 - j)
      s"CASE WHEN LAG(cents, $j) OVER w IS NOT NULL THEN $w ELSE 0 END"
    }.mkString(" + ")
    (num, den)
  }

  // epoch_us // on non-negative longs ≡ Spark DIV; cents sums are
  // DECIMAL-exact; L1 is integer — bit-identical across engines
  def oracle: Map[String, String] = Map(
    // an INDEPENDENT formulation: two native ASOF joins (backward /
    // forward) + the same integer-gap pick, tie to the earlier side —
    // agreeing with Spark's union + two-running-frames plan proves the
    // nearest semantics, not just the plumbing
    // floor() on a double quotient on BOTH engines (Spark DIV
    // truncates toward zero, DuckDB // floors — detrended sums go
    // negative, so neither integer division is portable)
    "s12_seasonal" ->
      """WITH daily AS (
        |  SELECT event_type AS typ, epoch_ms(ts) // 86400000 AS day,
        |    COUNT(*) AS ev_ct
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT typ, day, ev_ct,
        |    CAST(floor(CAST(SUM(ev_ct) OVER w AS DOUBLE)
        |      / COUNT(*) OVER w) AS BIGINT) AS trend
        |  FROM daily
        |  WINDOW w AS (PARTITION BY typ ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (
        |  SELECT typ, day, ev_ct, trend, ev_ct - trend AS detrended,
        |    (day + 3) % 7 AS wd
        |  FROM tr),
        |se AS (
        |  SELECT typ, day, wd, ev_ct, trend, detrended,
        |    CAST(floor(CAST(SUM(detrended) OVER (PARTITION BY typ, wd)
        |      AS DOUBLE) / COUNT(*) OVER (PARTITION BY typ, wd)) AS BIGINT)
        |      AS seasonal
        |  FROM dt)
        |SELECT typ, day, wd, ev_ct, trend, seasonal,
        |  detrended - seasonal AS residual
        |FROM se""".stripMargin,

    // s12's pipeline + per-type residual median/MAD (quantile_cont ≡
    // Spark's percentile on integer inputs: medians land on x.0/x.5,
    // exact in double) + the integer-permille gate
    "s13_residual_outliers" ->
      """WITH daily AS (
        |  SELECT event_type AS typ, epoch_ms(ts) // 86400000 AS day,
        |    COUNT(*) AS ev_ct
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT typ, day, ev_ct,
        |    CAST(floor(CAST(SUM(ev_ct) OVER w AS DOUBLE)
        |      / COUNT(*) OVER w) AS BIGINT) AS trend
        |  FROM daily
        |  WINDOW w AS (PARTITION BY typ ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (
        |  SELECT typ, day, ev_ct, trend, ev_ct - trend AS detrended,
        |    (day + 3) % 7 AS wd
        |  FROM tr),
        |se AS (
        |  SELECT typ, day, ev_ct, trend, detrended,
        |    CAST(floor(CAST(SUM(detrended) OVER (PARTITION BY typ, wd)
        |      AS DOUBLE) / COUNT(*) OVER (PARTITION BY typ, wd)) AS BIGINT)
        |      AS seasonal
        |  FROM dt),
        |rs AS (
        |  SELECT typ, day, ev_ct, trend, seasonal,
        |    detrended - seasonal AS residual
        |  FROM se),
        |med AS (SELECT typ, quantile_cont(residual, 0.5) AS med
        |        FROM rs GROUP BY typ),
        |dv AS (
        |  SELECT rs.*, med.med, abs(rs.residual - med.med) AS dev
        |  FROM rs JOIN med USING (typ)),
        |md AS (SELECT typ, quantile_cont(dev, 0.5) AS mad
        |       FROM dv GROUP BY typ)
        |SELECT dv.typ, dv.day, dv.ev_ct, dv.trend, dv.seasonal,
        |  dv.residual, dv.med AS resid_median, md.mad AS resid_mad
        |FROM dv JOIN md USING (typ)
        |WHERE dv.dev * 1000 > 2000 * md.mad""".stripMargin,

    "s11_nearest_join" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id AS p_uid, ts AS p_ts, event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1),
        |b AS (
        |  SELECT v.event_id, p.p_id AS b_id, p.p_ts AS b_ts
        |  FROM v ASOF LEFT JOIN p
        |    ON v.user_id = p.p_uid AND v.ts >= p.p_ts),
        |f AS (
        |  SELECT v.event_id, p.p_id AS f_id, p.p_ts AS f_ts
        |  FROM v ASOF LEFT JOIN p
        |    ON v.user_id = p.p_uid AND v.ts <= p.p_ts)
        |SELECT v.event_id, v.user_id, v.ts,
        |  CASE WHEN b_id IS NULL THEN f_id
        |    WHEN f_id IS NULL THEN b_id
        |    WHEN epoch_us(v.ts) - epoch_us(b_ts)
        |      <= epoch_us(f_ts) - epoch_us(v.ts) THEN b_id
        |    ELSE f_id END AS np_id,
        |  CASE WHEN b_id IS NULL THEN f_ts
        |    WHEN f_id IS NULL THEN b_ts
        |    WHEN epoch_us(v.ts) - epoch_us(b_ts)
        |      <= epoch_us(f_ts) - epoch_us(v.ts) THEN b_ts
        |    ELSE f_ts END AS np_ts,
        |  abs(epoch_us(v.ts) - epoch_us(CASE WHEN b_id IS NULL THEN f_ts
        |    WHEN f_id IS NULL THEN b_ts
        |    WHEN epoch_us(v.ts) - epoch_us(b_ts)
        |      <= epoch_us(f_ts) - epoch_us(v.ts) THEN b_ts
        |    ELSE f_ts END)) AS gap_us
        |FROM v JOIN b USING (event_id) JOIN f USING (event_id)""".stripMargin,

    // |n·M − m·N| summed in BIGINT, one double divide at the end —
    // no order-dependent float sum anywhere
    "s10_dist_drift" ->
      """WITH c AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, event_type AS typ,
        |    COUNT(*)::BIGINT AS n
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |t AS (SELECT day, SUM(n)::BIGINT AS nn FROM c GROUP BY 1),
        |p AS (SELECT day + 1 AS day, typ, n AS m FROM c),
        |f AS (
        |  SELECT COALESCE(c.day, p.day) AS day,
        |    COALESCE(c.typ, p.typ) AS typ,
        |    COALESCE(c.n, 0) AS n, COALESCE(p.m, 0) AS m
        |  FROM c FULL OUTER JOIN p ON c.day = p.day AND c.typ = p.typ)
        |SELECT f.day,
        |  CAST(SUM(abs(n * t2.mm - m * t1.nn)) AS DOUBLE)
        |    / (2 * t1.nn * t2.mm) AS tv
        |FROM f
        |JOIN t t1 ON t1.day = f.day
        |JOIN (SELECT day + 1 AS day, nn AS mm FROM t) t2 ON t2.day = f.day
        |GROUP BY f.day, t1.nn, t2.mm""".stripMargin,

    "s9_weekday_profile" ->
      """SELECT user_id,
        |  ((epoch_ms(ts) // 86400000) + 3) % 7 AS wd,
        |  COUNT(*) AS ev_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS val_mean
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16
        |GROUP BY 1, 2""".stripMargin,

    "s1_series_similar" ->
      """WITH seg AS (
        |  SELECT event_type, epoch_us(ts)::BIGINT // 7200000000 AS seg,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16 AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, seg // 4 AS w,
        |    list(cents ORDER BY seg) AS v, count(*) AS n
        |  FROM seg GROUP BY 1, 2),
        |f AS (SELECT * FROM win WHERE n = 4)
        |SELECT a.event_type AS key_a, a.w AS w_a,
        |  b.event_type AS key_b, b.w AS w_b,
        |  abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) AS l1
        |FROM f a JOIN f b
        |  ON a.v[1]//10000 = b.v[1]//10000 AND a.v[2]//10000 = b.v[2]//10000
        | AND a.v[3]//10000 = b.v[3]//10000 AND a.v[4]//10000 = b.v[4]//10000
        | AND (a.event_type < b.event_type
        |      OR (a.event_type = b.event_type AND a.w < b.w))
        |WHERE abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) <= 10000""".stripMargin,

    // deliberately gridless: the mirror is exhaustive all-pairs under
    // the L1 bound, so a hash match certifies the multiprobe's exact-
    // recall claim (width >= maxL1), not just its candidate arithmetic
    "s5_series_multiprobe" ->
      """WITH seg AS (
        |  SELECT event_type, epoch_us(ts)::BIGINT // 7200000000 AS seg,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16 AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, seg // 4 AS w,
        |    list(cents ORDER BY seg) AS v, count(*) AS n
        |  FROM seg GROUP BY 1, 2),
        |f AS (SELECT * FROM win WHERE n = 4)
        |SELECT a.event_type AS key_a, a.w AS w_a,
        |  b.event_type AS key_b, b.w AS w_b,
        |  abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) AS l1
        |FROM f a JOIN f b
        |  ON (a.event_type < b.event_type
        |      OR (a.event_type = b.event_type AND a.w < b.w))
        |WHERE abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) <= 10000""".stripMargin,

    // forward fill = DuckDB's native ASOF JOIN (gus >= tus, same "at
    // or before" semantics as Temporal.asofJoin's union window); all
    // epochs positive so // == DIV; ties at one µs reduce to MAX first
    "s2_resample" ->
      """WITH obs AS (
        |  SELECT user_id AS key, epoch_us(ts)::BIGINT AS tus, MAX(value) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16
        |  GROUP BY 1, 2),
        |rng AS (
        |  SELECT key,
        |    (MIN(tus) + 86399999999) // 86400000000 AS b0,
        |    MAX(tus) // 86400000000 AS b1
        |  FROM obs GROUP BY key),
        |grid AS (
        |  SELECT key, unnest(range(b0, b1 + 1)) * 86400000000 AS gus
        |  FROM rng WHERE b0 <= b1)
        |SELECT g.key AS user_id, make_timestamp(g.gus) AS grid_ts,
        |  o.v AS value, make_timestamp(o.tus) AS obs_ts
        |FROM grid g ASOF JOIN obs o
        |  ON g.key = o.key AND g.gus >= o.tus""".stripMargin,

    // all-integer pipeline (cents, n-scaled deviations, prefix sum −
    // running min); the single double op is the final descale, the
    // identical expression on both engines
    "s3_cusum" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16 AND ts IS NOT NULL),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n, SUM(cents) AS tot
        |  FROM base GROUP BY user_id),
        |x AS (
        |  SELECT b.user_id, b.event_id, b.ts, st.n,
        |    st.n * b.cents - st.tot AS x
        |  FROM base b JOIN st USING (user_id)),
        |y AS (
        |  SELECT *, SUM(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS p
        |  FROM x),
        |z AS (
        |  SELECT *, MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS m
        |  FROM y)
        |SELECT user_id, event_id, ts,
        |  CAST(p - least(m, 0) AS DOUBLE) / (n * 100.0) AS cusum
        |FROM z
        |WHERE p - least(m, 0) > n * 42000""".stripMargin,

    // same rewrite without the n-scaling (no per-key mean to avoid)
    "s4_cusum_fixed" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) - 5000 AS x
        |  FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16 AND ts IS NOT NULL),
        |y AS (
        |  SELECT *, SUM(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS p
        |  FROM base),
        |z AS (
        |  SELECT *, MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS m
        |  FROM y)
        |SELECT user_id, event_id, ts,
        |  CAST(p - least(m, 0) AS DOUBLE) / 100.0 AS cusum
        |FROM z
        |WHERE p - least(m, 0) > 60000""".stripMargin,

    // sums as HUGEINT mirror Spark's DECIMAL(38,0) (both exact
    // integers, both correctly-rounded on the final double cast); x is
    // whole seconds since the key's first observation, so // == DIV
    "s6_trend" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts)::BIGINT AS tus,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16),
        |q AS (
        |  SELECT user_id,
        |    (tus - MIN(tus) OVER (PARTITION BY user_id)) // 1000000 AS x,
        |    cents
        |  FROM p),
        |a AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(cents AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * cents) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM q GROUP BY user_id)
        |SELECT user_id AS key, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) / 100.0 AS slope,
        |  (CAST(sy AS DOUBLE)
        |     - CAST(n * sxy - sx * sy AS DOUBLE)
        |       / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
        |       * CAST(sx AS DOUBLE))
        |    / n / 100.0 AS intercept
        |FROM a""".stripMargin,

    // quantile_cont = Spark's exact percentile (mid-pair average);
    // cents are integers so every median/deviation is an exactly-
    // representable double and the 3×MAD compare has no float edge
    "s7_mad_outliers" ->
      """WITH p AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16),
        |st AS (
        |  SELECT user_id, quantile_cont(cents, 0.5) AS med
        |  FROM p GROUP BY user_id),
        |d AS (
        |  SELECT p.user_id, p.event_id, p.ts, p.cents, st.med,
        |    abs(p.cents - st.med) AS dev
        |  FROM p JOIN st USING (user_id)),
        |md AS (
        |  SELECT user_id, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY user_id)
        |SELECT d.user_id AS key, d.event_id AS id, d.ts,
        |  d.cents / 100.0 AS value, d.med / 100.0 AS median,
        |  md.mad / 100.0 AS mad
        |FROM d JOIN md USING (user_id)
        |WHERE d.dev > 3.0 * md.mad""".stripMargin,

    "s8_ewma" ->
      s"""WITH p AS (
         |  SELECT user_id, event_id, ts,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND value IS NOT NULL AND isfinite(value) AND abs(value) < 1e16)
         |SELECT user_id AS key, event_id AS id, ts,
         |  cents / 100.0 AS value,
         |  CAST(${sqlEwmaTerms._1} AS DOUBLE) /
         |    CAST((${sqlEwmaTerms._2}) * 100 AS DOUBLE) AS ewma
         |FROM p
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)
}
