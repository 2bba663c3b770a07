package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Graft, Tables}
import graft.streaming.StatsJobs

/** Relational / streaming-equivalent operators from SURVEY.md §2,
  * re-expressed as batch DataFrame queries over the harness tables.
  *
  * Numbering follows the operator inventory:
  *  - A1/A3/A4 windowed aggregations → q1, q2, q6, q14
  *  - A2 distinct-count product stats → q15
  *  - A5 keyed dedup (first-per-day)  → q7 (UV), q8 (is_new fix)
  *  - J1/J2 interval joins            → q4 (symmetric), q5 (asymmetric)
  *  - J3/J4 broadcast dim enrichment  → q2, q3
  *  - P2/P3/P5 filters + derivations  → q9, q17, q11 (see RoutingOps)
  *  - F1–F4, F7 scalar functions      → q10, q16, q17
  *
  * Exact-match discipline vs the DuckDB oracle: any sum over a double
  * column goes through DECIMAL(18,2) (associative, order-independent),
  * then back to double — so results are bit-identical at any
  * parallelism. Counts stay BIGINT on both sides.
  *
  * Scale notes: dimension-side joins (nation/region/config) are
  * explicitly `broadcast`; fact-fact joins are equi-joins that
  * shuffle-partition on the join key and benefit from AQE. Nothing here
  * collects to the driver.
  */
object Relational {
  import Graft.{dec2, moneySum}

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** events with ns→µs normalized event-time (see Tables.events). */
  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1: pricing-summary style multi-measure aggregation -------------
    "q1_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // ---- A3 + J4: province-stats style revenue rollup w/ broadcast dims --
    "q2_province_stats" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("order_count"),
          moneySum(col("o_totalprice")).as("order_amount"))
    },

    // ---- J4 + P8: OrderWide-style wide-row dim enrichment ----------------
    "q3_order_wide" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
      val o  = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(
          col("l_orderkey").as("order_id"),
          col("l_partkey").as("sku_id"),
          dec2(col("l_extendedprice")).cast(DoubleType).as("split_total_amount"),
          col("o_orderdate").as("create_time"),
          col("c_name").as("user_name"),
          col("n_name").as("province_name"))
    },

    // ---- J1: interval join (equi + symmetric time range) -----------------
    "q4_interval_join" -> { (s, dir) =>
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 5 DAYS") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 5 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("matched_lines"),
          sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
    },

    // ---- J2: asymmetric interval join (payment-after-order funnel) -------
    "q5_payment_funnel" -> { (s, dir) =>
      val e = ev(s, dir)
      val su = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("s_id"))
      val pu = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      su.join(pu,
          col("user_id") === col("p_uid") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 15 MINUTES"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("pair_ct"),
          min(col("p_ts")).as("first_purchase_ts"))
    },

    // ---- A1: tumbling-window visitor stats -------------------------------
    "q6_visitor_stats" -> { (s, dir) =>
      // explicit null-ts drop, symmetric with the oracle's WHERE —
      // window() happens to exclude null event times, but the contract
      // should not hinge on that implicit behavior
      ev(s, dir).filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("pv_ct"),
          countDistinct(col("user_id")).as("uv_ct"),
          moneySum(col("value")).as("dur_sum"))
        .select(
          col("w.start").as("stt"), col("w.end").as("edt"),
          col("event_type"), col("pv_ct"), col("uv_ct"), col("dur_sum"))
    },

    // ---- A5: UV dedup — first event per user per day ---------------------
    // min(struct(ts, event_id)) instead of a row_number window: structs
    // order lexicographically, so this is the same first-row-per-key
    // but partial-aggregatable (map-side combine, no full sort)
    "q7_unique_visit" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("dt", to_date(col("ts")))
        .groupBy(col("user_id"), col("dt"))
        .agg(min(struct(col("ts"), col("event_id"))).as("first"))
        .select(col("user_id"), col("dt"),
          col("first.event_id").as("first_event_id"),
          col("first.ts").as("first_ts"))
    },

    // ---- A5 variant: is_new correction (first-seen-day flag) -------------
    "q8_is_new_fix" -> { (s, dir) =>
      val days = ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
      days
        .withColumn("first_dt", min(col("dt")).over(Window.partitionBy(col("user_id"))))
        .select(col("user_id"), col("dt"),
          when(col("dt") === col("first_dt"), "1").otherwise("0").as("is_new"))
    },

    // ---- P5: stream splitting (3-way route) ------------------------------
    "q9_split_route" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("sink_table",
          when(col("event_type") === "signup", "dwd_start_log")
            .when(col("event_type").isin("view", "click"), "dwd_page_log")
            .otherwise("dwd_action_log"))
        .groupBy(col("sink_table"))
        .agg(count(lit(1)).as("ct"), countDistinct(col("user_id")).as("uv"))
    },

    // ---- F1: JSON field extraction ---------------------------------------
    "q10_json_extract" -> { (s, dir) =>
      // try_cast (mirrored by TRY_CAST in the oracle): a non-numeric
      // props.k nulls out instead of aborting under ANSI mode
      ev(s, dir)
        .select(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("ct"), sum(col("k")).as("k_sum"))
    },

    // ---- A2: product stats with exact distinct order counts --------------
    "q15_product_stats" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey").as("sku_id"))
        .agg(
          sum(dec2(col("l_quantity"))).cast(DoubleType).as("order_sku_num"),
          moneySum(col("l_extendedprice")).as("order_amount"),
          countDistinct(col("l_orderkey")).as("order_ct"),
          countDistinct(when(col("o_orderstatus") === "F", col("l_orderkey")))
            .as("paid_order_ct"))
    },

    // ---- F7 + P8: null-coalescing merge of two row sources ---------------
    "q16_coalesce_merge" -> { (s, dir) =>
      val liAgg = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(moneySum(col("l_extendedprice")).as("li_amount"),
             count(lit(1)).as("li_ct"))
      t(s, dir, "orders")
        .join(liAgg, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          col("o_orderkey").as("order_id"),
          coalesce(col("li_amount"), lit(0.0)).as("amount"),
          coalesce(col("li_ct"), lit(0L)).as("item_ct"),
          col("o_orderstatus").as("order_status"))
    },

    // ---- P3 + F2/F3: derived date/hour/epoch columns ---------------------
    "q17_derive_date" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        to_date(col("ts")).as("create_date"),
        hour(col("ts")).as("create_hour"),
        graft.core.Graft.floorDivExpr("unix_micros(ts)", 1000L)
          .as("create_ts"))
    },

    // ---- A1 union: VisitorStats fed by a union of derived streams --------
    "q14_union_stats" -> { (s, dir) =>
      val e = ev(s, dir).filter(col("ts").isNotNull)
      val page = e.filter(col("event_type").isin("view", "click"))
        .select(col("ts"), col("user_id"),
          lit(1L).as("pv_ct"), lit(0L).as("sv_ct"), col("value").as("dur"))
      val start = e.filter(col("event_type") === "signup")
        .select(col("ts"), col("user_id"),
          lit(0L).as("pv_ct"), lit(1L).as("sv_ct"), lit(0.0).as("dur"))
      page.unionByName(start)
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(
          sum(col("pv_ct")).as("pv_ct"),
          sum(col("sv_ct")).as("sv_ct"),
          countDistinct(col("user_id")).as("uv_ct"),
          moneySum(col("dur")).as("dur_sum"))
        .select(col("w.start").as("stt"), col("w.end").as("edt"),
          col("pv_ct"), col("sv_ct"), col("uv_ct"), col("dur_sum"))
    },

    // ---- session_window: gap-based sessionization ------------------------
    "q18_sessionize" -> { (s, dir) =>
      StatsJobs.sessionStats(ev(s, dir).filter(col("ts").isNotNull),
        keyCol = "user_id", tsCol = "ts",
        gap = "4 hours",
        extraAggs = Seq(moneySum(col("value")).as("val_sum")))
    },

    // ---- windowed top-N: hot items per window (the classic DWS ads
    // query) — aggregate first, rank the aggregated (small) frame;
    // deterministic tie-break on the key keeps both engines aligned.
    // The 7-day bucket is a SCALAR long through the whole pipeline
    // (epoch-day DIV 7 — identical alignment to window()/time_bucket,
    // 1970-01-01-based): the high-cardinality hash agg and the rank
    // partition key hash two longs instead of a (timestamp, timestamp)
    // struct + long, and the window struct is never materialized per
    // input row; stt converts back to a timestamp only on the final
    // ~1k ranked rows
    "q19_window_topn" -> { (s, dir) =>
      val wk = graft.core.Graft.floorDivExpr(
        "unix_date(CAST(l_shipdate AS DATE))", 7L)
      // repartition on wk ONLY: HashPartitioning(wk) satisfies both the
      // (wk, sku) aggregate's clustering AND the rank window's (wk)
      // distribution, so one exchange of the raw rows serves the whole
      // pipeline — versus groupBy's (wk, sku) exchange followed by a
      // second (wk) exchange for the window
      val agged = t(s, dir, "lineitem")
        .withColumn("wk", wk)
        .repartition(col("wk"))
        .groupBy(col("wk"), col("l_partkey").as("sku_id"))
        .agg(moneySum(col("l_extendedprice")).as("amount"))
      agged
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("wk"))
            .orderBy(col("amount").desc, col("sku_id"))))
        .filter(col("rnk") <= 3)
        .select(
          expr("CAST(timestamp_seconds(wk * 7 * 86400) AS TIMESTAMP_NTZ)")
            .as("stt"),
          col("sku_id"), col("amount"), col("rnk"))
    },

    // ---- key-distribution profile: the pre-shuffle skew pre-flight -------
    // top-5 hottest keys with their share of total rows beside the
    // key-space summary — the numbers that decide salting/partitioning
    // before a 100 TB keyed shuffle (see Skew.saltedJoin's crossover)
    "q33_key_profile" -> { (s, dir) =>
      graft.operators.Skew.keyProfile(ev(s, dir), "user_id", topK = 5)
    },

    // ---- Z-order (Morton) clustering key ---------------------------------
    // the write-side layout lever: interleaved (user, day) bits give
    // BOTH dimensions file-level locality (LayoutSpec measures the
    // pruning win; SCALING.md the narrative). The z-value is pure
    // codegen'd bit arithmetic, hash-checked here bit-for-bit
    "q34_zorder" -> { (s, dir) =>
      val e = ev(s, dir)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"),
          col("user_id").bitwiseAND(lit(65535L)).as("u16"),
          graft.core.Graft.floorDivExpr("unix_micros(ts)", 86400000000L)
            .bitwiseAND(lit(65535L)).as("d16"))
      e.select(col("event_id"), col("u16"), col("d16"),
        graft.operators.Layout.zvalue(16, col("u16"), col("d16")).as("z"))
    },

    // ---- multi-dim enrichment over part/supplier -------------------------
    // nation broadcasts explicitly (25 rows, always); part/supplier get
    // no hint — they scale with the data, so join selection must stay
    // size-based (broadcast at harness SFs, shuffled at 100 TB)
    "q20_brand_supplier" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("p_brand"), col("n_name").as("supp_nation"))
        .agg(moneySum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("line_ct"),
          countDistinct(col("l_suppkey")).as("supp_ct"))
    },

    // ---- as-of (point-in-time) join --------------------------------------
    // for each view, the most recent purchase at-or-before it; right
    // side deduped per (user, ts) so ties have one deterministic winner
    "q22_asof_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy(col("p_uid"), col("p_ts"))
        .orderBy(col("p_id").desc)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      graft.operators.Temporal.asofJoin(views, purchases,
          keyL = "user_id", keyR = "p_uid", leftTs = "ts", rightTs = "p_ts",
          rightCarry = Seq("p_id", "p_ts"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_asof.p_id").as("last_purchase_id"),
          col("_asof.p_ts").as("last_purchase_ts"))
    },

    // ---- range join (no equi key): shipments inside order windows --------
    // point set restricted to max-quantity lines: dates are
    // day-aligned and orders are dense (~60/day), so the UNRESTRICTED
    // containment join is semantically ~240 matches per point — 144M
    // result rows at sf0.1 regardless of join strategy.
    // BOTH sides pre-aggregate before the range join (the decomposition
    // that makes dense many-to-many range joins tractable): the final
    // measures are count/sum over (point, order) matches, which factor
    // into per-ship-day point partials × per-(orderdate, priority)
    // order counts joined on the containment condition. The join then
    // handles ~2.5k × ~12.5k day-level rows emitting ~50k weighted
    // pairs instead of 12k × 150k raw rows emitting ~600k — a 12×
    // output reduction that grows with density. Decimal partials ×
    // long weights keep the global sum bit-exact vs the row-level
    // oracle formulation
    "q23_range_join" -> { (s, dir) =>
      val points = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 50.0)
        .groupBy(col("l_shipdate"))
        .agg(count(lit(1)).as("pt_ct"), sum(dec2(col("l_quantity"))).as("pt_qty"))
      val intervals = t(s, dir, "orders")
        .groupBy(col("o_orderdate"), col("o_orderpriority"))
        .agg(count(lit(1)).as("ord_ct"))
        .select(col("o_orderdate"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("o_end"),
          col("o_orderpriority"), col("ord_ct"))
      graft.operators.Temporal.rangeJoin(points, "l_shipdate",
          intervals, "o_orderdate", "o_end",
          bucketMicros = 3L * 86400 * 1000000)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("pt_ct") * col("ord_ct")).as("ct"),
          sum(col("pt_qty") * col("ord_ct")).cast(DoubleType).as("qty"))
    },

    // ---- ROLLUP: per-dim totals + grand total in one pass ----------------
    // (the DWS reporting shape: status × priority, per-status, overall)
    "q21_rollup" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"),
          moneySum(col("o_totalprice")).as("total"))
    },

    // full cube: all four grouping sets in one Expand-based pass (the
    // rollup's lattice completion); grouping_id disambiguates a
    // genuine NULL key from a subtotal row — same bitmask encoding on
    // both engines
    "q32_cube" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("ct"),
          moneySum(col("l_extendedprice")).as("total"),
          grouping_id().cast(LongType).as("gid"))
    },

    // ---- bounce (user-jump) detection over real events -------------------
    // The events table has no page columns, so the page-view surface is
    // derived: mid = user, page = event_type, and an event ENTERS a
    // session (last_page_id null) when it follows a ≥4h gap — the same
    // session boundary q18 uses. bounceBatch then flags entries whose
    // next event is > 10 min away (or absent). Timestamps stay in µs
    // end to end ((user, µs) is unique, so the lead/lag order is
    // deterministic; bounceBatch's gap parameter is unit-agnostic).
    "q24_bounce" -> { (s, dir) =>
      val sessionGapUs = 4L * 3600 * 1000000 // 4h, q18's session gap
      val bounceGapUs = 600L * 1000000       // 10 min follow-up window
      val w = Window.partitionBy(col("mid")).orderBy(col("ts"))
      val pages = ev(s, dir).filter(col("ts").isNotNull).select(
        col("user_id").cast(StringType).as("mid"),
        unix_micros(col("ts")).as("ts"),
        col("event_type").as("page_id"))
      val entries = pages
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("last_page_id",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") >= sessionGapUs,
            lit(null).cast(StringType))
            .otherwise(lag(col("page_id"), 1).over(w)))
        .drop("prev_ts")
      graft.streaming.StatefulOps.bounceBatch(entries, gapMillis = bounceGapUs)
        .select(col("mid"), col("ts"), col("page_id"))
    },

    // ordered conversion funnel: earliest view → first click after it
    // → first purchase after that, per user (nulls where the user
    // stalls — the product-analytics staple the reference's payment
    // funnel is a 2-stage special case of)
    "q25_funnel" -> { (s, dir) =>
      graft.operators.Funnel.firstReached(ev(s, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
    },

    // session-scoped funnel: conversion must complete WITHIN one 4h
    // session — the product-analytics refinement of q25 (a purchase
    // weeks after the view no longer converts); sid is the 1-based
    // per-user session index, deterministic on both engines
    "q35_session_funnel" -> { (s, dir) =>
      graft.operators.Funnel.sessionFunnel(ev(s, dir), "user_id", "ts",
        "event_id", "event_type", Seq("view", "click", "purchase"))
    },

    // salted fact-dim join: demonstrates the explicit skew primitive
    // (for shuffles AQE can't split — stream-stream, keyed state);
    // results are identical to the plain equi-join, which is exactly
    // what the oracle runs
    "q26_skew_join" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(o, c, "custkey", salt = 8)
        .groupBy(col("c_mktsegment"))
        .agg(Graft.moneySum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("order_ct"))
    },

    // ---- per-group value percentiles — the latency-profile staple.
    // Percentiles interpolate over exact CENTS integers (t6's proven
    // percentile ↔ quantile_cont pairing is on ints), descaled by the
    // identical /100.0 on both engines
    "q31_value_profile" -> { (s, dir) =>
      // finite-guarded: a NaN/Inf row must drop, not abort the ANSI cast
      ev(s, dir).filter(Graft.finite(col("value")).isNotNull)
        .select(col("event_type"),
          (Graft.dec2(col("value")) * 100).cast(LongType).as("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (percentile(col("cents"), lit(0.25)) / 100.0).as("p25"),
          (percentile(col("cents"), lit(0.5)) / 100.0).as("p50"),
          (percentile(col("cents"), lit(0.75)) / 100.0).as("p75"),
          (min(col("cents")) / lit(100.0)).as("vmin"),
          (max(col("cents")) / lit(100.0)).as("vmax"))
    },

    // ---- user-journey path mining — top event-type sequences per
    // 4-hour-gap session (q18's sessionization rule with an explicit
    // event_id tie-break, since sequence ORDER matters here). Gap
    // arithmetic in integer microseconds on both engines; the path
    // string builds from an array_sort'd struct list (order-free
    // collect), and the final top-20 is TakeOrdered, never a global
    // sort of all paths
    "q30_paths" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(w)
      val ns = when(prev.isNull || us - prev >= lit(14400000000L), 1)
        .otherwise(0)
      ev(s, dir).filter(col("ts").isNotNull)
        .withColumn("_ns", ns)
        .withColumn("_sid", sum(col("_ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("_sid"))
        .agg(concat_ws(">", transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("ct"))
        .orderBy(col("ct").desc, col("path"))
        .limit(20)
    },

    // ---- hopping (sliding) windows — the Flink staple the tumbling
    // family (q6/q14) doesn't cover: each event lands in
    // size/slide = 4 windows; Spark's window(size, slide) explodes
    // map-side, so the aggregate shape is identical to tumbling with a
    // 4× row amplification, and no state beyond the aggregation
    "q27_hopping" -> { (s, dir) =>
      ev(s, dir).filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "4 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("pv_ct"),
          countDistinct(col("user_id")).as("uv_ct"),
          moneySum(col("value")).as("val_sum"))
        .select(col("w.start").as("stt"), col("w.end").as("edt"),
          col("pv_ct"), col("uv_ct"), col("val_sum"))
    },

    // ---- per-key z-score outliers — anomaly detection over the event
    // stream. Both moments come from DECIMAL-exact sums (value is
    // 2-decimal; its square is 4-decimal — both exact in decimal), so
    // mean/variance/z reproduce bit-for-bit at any parallelism and the
    // |z| > 1.5 boundary can't flap (uniform values cap |z| at √3, so
    // a 2σ gate would be vacuous on this fixture)
    "q28_zscore" -> { (s, dir) =>
      // finite-guarded like q31, tightened to |v| < 1e12: the s2
      // moment squares the value into DECIMAL(28,4) (24 integer
      // digits), so v² must stay under 1e24 for the cast to be safe on
      // both engines
      val e = ev(s, dir).filter(Graft.finite(col("value")).isNotNull &&
        abs(col("value")) < 1e12)
      val stats = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(Graft.dec2(col("value"))).as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(28, 4))).as("s2"))
        .filter(col("n") > 1)
        .select(col("user_id"), col("n"),
          (col("s1").cast(DoubleType) / col("n")).as("mean"),
          ((col("s2").cast(DoubleType) -
            col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n"))
            / (col("n") - 1)).as("variance"))
      e.join(stats, Seq("user_id"))
        .filter(col("variance") > 0)
        .select(col("user_id"), col("event_id"), col("value"),
          ((col("value") - col("mean")) / sqrt(col("variance"))).as("z"))
        .filter(abs(col("z")) > 1.5)
    },

    // ---- cohort retention — first-event-day cohorts × day offsets,
    // the warehouse release-health staple. Integer-only (date diffs +
    // distinct counts), two partial-aggregatable exchanges: one for
    // the per-user cohort MIN, one for the (cohort, offset) rollup
    "q29_retention" -> { (s, dir) =>
      val days = ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
      val cohort = days.groupBy(col("user_id"))
        .agg(min(col("dt")).as("cohort_dt"))
      days.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_dt"),
          datediff(col("dt"), col("cohort_dt")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    },

    // marketing attribution: per purchase, the FIRST and LAST view
    // touch inside the 1-hour lookback plus the touch count — one
    // user-keyed equi-join (per-user history is bounded, no skew
    // hazard) + one min/max-struct aggregate per purchase; untouched
    // purchases keep a 0-touch row (the left join)
    "q36_attribution" -> { (s, dir) =>
      val e = ev(s, dir)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("v_us"),
          col("event_id").as("v_id"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("p_us"))
      val touches = p.join(v, Seq("user_id"))
        .filter(col("v_us") <= col("p_us") &&
          col("v_us") > col("p_us") - lit(3600000000L))
        .groupBy(col("p_id"))
        .agg(min(struct(col("v_us").as("us"), col("v_id").as("id")))
            .as("ft"),
          max(struct(col("v_us").as("us"), col("v_id").as("id")))
            .as("lt"),
          count(lit(1)).as("n_touches"))
      p.join(touches, Seq("p_id"), "left")
        .select(col("p_id"), col("user_id"),
          coalesce(col("n_touches"), lit(0L)).as("n_touches"),
          col("ft.id").as("first_touch"), col("lt.id").as("last_touch"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_province_stats" ->
      """SELECT r_name, n_name, COUNT(*) AS order_count,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q3_order_wide" ->
      """SELECT l_orderkey AS order_id, l_partkey AS sku_id,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS split_total_amount,
        | o_orderdate AS create_time, c_name AS user_name, n_name AS province_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_linenumber = 1""".stripMargin,

    "q4_interval_join" ->
      """SELECT o_orderpriority, COUNT(*) AS matched_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate - INTERVAL 5 DAY
        | AND l_shipdate <= o_orderdate + INTERVAL 5 DAY
        |GROUP BY o_orderpriority""".stripMargin,

    "q5_payment_funnel" ->
      """SELECT s.user_id, COUNT(*) AS pair_ct, MIN(p.ts) AS first_purchase_ts
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 15 MINUTE
        |GROUP BY s.user_id""".stripMargin,

    "q6_visitor_stats" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS stt,
        | time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE AS edt,
        | event_type,
        | COUNT(*) AS pv_ct,
        | COUNT(DISTINCT user_id) AS uv_ct,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,

    "q7_unique_visit" ->
      """SELECT user_id, CAST(ts AS DATE) AS dt,
        | event_id AS first_event_id, ts AS first_ts
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) = 1""".stripMargin,

    "q8_is_new_fix" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events)
        |SELECT user_id, dt,
        | CASE WHEN dt = MIN(dt) OVER (PARTITION BY user_id) THEN '1' ELSE '0' END AS is_new
        |FROM days""".stripMargin,

    "q9_split_route" ->
      """SELECT CASE WHEN event_type = 'signup' THEN 'dwd_start_log'
        |  WHEN event_type IN ('view','click') THEN 'dwd_page_log'
        |  ELSE 'dwd_action_log' END AS sink_table,
        | COUNT(*) AS ct, COUNT(DISTINCT user_id) AS uv
        |FROM events GROUP BY 1""".stripMargin,

    "q10_json_extract" ->
      """SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | COUNT(*) AS ct,
        | CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1""".stripMargin,

    "q15_product_stats" ->
      """SELECT l_partkey AS sku_id,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS order_sku_num,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
        | COUNT(DISTINCT l_orderkey) AS order_ct,
        | COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN l_orderkey END) AS paid_order_ct
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_partkey""".stripMargin,

    "q16_coalesce_merge" ->
      """SELECT o_orderkey AS order_id,
        | COALESCE(li_amount, 0.0) AS amount,
        | COALESCE(li_ct, 0) AS item_ct,
        | o_orderstatus AS order_status
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS li_amount,
        |   COUNT(*) AS li_ct
        |  FROM lineitem GROUP BY l_orderkey
        |) ON o_orderkey = l_orderkey""".stripMargin,

    "q17_derive_date" ->
      """SELECT event_id, CAST(ts AS DATE) AS create_date,
        | CAST(hour(ts) AS INT) AS create_hour,
        | epoch_us(ts) // 1000 AS create_ts
        |FROM events""".stripMargin,

    "q14_union_stats" ->
      """WITH u AS (
        |  SELECT ts, user_id, 1 AS pv_ct, 0 AS sv_ct, value AS dur
        |  FROM events WHERE event_type IN ('view','click')
        |    AND ts IS NOT NULL
        |  UNION ALL
        |  SELECT ts, user_id, 0 AS pv_ct, 1 AS sv_ct, 0.0 AS dur
        |  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL)
        |SELECT time_bucket(INTERVAL '10 minutes', ts) AS stt,
        | time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE AS edt,
        | CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
        | CAST(SUM(sv_ct) AS BIGINT) AS sv_ct,
        | COUNT(DISTINCT user_id) AS uv_ct,
        | CAST(SUM(CAST(dur AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM u GROUP BY 1, 2""".stripMargin,

    // gaps-and-islands mirror of session_window: a session breaks when
    // the per-user gap reaches the 4h threshold (Spark's session end
    // is exclusive, so an exactly-4h gap starts a new session on both
    // engines); edt = last event + gap, as session_window defines it
    "q18_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, MIN(ts) AS stt, MAX(ts) + INTERVAL 4 HOUR AS edt,
        | COUNT(*) AS ev_ct,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM y GROUP BY user_id, sid""".stripMargin,

    // time_bucket origin pinned to the epoch: DuckDB's default origin
    // for day-scale buckets is 2000-01-03, Spark's window is
    // epoch-aligned
    "q19_window_topn" ->
      """WITH a AS (
        |  SELECT time_bucket(INTERVAL '7 days', l_shipdate, TIMESTAMP '1970-01-01') AS stt,
        |    l_partkey AS sku_id,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT stt, sku_id, amount, rnk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY stt
        |    ORDER BY amount DESC, sku_id) AS rnk FROM a)
        |WHERE rnk <= 3""".stripMargin,

    "q20_brand_supplier" ->
      """SELECT p_brand, n_name AS supp_nation,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS line_ct, COUNT(DISTINCT l_suppkey) AS supp_ct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "q23_range_join" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 50.0) li
        |JOIN orders
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 3 DAY
        |GROUP BY 1""".stripMargin,

    "q22_asof_join" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id AS p_uid, ts AS p_ts, event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT v.event_id, v.user_id, v.ts,
        |  p.p_id AS last_purchase_id, p.p_ts AS last_purchase_ts
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.p_uid AND v.ts >= p.p_ts""".stripMargin,

    "q21_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS ct,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "q32_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS ct,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // exact interpolated percentiles over the |keys|-sized count frame
    // (quantile_cont ≡ Spark percentile, the t6 precedent); top-5
    // tie-break (ct DESC, key) mirrors the TakeOrdered
    "q33_key_profile" ->
      """WITH c AS (
        |  SELECT user_id AS key, COUNT(*) AS ct FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(ct) AS BIGINT) AS total,
        |    quantile_cont(ct, 0.5) AS p50_ct,
        |    quantile_cont(ct, 0.99) AS p99_ct
        |  FROM c),
        |top AS (SELECT key, ct FROM c ORDER BY ct DESC, key LIMIT 5)
        |SELECT key, ct, CAST(ct AS DOUBLE) / total AS share,
        |  n_keys, total, p50_ct, p99_ct
        |FROM top CROSS JOIN t""".stripMargin,

    // the z-value formula is GENERATED from the same term list the
    // Column expression unrolls — the two sides cannot drift
    "q34_zorder" ->
      s"""WITH e AS (
         |  SELECT event_id, (user_id & 65535) AS u16,
         |    ((epoch_us(ts) // 86400000000) & 65535) AS d16
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
         |SELECT event_id, u16, d16,
         |  ${graft.operators.Layout.zvalueSql(16, "u16", "d16")} AS z
         |FROM e""".stripMargin,

    // lag/lead gaps-and-islands mirror of the derived-entry + bounce
    // composition: entry ⇔ prev gap ≥ 4h, bounce ⇔ entry with the next
    // event > 10 min away or absent; all comparisons in integer µs
    "q24_bounce" ->
      """WITH p AS (
        |  SELECT CAST(user_id AS VARCHAR) AS mid, epoch_us(ts) AS ts,
        |    event_type AS page_id,
        |    lag(epoch_us(ts)) OVER w AS prev_ts,
        |    lead(epoch_us(ts)) OVER w AS next_ts
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT mid, ts, page_id FROM p
        |WHERE (prev_ts IS NULL OR ts - prev_ts >= 14400000000)
        |  AND (next_ts IS NULL OR next_ts - ts > 600000000)""".stripMargin,

    // each stage = conditional MIN at-or-after the previous stage;
    // `tus >= NULL` is NULL, so a stalled funnel carries nulls forward
    // on both engines; make_timestamp(µs) mirrors timestamp_micros
    "q25_funnel" ->
      """WITH e AS (
        |  SELECT user_id AS key, epoch_us(ts)::BIGINT AS tus,
        |    event_type AS typ
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s0 AS (
        |  SELECT key, MIN(tus) AS t0 FROM e WHERE typ = 'view'
        |  GROUP BY key),
        |s1 AS (
        |  SELECT s0.key, t0,
        |    MIN(CASE WHEN e.typ = 'click' AND e.tus >= t0 THEN e.tus END) AS t1
        |  FROM s0 LEFT JOIN e ON e.key = s0.key
        |  GROUP BY s0.key, t0),
        |s2 AS (
        |  SELECT s1.key, t0, t1,
        |    MIN(CASE WHEN e.typ = 'purchase' AND e.tus >= t1 THEN e.tus END) AS t2
        |  FROM s1 LEFT JOIN e ON e.key = s1.key
        |  GROUP BY s1.key, t0, t1)
        |SELECT key AS user_id, make_timestamp(t0) AS view_ts,
        |  make_timestamp(t1) AS click_ts, make_timestamp(t2) AS purchase_ts
        |FROM s2""".stripMargin,

    // q25's staged fold scoped to (key, sid); sessionization mirrors
    // q30's lag + running-sum pair
    "q35_session_funnel" ->
      """WITH e AS (
        |  SELECT user_id AS key, epoch_us(ts)::BIGINT AS tus,
        |    event_id AS id, event_type AS typ
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w >= 14400000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY key ORDER BY tus, id)),
        |g AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY key ORDER BY tus, id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s),
        |s0 AS (
        |  SELECT key, sid, MIN(tus) AS t0 FROM g WHERE typ = 'view'
        |  GROUP BY key, sid),
        |s1 AS (
        |  SELECT s0.key, s0.sid, t0,
        |    MIN(CASE WHEN g.typ = 'click' AND g.tus >= t0 THEN g.tus END) AS t1
        |  FROM s0 LEFT JOIN g ON g.key = s0.key AND g.sid = s0.sid
        |  GROUP BY s0.key, s0.sid, t0),
        |s2 AS (
        |  SELECT s1.key, s1.sid, t0, t1,
        |    MIN(CASE WHEN g.typ = 'purchase' AND g.tus >= t1 THEN g.tus END) AS t2
        |  FROM s1 LEFT JOIN g ON g.key = s1.key AND g.sid = s1.sid
        |  GROUP BY s1.key, s1.sid, t0, t1)
        |SELECT key AS user_id, CAST(sid AS BIGINT) AS sid,
        |  make_timestamp(t0) AS view_ts,
        |  make_timestamp(t1) AS click_ts, make_timestamp(t2) AS purchase_ts
        |FROM s2""".stripMargin,

    // the PLAIN join: salting must be invisible in the result set
    "q26_skew_join" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS order_ct
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q31_value_profile" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)
        |    AND abs(value) < 1e16)
        |SELECT event_type, COUNT(*) AS n,
        |  quantile_cont(cents, 0.25) / 100.0 AS p25,
        |  quantile_cont(cents, 0.5) / 100.0 AS p50,
        |  quantile_cont(cents, 0.75) / 100.0 AS p75,
        |  MIN(cents) / 100.0 AS vmin,
        |  MAX(cents) / 100.0 AS vmax
        |FROM b GROUP BY event_type""".stripMargin,

    "q30_paths" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 14400000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |p AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM y GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS ct FROM p
        |GROUP BY path ORDER BY ct DESC, path LIMIT 20""".stripMargin,

    // hopping windows = tumbling per-slide buckets minus o slides,
    // o in [0, size/slide): the same window set Spark's
    // window(size, slide) assigns (starts aligned to the slide)
    "q27_hopping" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts)
        |           - o.o * INTERVAL '1 hour' AS stt,
        |    user_id, value
        |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS o) o
        |  WHERE ts IS NOT NULL)
        |SELECT stt, stt + INTERVAL '4 hours' AS edt,
        |  COUNT(*) AS pv_ct,
        |  COUNT(DISTINCT user_id) AS uv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM w GROUP BY stt""".stripMargin,

    // both moments from DECIMAL-exact sums; every double op below is
    // the identical expression tree as the Spark side, so z and the
    // |z| > 1.5 boundary are bit-reproducible
    "q28_zscore" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)
        |    AND abs(value) < 1e12),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS s1,
        |    SUM(CAST(value * value AS DECIMAL(28,4))) AS s2
        |  FROM e GROUP BY user_id HAVING COUNT(*) > 1),
        |m AS (
        |  SELECT user_id,
        |    CAST(s1 AS DOUBLE) / n AS mean,
        |    (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1) AS variance
        |  FROM st)
        |SELECT e.user_id, e.event_id, e.value,
        |  (e.value - m.mean) / sqrt(m.variance) AS z
        |FROM e JOIN m USING (user_id)
        |WHERE m.variance > 0
        |  AND abs((e.value - m.mean) / sqrt(m.variance)) > 1.5""".stripMargin,

    "q29_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events),
        |c AS (SELECT user_id, MIN(dt) AS cohort_dt FROM days GROUP BY user_id)
        |SELECT c.cohort_dt,
        |  CAST(d.dt - c.cohort_dt AS INT) AS day_offset,
        |  COUNT(DISTINCT d.user_id) AS active_users
        |FROM days d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // attribution replay: same 1h-lookback join; first/last via
    // ROW_NUMBER with (v_us, v_id) tie order = Spark's min/max-struct
    "q36_attribution" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS v_us, event_id AS v_id
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT p.p_id, v.v_us, v.v_id
        |  FROM p JOIN v ON v.user_id = p.user_id
        |    AND v.v_us <= p.p_us AND v.v_us > p.p_us - 3600000000),
        |r AS (
        |  SELECT p_id, v_id,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY v_us ASC, v_id ASC) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY v_us DESC, v_id DESC) AS rl
        |  FROM t),
        |agg AS (
        |  SELECT p_id, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY p_id)
        |SELECT p.p_id, p.user_id,
        |  COALESCE(a.n, 0) AS n_touches,
        |  f.v_id AS first_touch, l.v_id AS last_touch
        |FROM p
        |LEFT JOIN agg a ON a.p_id = p.p_id
        |LEFT JOIN (SELECT p_id, v_id FROM r WHERE rf = 1) f
        |  ON f.p_id = p.p_id
        |LEFT JOIN (SELECT p_id, v_id FROM r WHERE rl = 1) l
        |  ON l.p_id = p.p_id""".stripMargin
  )
}
