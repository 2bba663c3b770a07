package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net for the SCALING.md / PLANS.md claims: the
  * properties that make these queries scale must stay visible in the
  * physical plan — losing a pushdown, a broadcast, or a group-limit is
  * a performance regression even when results stay correct.
  */
class PlanRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)

  test("q2 dim enrichment broadcasts all dims and pushes scan filters") {
    val p = plan("q2_province_stats")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("PushedFilters: [IsNotNull"))
  }

  test("q1 aggregation reads only the needed columns (pruned scan)") {
    val p = plan("q1_agg")
    // 5 of lineitem's 11 columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string,l_linestatus:string>"))
  }

  test("q19: one exchange serves both the aggregate and the rank") {
    val p = plan("q19_window_topn")
    // rank-limit pruning before the full window sort
    assert(p.contains("WindowGroupLimit"))
    // HashPartitioning(wk) satisfies the (wk, sku) agg clustering AND
    // the window's (wk) distribution — a second exchange reappearing
    // means that co-planning was lost
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("v23 mmr: the greedy chain is pinned per step") {
    val p = plan("v23_mmr_diverse")
    // step i references step i−1 TWICE (anti-join + max-sim join): an
    // unpinned chain re-evaluates earlier steps 2^(k−step) times and
    // hands Catalyst a plan that doubles per step (the r16 v23 creep).
    // Each step localCheckpoints, so the final frame must read the
    // LAST pinned step — a truncated ExistingRDD scan, not a k-deep
    // join tree re-deriving the selection
    assert(p.contains("Scan ExistingRDD"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("no query plans a cartesian product of two large sides") {
    // v1 brute-force kNN is the one intentional cross join — its query
    // side is broadcast, so it must plan as a broadcast NL join, never
    // a CartesianProduct exchange
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), name)
    }
  }

  test("kmv sketch plans as a partial+final aggregate (map-side combined)") {
    val p = plan("d5_kmv_distinct")
    // the custom Aggregator must partial-aggregate before the exchange
    // — that is the whole point of the bounded buffer
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"))
    // mode and function coupled: a bare "Partial" elsewhere in the
    // plan must not mask the KMV aggregate losing its map-side partial
    assert("(?i)partial_kmvagg".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("interval joins stay equi-joins with the range as a post-filter") {
    val p = plan("q4_interval_join")
    assert(p.contains("l_orderkey") && !p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t8 heavy hitters: map-side MG partials + broadcast verify join") {
    val p = plan("t8_heavy_hitters")
    // the Misra–Gries Aggregator must combine BEFORE the exchange (its
    // bounded buffer is the whole scale argument), and the ≤ k
    // candidates must reach the exact pass as a broadcast, never a
    // shuffled join of the token stream
    assert("(?i)partial_misragries".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q23 aggregates both sides below the bucket range join") {
    val p = plan("q23_range_join")
    // day-level partial+final aggs on points AND intervals feed the
    // join (≥ 6 HashAggregates incl. the final rollup) — losing one
    // side's pre-aggregation re-inflates join output ~12×
    assert("HashAggregate".r.findAllIn(p).size >= 6, p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    // the quantity filter must reach the parquet scan
    assert(p.contains("GreaterThanOrEqual(l_quantity,50.0)"))
  }

  test("d7 probes history with broadcasts — history is never shuffled") {
    val p = plan("d7_incremental_dedup")
    // fresh keys broadcast into the semi-probe, seen set broadcast
    // into the anti — two broadcast joins, no exchange of history
    assert("BroadcastHashJoin LeftSemi".r.findAllIn(p).size +
      "BroadcastHashJoin LeftAnti".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("s1 series similarity joins on the grid cell, never all-pairs") {
    val p = plan("s1_series_similar")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t9 sampling is one codegen'd filter on a two-column scan") {
    val p = plan("t9_stratified_sample")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"))
    assert(!p.contains("Exchange")) // pure map-side predicate: no shuffle
  }

  test("t12 repetition report is a pure map: no shuffle, pruned scan") {
    val p = plan("t12_repetition")
    assert(!p.contains("Exchange"), p.take(1500))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("t13 decontamination broadcasts the benchmark gram set") {
    val p = plan("t13_decontam")
    // corpus grams must probe a broadcast build side, never co-shuffle
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // final per-doc count partial-aggregates before its exchange
    assert("(?i)HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("t14 redaction is map-only with no UDF in the plan") {
    val p = plan("t14_redact")
    assert(!p.contains("Exchange"))
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.contains("ScalaUDF"), p.take(1500))
  }

  test("t16 bm25: one tokenize pass, one-row broadcasts, TakeOrdered top-k") {
    val p = plan("t16_bm25")
    // the match side is ONE explode+aggregate exchange; the df
    // aggregate consumes that SAME exchange, so the static plan prints
    // the subtree twice (2 Generates) but exchange reuse runs the
    // tokenize pass once — 3+ Generates would mean a genuinely new
    // corpus pass appeared. df and corpus stats come back as one-row
    // broadcast cross joins; the top-k must be per-partition heads,
    // never a global sort.
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert("""\(\d+\) Generate\b""".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("v9 pq knn: rank-window pruned, corpus encoded without a shuffle") {
    val p = plan("v9_knn_pq")
    // top-k prunes before the full window sort, and the corpus side
    // reaches the broadcast NL join straight from its scan (encoding
    // is map-side: no exchange below the join)
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("v10 semdedup: map-side cell assignment, equi-join pair search") {
    val p = plan("v10_semdedup")
    // the assignment must stay a literal-centroid projection (vecdot
    // against constants), never a join against a centroid table...
    assert(p.contains("vecdot"), p.take(1500))
    // ...and candidate pairs must come from an equi-join on the cell
    // id — a nested-loop pair scan is the all-pairs blow-up SemDeDup
    // exists to avoid
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("v11 recall eval keeps both knn top-k prunes") {
    val p = plan("v11_ann_recall")
    // each side's rank window must group-limit before its full sort
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
    // ivf side joins on the cell (equi), brute side broadcasts queries
    assert(p.contains("BroadcastHashJoin"))
  }

  test("t17 rare terms: partial aggs collapse tokens before any join") {
    val p = plan("t17_rare_terms")
    // tf, vocab, and the per-doc rollup must all partial-aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("t15 mixing windows per (domain, bucket), not per domain alone") {
    val p = plan("t15_domain_mix")
    // the window's required distribution must include the hash bucket
    // — partitioning by domain alone is the straggler shape the
    // two-phase scan exists to avoid
    assert("hashpartitioning\\(_dom[#\\d]*, _b".r.findFirstIn(p.toLowerCase)
      .isDefined || p.contains("_b"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("t18 dup spans: grams collapse to hash-keyed counts, pruned scan") {
    val p = plan("t18_dup_spans")
    // dg partial+final, gd partial+final, per-doc rollup — losing a
    // partial means raw grams cross an exchange
    assert("HashAggregate".r.findAllIn(p).size >= 5, p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("s2 resample: one running window, no join of any kind") {
    val p = plan("s2_resample")
    // the as-of union shape: a Join node appearing means the quadratic
    // grid×history formulation crept back in
    assert(!p.contains("Join"), p.take(2000))
    assert("""\(\d+\) Window""".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("q25 funnel: the whole stage chain runs in one key partitioning") {
    val p = plan("q25_funnel")
    // every exchange must hash on the funnel key alone — a compound
    // (key, t_i) partitioning appearing means a stage aggregate
    // stopped reusing the join's distribution and added a shuffle
    val parts = "hashpartitioning\\(([a-zA-Z0-9_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(parts.subsetOf(Set("key")), s"$parts\n${p.take(1500)}")
  }

  test("t20 chunking is a pure map: no exchange anywhere in the plan") {
    val p = plan("t20_chunk_rag")
    assert(!p.contains("Exchange"), p.take(1500))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("v12 ivf-pq: cell equi-join replaces the broadcast NL product") {
    val p = plan("v12_knn_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // per-query top-k still prunes through the rank window
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q27 hopping: window explode is a map-side Expand, no Window op") {
    val p = plan("q27_hopping")
    // window(size, slide) must plan as Expand (slide-ratio row
    // amplification) feeding the tumbling-style aggregate — a Window
    // or Join node appearing means the per-slide re-scan crept in
    assert(p.contains("Expand"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(!"""\(\d+\) Window""".r.findAllIn(p).hasNext, p.take(2000))
  }

  test("q28 zscore: moments broadcast back, event scan never shuffles") {
    val p = plan("q28_zscore")
    // the per-user stats frame must re-enter as a broadcast — a
    // SortMergeJoin here means the full event stream shuffles twice
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("s3 cusum: all four windows ride ONE sort and ONE exchange") {
    val p = plan("s3_cusum")
    // per-key totals (whole-partition frames) AND the prefix-sum /
    // running-min all share the (key, ts, id) sort under a single
    // exchange — a Sort or Exchange appearing twice means either the
    // totals stopped sharing the ordering or the groupBy+join form
    // crept back
    assert("""\(\d+\) Sort\b""".r.findAllIn(p).size == 1, p.take(2000))
    assert("""\(\d+\) Exchange\b""".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("t23 windowed heavy hitters: MG partials + broadcast verify") {
    val p = plan("t23_windowed_hh")
    // same contract as t8, per window: bounded partial buffers before
    // the exchange, candidates broadcast into the exact pass
    assert("(?i)partial_misragries".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("v20 hamming: sig scan carries no vectors; rerank joins broadcast") {
    val p = plan("v20_hamming_knn")
    // the candidate scan is a broadcast NL join of 16-byte sig rows —
    // the embedding column must not ride through it (the 32x payload
    // cut is the operator's reason to exist); it reappears only in the
    // rerank stage's broadcast hash joins
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"))
    val nlJoin = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .takeWhile(_ != '\n')
    assert(!nlJoin.contains("embedding"), nlJoin)
    // hamming top-R window prunes per-group before the full sort
    assert(p.contains("WindowGroupLimit"))
  }

  test("d10 chunk dedup: no global sort; reassembly is partial-aggregated") {
    val p = plan("d10_chunk_dedup")
    // first-occurrence window partitions by chunk — a global (empty-
    // partition) Window would be a scale killer
    assert(!p.contains("SinglePartition"), p.take(2000))
    // reassembly collect_list must map-side combine
    assert("(?i)partial_collect_list|ObjectHashAggregate".r.findFirstIn(p).isDefined)
  }

  test("r5 latest-state plans as partial+final agg, never a window sort") {
    val p = plan("r5_latest_state")
    // the whole scale argument: max(struct) partial-aggregates before
    // the exchange; a Window operator here means someone rewrote it to
    // row_number over the feed
    assert(!p.contains(" Window "), p.take(2000))
    assert("(?i)partial_max".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("s8 ewma: sixteen lags ride one sort, scan pruned to four columns") {
    val p = plan("s8_ewma")
    // one exchange (hash by key) + one sort serve the whole lag chain
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(2000))
    assert("""\(\d+\) Sort""".r.findAllIn(p).size == 1, p.take(2000))
    // four columns pruned, but ts's parquet encoding is deliberately
    // NOT pinned — Tables.events schema-dispatches across testdata
    // regenerations (timestamp / timestamp_ntz / nanos-as-bigint)
    assert(p.contains("ReadSchema: struct<event_id:bigint,ts:"))
    assert(p.contains("user_id:bigint,value:double"))
  }

  test("q34 zorder: a pure codegen projection — no exchange anywhere") {
    val p = plan("q34_zorder")
    // the 32-term Morton interleave is shift/mask/or arithmetic inside
    // one whole-stage span; an Exchange appearing means the bit math
    // stopped being a map-side expression
    assert(!p.contains("Exchange"), p.take(1500))
    assert(!p.contains("ScalaUDF"), p.take(1500))
  }

  test("q33 key profile: TakeOrdered top-k, never a global sort") {
    val p = plan("q33_key_profile")
    // the profiled table aggregates once (exchange reused for the
    // summary); top-k is per-partition heads + merge, the summary is a
    // one-row broadcast cross join
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("""\(\d+\) Sort""".r.findAllIn(p).isEmpty, p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("t30 surprisal: vocab counts join back as a broadcast hash join") {
    val p = plan("t30_surprisal")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q10 json extract: one pruned scan, one exchange, no UDF") {
    // round-10's driver capture showed a 12× warm-mode outlier on this
    // query; the plan itself is the minimal agg shape — pin it so any
    // future slowdown must be environmental, not planning
    val p = plan("q10_json_extract")
    assert(p.contains("ReadSchema: struct<props:string>"), p.take(1500))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("ScalaUDF"), p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500)) // partial+final
  }

  test("d22 simhash near-dup: band equi-join, never all-pairs") {
    val p = plan("d22_simhash_neardup")
    // the candidate join must key on (band, value) — a cartesian or
    // NL join here means the pigeonhole banding stopped pruning
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000)) // popcount is codegen'd
  }

  test("t32 quantiles: pruned scan, partial value-count agg, no cartesian") {
    val p = plan("t32_quantile_stats")
    // the only pass over raw rows is the (source, value) count — it
    // must map-side combine (partial HashAggregate) before any window
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("t33 percentile gate: thresholds broadcast back, fact never shuffled by the gate") {
    val p = plan("t33_quality_gate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("m7 perceptual near-dup: band equi-join, signature scan carries no payload") {
    val p = plan("m7_phash_neardup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000)) // aHash + popcount codegen'd
  }

  // ---- round-11 relayout/codegen movers (4–15× wins) pinned ------------

  test("d2 LSH: one banding pass cached, pair join is a hash equi-join") {
    val p = plan("d2_lsh_candidates")
    // both join sides must read the SAME cached band relation (losing
    // the cache re-runs shingle+minhash per side — the pre-round-11
    // 2.18s shape); the pairing must stay an equi-join on (band, key)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("d13 pagerank serves the staged pair artifact — no inline shingling") {
    val p = plan("d13_pagerank")
    // edges come from the neardup-pairs artifact (a parquet read);
    // re-deriving them would put the shingle explode + minhash back
    // into every query (the 9.89s pre-staging shape)
    assert(!p.contains("shingle"), p.take(2000))
    assert(!p.contains("split(text"), p.take(2000))
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
  }

  test("d6 clusters: in-core union-find path yields a local result at spec scale") {
    // the size-adaptive claim: below the edge threshold the component
    // labels are computed in-core and the query is a LocalTableScan,
    // not a distributed fixpoint
    assert(plan("d6_dedup_clusters").contains("LocalTableScan"))
  }

  test("t26 bloom decontam: semi probe, codegen gram arithmetic, staged grams") {
    val p = plan("t26_bloom_decontam")
    // the verify join must stay left-semi against a broadcast build of
    // the staged gram set (the inner form re-materialized the probe
    // chain; a shuffled join would move the corpus grams)
    assert(p.contains("BroadcastHashJoin LeftSemi"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // grams must derive via substring_index arithmetic (codegen), not
    // a HOF lambda over a materialized token array (CodegenFallback)
    assert(p.contains("substring_index"), p.take(2000))
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
  }

  test("t11b curate: staged legs join back by broadcast — no inline shingling") {
    val p = plan("t11b_curate_gated")
    // the three shuffling legs (near-dup index, span report, decontam)
    // are staged artifacts; the final composition must join them as
    // broadcast builds onto the doc scan, never re-shingle
    assert(!p.contains("shingle"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
  }

  test("q20 brand/supplier: dims broadcast, fact never re-shuffled before the agg") {
    val p = plan("q20_brand_supplier")
    // part/supplier/nation are all dim-sized: every join must be a
    // broadcast hash join, so lineitem flows scan → joins → partial
    // agg with its only exchange at the final (distinct-carrying) agg
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("ShuffledHashJoin"), p.take(2000))
  }

  // ---- round-12 newcomers pinned ---------------------------------------

  test("t43 bigram surprisal: count tables join back as broadcasts") {
    val p = plan("t43_bigram_surprisal")
    // unigram/bigram counts are vocab-sized — they must broadcast
    // onto the token stream, never shuffle it
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("t45 NB classifier: model joins the token stream as a broadcast") {
    val p = plan("t45_nb_quality")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("t47 DSIR: bucket model broadcasts, resample rank is group-limited") {
    val p = plan("t47_dsir_sample")
    // the 256-row model and the per-stratum maxima must broadcast;
    // the top-k rank window must prune per task before the sort
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("t48 within-doc dedup is a pure map: zero exchanges, all codegen") {
    val p = plan("t48_intradoc_dedup")
    // the whole point: higher-order array ops on the row, no shuffle
    // at any corpus size — an Exchange appearing means the local op
    // grew a global stage
    assert("""\(\d+\) Exchange""".r.findAllIn(p).isEmpty, p.take(2000))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("d25 normalized dedup: map-side canonicalization, one partial agg") {
    val p = plan("d25_normalized_dedup")
    assert(p.contains("HashAggregate"), p.take(2000)) // partial+final
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("ScalaUDF"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(2000))
  }

  test("t49 fertility serves the staged BPE counts, dims broadcast") {
    val p = plan("t49_bpe_fertility")
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("t11c full cascade: staged legs, no inline shingling") {
    val p = plan("t11c_curate_full")
    assert(!p.contains("shingle"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
  }

  test("t50 truncation sweep: pruned scan, one exchange") {
    val p = plan("t50_truncation_sweep")
    assert(p.contains("ReadSchema: struct<text:string>"), p.take(2000))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }

  test("m10 decoded near-dup: band equi-join over the decode seam") {
    val p = plan("m10_decoded_neardup")
    // signatures come out of the mapPartitions decode seam, pairs out
    // of the pigeonhole band join — never an all-pairs product
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("d26 prefix filter: per-pair array verify, never a row fan-out") {
    val p = plan("d26_prefix_filter")
    // the verify leg intersects the two docs' shingle ARRAYS per
    // candidate row; losing this (back to exploding candidates over
    // shingle rows) re-shuffles |cand|·|doc| rows — measured 3.7× at
    // sf0.1
    assert(p.contains("array_intersect"), p.take(2000))
    // candidate generation is an equi-join on the prefix shingle
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("s11 nearest join: one sort serves both direction frames") {
    val p = plan("s11_nearest_join")
    // prev (running last) and next (forward first) share one
    // partition+order ⇒ ONE Window over ONE Exchange+Sort; the
    // purchase dedup adds its own rank-limited window — 2 exchanges
    // total, and the rank prunes before the full sort
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2, p.take(2000))
    assert("""\(\d+\) Window\b""".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("v24 centroid gate is one codegen'd map over a pruned scan") {
    val p = plan("v24_embed_quality")
    // the centroid is a collected literal: scoring must stay a
    // shuffle-free scan in a single codegen span
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(embedding)"), p.take(2000))
    // one codegen span end to end (FormattedMode tags each operator)
    assert("""codegen id : (\d+)""".r.findAllMatchIn(p)
      .map(_.group(1)).toSet == Set("1"), p.take(2000))
  }

  test("t51 blocklist gate is a pure map — zero exchanges") {
    val p = plan("t51_blocklist")
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("s12 decomposition is one scan, one pipeline — never a self-join") {
    val p = plan("s12_seasonal")
    // the seasonal leg is a whole-partition window, not a re-agg
    // joined back: a join would duplicate the daily lineage and scan
    // the event table twice
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    // count agg + trend window + seasonal window = 3 exchanges max
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 3, p.take(2000))
  }

  test("r7 time travel pushes the cutoff into the scan") {
    val p = plan("r7_time_travel")
    assert(p.contains("LessThanOrEqual(ts,"), p.take(2000))
    // the latest read stays the keys-sized max-struct aggregate: one
    // exchange, no per-key row_number sort of the full feed
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("m12 scene-change driver query plans with zero exchanges") {
    val p = plan("m12_scene_change")
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000)) // the one posexplode
  }

  test("v25 sweep: one ranked probe window, staged truth/cells — no per-config replay") {
    val p = plan("v25_ivf_nprobe_sweep")
    // ONE ranked probe set serves all four nprobe configs
    // (probe_rank <= np is the np-probe set); the candidate frame is
    // deliberately unpersisted, so its probe window appears exactly
    // twice (once per count aggregate — broadcast joins over staged
    // reads, no cache entry left behind). More means the per-config
    // union-leg replay came back (the round-13 1.9s plan defect:
    // Catalyst does not dedupe subplans across unions). \b excludes
    // WindowGroupLimit nodes.
    assert("""\(\d+\) Window\b""".r.findAllIn(p).size == 2, p.take(2000))
    // brute-force truth and corpus cell assignment are SERVED staged
    // (the d30 Artifacts.table discipline), never rebuilt inline
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("v26 ivf-pq serve: probe-cell equi-join prunes, ADC scores, rank-limit tops") {
    val p = plan("v26_ivfpq_serve")
    // the index is SERVED STAGED (Artifacts parquet — the ingest-time
    // build never fuses into the serve stage), candidates come from
    // the probe-cell EQUI-join (broadcast query side), and the only
    // NL product allowed is the ×|centroids| query probe-ranking
    // cross: a second NL join, a sort-merge join, or a cartesian
    // means the staged serve or the coarse pruning was lost.
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert("""\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size <= 1,
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // per-query top-k prunes through the rank window
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("v28 pq sweep: staged truth, four independent ADC legs, no replay") {
    val p = plan("v28_pq_sweep")
    // the brute-force truth is SERVED staged (read once per leg from
    // Artifacts parquet), never rebuilt inline — the v25 lesson
    assert(p.contains(graft.core.Artifacts.root), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // each config leg tops through its own rank window (WindowGroupLimit)
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("v30 filtered serve: predicate pushed into the index scan, raw vectors never read") {
    val p = plan("v30_filtered_serve")
    // the label predicate must land in the staged index's parquet
    // scan — metadata rides the index (carryCols) precisely so a
    // filtered serve prunes at the scan instead of joining a
    // corpus-sized metadata table per query batch
    assert(p.contains("PushedFilters: [IsNotNull(label)"), p.take(2500))
    // the serve touches (vec_id, label, codes, cell) only: the index
    // scan's ReadSchema must NOT include the raw embedding column —
    // at 100 TB the float vectors never leave cold storage
    val idxRead = """ReadSchema: [^\n]*codes""".r.findFirstIn(p)
    assert(idxRead.isDefined, p.take(2500))
    assert(!idxRead.get.contains("embedding"),
      s"index scan reads raw vectors: $idxRead")
  }

  test("v33 residual serve: codes scanned, raw vectors never read at serve time") {
    val p = plan("v33_residual_pq_serve")
    // the residual serve reads (vec_id, cell, codes) off the staged
    // index — the embedding column must be pruned from the index
    // scan's ReadSchema exactly like v30 (the cell partition column
    // rides the directory layout, not the schema)
    val idxRead = """ReadSchema: [^\n]*codes""".r.findFirstIn(p)
    assert(idxRead.isDefined, p.take(2500))
    assert(!idxRead.get.contains("embedding"),
      s"residual index scan reads raw vectors: $idxRead")
  }

  // ---- round-18 optimization movers pinned -------------------------------

  test("v32 maxsim serve: candidate frame pinned once, probe lineage never replayed") {
    val p = plan("v32_maxsim_rerank")
    // cand persists and is read by all three consumers — losing the pin
    // re-plans the whole probe pipeline (query chunk embeds → centroid
    // cross join → rank windows) once per consumer (the r18 before-plan
    // carried it twice: 13 Generates vs 4)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(2000))
    // the staged index is restricted to candidate docs by ONE broadcast
    // semi-join before the fan-out
    assert("BroadcastHashJoin LeftSemi".r.findAllIn(p).size == 1,
      p.take(2000))
    // the probe pipeline appears once: its two document scans + the
    // querySide scan + (outside the cache) nothing else — a Generate
    // count past 5 means a replayed chunk-embed lineage crept back
    assert("""\(\d+\) Generate\b""".r.findAllIn(p).size <= 5, p.take(2000))
  }

  test("d29 sweep: one candidate universe, one aggregate — no per-config replay") {
    val p = plan("d29_lsh_plan_sweep")
    // the one-universe rewrite: a single band self-join + ONE global
    // aggregate serves all four configs; the before-plan carried 24
    // exchanges (4 legs × 2 consumers × the join/distinct chain)
    assert("""\(\d+\) Exchange\b""".r.findAllIn(p).size <= 5, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("d26 prefix filter keeps the PPJoin positional prune") {
    val p = plan("d26_prefix_filter")
    // the lossless positional filter (rank-capped overlap bound) must
    // stay in the candidate join's filter — losing it re-inflates the
    // distinct + verify volume (1.8× measured at sf0.1)
    assert("least\\(\\(n_a".r.findFirstIn(p).isDefined, p.take(2500))
    assert(p.contains("array_intersect"), p.take(2500))
  }

  test("v43 chunk-upsert serve prunes index cells via dynamic partition pruning") {
    val p = plan("v43_chunk_upsert_serve")
    // the re-staged cell-partitioned layout: the probe join must reach
    // the index scan as a partition filter, not a post-scan filter
    assert(p.contains("dynamicpruning"), p.take(2500))
  }

  test("hammingBandPairs cache lifetime: entry outlives the call, clearCache releases it") {
    // the documented contract (Dedup.hammingBandPairs scaladoc): the
    // banded frame stays persisted after the action — a long-lived
    // caller must clearCache/unpersist between calls; Verify/Bench do.
    // Pinning BOTH halves: the cache exists (losing it re-runs the
    // signature lineage per join side) and clearCache fully drains it.
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    val docs = graft.core.Tables.load(spark, dir, "documents")
    graft.operators.Dedup.simhashNearDup(docs, maxHamming = 3).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "banded frame should be cached for the action's lifetime")
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clearCache must release the banded frame — nothing accretes")
  }
}
