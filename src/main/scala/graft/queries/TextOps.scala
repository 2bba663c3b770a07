package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Mixing

/** Text-analysis operators over the `documents` table: keyword stats
  * (A4/F6 in SURVEY.md §2), language ID, quality scoring, token
  * counting, and rolling-hash fingerprinting.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Staged per-doc BPE counts (t39 is the honest-lineage build of the
    * same frame; t40/t41 serve this artifact — the tokenizer-version
    * economics: counts materialize once per (corpus, merges) pair).
    */
  private[queries] def bpeCountsIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s, "bpe-counts|merges=v1",
      graft.core.Artifacts.fingerprint(dir))(
      graft.functions.Bpe.docTokenCounts(docs(s, dir)))

  /** The staged canonicalized page link graph behind t59: href
    * extraction + canonicalization of BOTH endpoints + the edge
    * distinct run ONCE per corpus version ([[graft.core.Artifacts]]);
    * pagerank (and any other centrality pass) then reads a distinct
    * (src, dst) parquet — at 100 TB the link graph is exactly the
    * staged table a crawl pipeline materializes between the fetch
    * tier and every downstream graph consumer.
    */
  private def pageGraphIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s, "page-graph|canon|distinct",
      graft.core.Artifacts.fingerprint(dir))({
      val d = docs(s, dir)
      val own = graft.operators.Urls.withUrlPayload(d)
        .select(col("doc_id"),
          graft.operators.Urls.canonicalUrl(col("url")).as("src"))
      val links = graft.operators.Html.withLinkedHtmlPayload(d)
        .select(col("doc_id"),
          explode(graft.operators.Html.extractLinks(col("html")))
            .as("href"))
        .select(col("doc_id"),
          graft.operators.Urls.canonicalUrl(col("href")).as("dst"))
      own.join(links, "doc_id")
        .select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A4 + F6: tokenize → explode → keyword counts --------------------
    "t1_keyword_stats" -> { (s, dir) =>
      docs(s, dir)
        .select(col("source"), explode(tokenize(col("text"))).as("keyword"))
        .groupBy(col("keyword"), col("source"))
        .agg(count(lit(1)).as("ct"))
    },

    // ---- language ID (stopword-profile heuristic) ------------------------
    "t2_lang_id" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        langId(col("text")).as("pred_lang"),
        col("lang").as("labeled_lang"))
    },

    // ---- quality scoring -------------------------------------------------
    "t3_quality_score" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        nTokens(col("text")).as("n_tokens"),
        punctCount(col("text")).as("punct_ct"),
        stopwordRatio(col("text")).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
    },

    // ---- token counting (whitespace + BPE-ish regex) ---------------------
    "t4_token_count" -> { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("doc_ct"),
          sum(nTokens(col("text"))).as("ws_tokens"),
          sum(regexTokenCount(col("text"))).as("re_tokens"))
    },

    // ---- deterministic BPE token counting --------------------------------
    // the unit token-budget decisions actually run on: greedy BPE
    // (tiktoken's leftmost-lowest-rank merge loop) over the corpus-
    // trained fixture merges table. The sequential fold runs on the
    // DISTINCT-WORD vocabulary only; per-doc counts come from a
    // broadcast join of word multiplicities against the vocab lengths.
    // The oracle REPLAYS the merge loop as a DuckDB recursive CTE over
    // the same merges literal, so counts are engine-exact end to end.
    "t39_bpe_tokens" -> { (s, dir) =>
      graft.functions.Bpe.docTokenCounts(docs(s, dir))
    },

    // ---- token-budget mixing re-run on BPE weights -----------------------
    // t15's budget-filling mix weighted by what a loader really
    // consumes: BPE tokens (a 1-token frequent word no longer costs a
    // 5-token rare one); budgets cap src0 at ~half its BPE mass and
    // the rest at ~70%, so both budget branches and the keep/drop
    // boundary fire on every source
    "t40_bpe_domain_mix" -> { (s, dir) =>
      val d = docs(s, dir)
      val bpe = bpeCountsIdx(s, dir).select(col("doc_id"), col("bpe_tokens"))
      Mixing.mixByTokenBudget(d.join(bpe, "doc_id"), "source", "doc_id",
          col("bpe_tokens"), Map("src0" -> 1800L), defaultBudget = 2500L)
        .filter(col("kept"))
        .select(col("doc_id"), col("source"), col("tok_prefix"))
    },

    // ---- BPE tokenizer TRAINING (the step that froze t39's fixture) ------
    // learn the top-10 merges from the corpus's own word counts; the
    // oracle replays all ten rounds as unrolled SQL stages (pair
    // counts → argmax with the same total tie-break → string-replace
    // apply), so ranks, pairs, AND counts must match bit-for-bit
    "t52_bpe_train" -> { (s, dir) =>
      graft.functions.Bpe.train(docs(s, dir), nMerges = 10)
    },

    // ---- rolling-hash document fingerprint -------------------------------
    "t5_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        rollingFingerprint(col("text")).as("fp"),
        contentHash(col("text")).as("content_hash"))
    },

    // ---- deterministic train/val split -----------------------------------
    "t7_stable_split" -> { (s, dir) =>
      docs(s, dir)
        .groupBy(stableSplit(col("doc_id")).as("split"))
        .agg(count(lit(1)).as("doc_ct"),
          sum(nTokens(col("text"))).as("tok_sum"))
    },

    // ---- corpus profiling: per-language length quantiles -----------------
    // Exact percentile over INTEGER token counts at dyadic percentages:
    // both engines interpolate lo + (hi-lo)·frac with frac ∈ {0, ¼, ½,
    // ¾} — exact in double, so results hash-match. (Doubles at
    // arbitrary p would round differently; at 100 TB swap in
    // approx_percentile — see SCALING.md.)
    "t6_corpus_profile" -> { (s, dir) =>
      docs(s, dir)
        .select(langId(col("text")).as("pred_lang"),
          nTokens(col("text")).as("n_tokens"),
          qualityScore(col("text")).as("quality"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("doc_ct"),
          percentile(col("n_tokens"), lit(0.25)).as("tok_p25"),
          percentile(col("n_tokens"), lit(0.5)).as("tok_p50"),
          percentile(col("n_tokens"), lit(0.75)).as("tok_p75"),
          min(col("quality")).as("min_q"),
          max(col("quality")).as("max_q"))
    },

    // ---- exact heavy hitters (bounded-state MG sketch + verify pass) -----
    // tokens with > 1/30 of total mass; threshold compared in integer
    // arithmetic so both engines agree bit-for-bit at the boundary
    "t8_heavy_hitters" -> { (s, dir) =>
      graft.operators.Frequency.heavyHitters(
        docs(s, dir).select(explode(tokenize(col("text"))).as("token")),
        "token", k = 32, num = 1L, den = 30L)
    },

    // ---- top collocations by lift ----------------------------------------
    // corpus-level bigram phrases: exact integer counts, one fixed-
    // shape double lift expression, (lift, bigram) TakeOrdered top-50
    "t27_collocations" -> { (s, dir) =>
      graft.operators.Frequency.collocations(
        docs(s, dir), "doc_id", "text", minCount = 5L, topK = 50)
    },

    // ---- trigram surprisal with backoff (train/score split) --------------
    // counts from the t7 train split only; val docs are where unseen
    // trigrams/bigrams/OOV actually fire (+1 bit per backoff level —
    // power-of-two Stupid Backoff, engine-exact)
    "t54_backoff_surprisal" -> { (s, dir) =>
      graft.operators.Frequency.backoffSurprisal(
        docs(s, dir), "doc_id", tokenize(lower(col("text"))),
        isTrain = graft.functions.TextFunctions.stableSplit(col("doc_id"))
          === "train")
    },

    // ---- HTML/boilerplate extraction (the C4/RefinedWeb stage 0) ---------
    // deterministic markup synthesized from the text rows (the m8
    // construction-math discipline — the oracle replays the same
    // bytes), then the 6-rule strip: script/style/comment blocks out,
    // tags to spaces, entities decoded, whitespace collapsed. The
    // text-to-markup ratio is the stage's quality gate signal. One
    // map-side projection — no shuffle, no UDF.
    "t55_html_extract" -> { (s, dir) =>
      graft.operators.Html.extractionReport(
        graft.operators.Html.withHtmlPayload(docs(s, dir)))
    },

    // ---- URL canonicalization + URL-level dedup (stage 0's other half) --
    // deterministic URLs from (id, source) — casing/www/default-port/
    // tracking-param/fragment variants with (id / 3) path collisions
    // so the dedup fires; canonical form per the 6 rules, registrable
    // domain, keeper = smallest id per canonical group. One hash
    // exchange on the canonical string; normalization is map-side.
    "t56_url_dedup" -> { (s, dir) =>
      graft.operators.Urls.urlDedupReport(
        graft.operators.Urls.withUrlPayload(docs(s, dir)))
    },

    // registrable domains via the real Public Suffix List algorithm
    // (plain + wildcard + exception rules), replacing t56's last-two-
    // labels heuristic: candidate suffixes explode map-side (≤ 7 per
    // host), one broadcast rule join, one max-struct per host
    "t57_registrable_domain" -> { (s, dir) =>
      graft.operators.Urls.registrableDomainPsl(
        graft.operators.Urls.withIntlUrlPayload(docs(s, dir)),
        graft.operators.Urls.pslRules(s))
    },

    // per-registrable-domain crawl governance (C4's per-domain caps /
    // RefinedWeb's dup-heavy-host demotion input): pages, URL-dedup
    // keepers, dup rate, token mass — one GROUP BY domain, every sum
    // partial-aggregated so a mega-domain never hot-keys a reducer
    "t58_domain_stats" -> { (s, dir) =>
      graft.operators.Urls.domainStats(
        graft.operators.Urls.withUrlPayload(docs(s, dir)),
        graft.operators.Urls.pslRules(s),
        weight = graft.functions.TextFunctions.nTokens(col("text")))
    },

    // robots.txt gate (RFC 9309) — the stage before stage 0: parse
    // per-host files into (agent, type, path) rules, resolve the
    // crawler's effective group (exact beats *), gate every URL by
    // longest-prefix-match with Allow winning ties; one broadcast
    // rule join + one max-struct per URL
    "t60_robots_gate" -> { (s, dir) =>
      val urls = graft.operators.Urls.withUrlPayload(docs(s, dir))
        .select(col("doc_id"),
          graft.operators.Urls.canonicalUrl(col("url")).as("url"))
      graft.operators.Robots.applyRobots(urls,
        graft.operators.Robots.parseRobots(
          graft.operators.Robots.fixture(s)),
        agent = "crawler-x")
    },

    // sitemap coverage audit — the OTHER crawl-control file
    // (sitemaps.org; t60 covers robots.txt): per-host sitemaps parse
    // map-side, listed locs canonicalize, and one broadcast join
    // against the crawl's canonical URL set flags crawled/missing
    // with the per-host fetch-priority order (uncrawled first, then
    // freshest lastmod)
    "t62_sitemap_audit" -> { (s, dir) =>
      val crawled = graft.operators.Urls.withUrlPayload(docs(s, dir))
        .select(graft.operators.Urls.canonicalUrl(col("url"))
          .as("canon_url"))
      graft.operators.Sitemaps.coverageAudit(
        graft.operators.Sitemaps.parseSitemap(
          graft.operators.Sitemaps.fixture(s)),
        crawled)
    },

    // corpus-wide line-level boilerplate removal (CCNet/RefinedWeb):
    // a line recurring in >= 4 DISTINCT docs is chrome and is cut
    // from every doc; the payload's host header/footer and nav lines
    // die, the <= 3-doc `page b` line survives (the threshold
    // boundary), content chunks rejoin in original order
    "t63_line_dedup" -> { (s, dir) =>
      graft.operators.Boilerplate.lineDedup(
        graft.operators.Boilerplate.withLinePayload(docs(s, dir)),
        textCol = "page_text")
    },

    // the crawl-control DISCOVERY loop end to end: robots.txt
    // advertises sitemaps (Sitemap: records — only advertised files
    // are known, so blog.sample.net's never enters), the advertised
    // sitemaps list URLs, the coverage audit keeps the uncrawled
    // frontier, and the robots GATE then prunes it (cdn's loc is
    // listed-but-disallowed — discovered != fetchable); survivors
    // rank per host by freshness
    "t64_discovery_frontier" -> { (s, dir) =>
      // the discovery+gate half is corpus-independent (robots +
      // sitemap files only), so it serves as a staged artifact keyed
      // by the fixtures' content — the per-query cost is the audit's
      // one corpus semi-join + the rank (the t59 staging discipline)
      val fixFp = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val bytes = (graft.operators.Robots.fixtureRows ++
            graft.operators.Sitemaps.fixtureRows)
          .map(r => r._1 + "\u0000" + r._2).mkString("\u0001")
          .getBytes("UTF-8")
        md.digest(bytes).map("%02x".format(_)).mkString
      }
      val gated = graft.core.Artifacts.table(s,
        "t64gate|crawler-x", fixFp)(
        graft.operators.Sitemaps.gatedListed(
          graft.operators.Robots.fixture(s),
          graft.operators.Sitemaps.fixture(s), "crawler-x"))
      graft.operators.Sitemaps.frontierFromGated(gated,
        graft.operators.Urls.withUrlPayload(docs(s, dir))
          .select(graft.operators.Urls.canonicalUrl(col("url"))
            .as("canon_url")))
    },

    // the crawl lifecycle's LAST edge: re-fetch scheduling for the
    // crawled listed pages from the changefreq/lastmod hints — due
    // flag against a fixed as-of date in pure day arithmetic, with
    // `never` pages never due, missing changefreq defaulting, and
    // unknown-lastmod pages assumed maximally stale
    "t65_refetch_schedule" -> { (s, dir) =>
      graft.operators.Sitemaps.refetchSchedule(
        graft.operators.Sitemaps.coverageAudit(
          graft.operators.Sitemaps.parseSitemap(
            graft.operators.Sitemaps.fixture(s)),
          graft.operators.Urls.withUrlPayload(docs(s, dir))
            .select(graft.operators.Urls.canonicalUrl(col("url"))
              .as("canon_url"))),
        asOf = "2024-02-20")
    },

    // the fetch-EXECUTION edge of the crawl loop: the audit's
    // per-host fetch rank becomes per-URL start offsets under each
    // host's Crawl-delay (the de-facto politeness extension — exact
    // agent over `*`, numeric values only, max of a group's delays,
    // hosts without a record at the caller default), one fetch queue
    // per host running in parallel
    "t67_politeness" -> { (s, dir) =>
      graft.operators.Sitemaps.politenessSchedule(
        graft.operators.Sitemaps.coverageAudit(
          graft.operators.Sitemaps.parseSitemap(
            graft.operators.Sitemaps.fixture(s)),
          graft.operators.Urls.withUrlPayload(docs(s, dir))
            .select(graft.operators.Urls.canonicalUrl(col("url"))
              .as("canon_url")))
          .select(col("host"), col("loc"), col("crawled"),
            col("fetch_rank")),
        graft.operators.Robots.crawlDelays(
          graft.operators.Robots.delayFixture(s), "crawler-x"),
        defaultDelayS = 5.0)
    },

    // the web link graph from crawl HTML: hrefs extracted (one regexp
    // pass), both endpoints canonicalized (the same page linked five
    // dirty ways must be ONE node), integer pagerank over the page
    // graph. The extracted+canonicalized edge list is STAGED
    // ([[pageGraphIdx]] — built once per corpus version like every
    // served family), so the query pays the pagerank iterations only:
    // each round is an edge join + node-sized agg
    "t59_link_graph" -> { (s, dir) =>
      graft.operators.Graph.pagerank(pageGraphIdx(s, dir), iters = 3)
    },

    // inbound anchor-text aggregation: anchor text describes the
    // TARGET page better than the page itself (the document-expansion
    // signal behind ORCAS/MS-MARCO-style training sets and classic
    // web ranking) — anchors parse map-side from the crawl HTML
    // ([[Html.extractAnchors]]), the href canonicalizes to the target
    // node, and per page the inlink count, anchor-variant count, and
    // the prevailing anchor (count desc, text asc) aggregate in one
    // exchange on the target page
    "t61_anchor_text" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val an = graft.operators.Html.withLinkedHtmlPayload(docs(s, dir))
        .select(explode(
          graft.operators.Html.extractAnchors(col("html"))).as("a"))
        .select(
          graft.operators.Urls.canonicalUrl(col("a.href")).as("page"),
          col("a.anchor").as("anchor"))
      val ct = an.groupBy(col("page"), col("anchor"))
        .agg(count(lit(1)).as("ct"))
      val w = Window.partitionBy(col("page"))
      ct.withColumn("n_inlinks", sum(col("ct")).over(w))
        .withColumn("n_variants", count(lit(1)).over(w))
        .withColumn("rk", row_number().over(
          w.orderBy(col("ct").desc, col("anchor"))))
        .filter(col("rk") === 1)
        .select(col("page"), col("n_inlinks"), col("n_variants"),
          col("anchor").as("top_anchor"), col("ct").as("top_ct"))
    },

    // ---- vocabulary-growth (Heaps' law) curve -----------------------------
    // cumulative distinct words at 8 corpus prefixes — the planning
    // input for every vocabulary-bound state (BPE, inverted indexes,
    // n-gram models); first-occurrence ids make it order-independent
    "t53_vocab_growth" -> { (s, dir) =>
      graft.operators.Frequency.vocabGrowth(docs(s, dir), bins = 8)
    },

    // ---- per-window exact heavy hitters (batch twin of the streaming
    // windowed MG sketch) ---------------------------------------------------
    // day windows over events, heavy users per day at > 1/50 of the
    // day's mass; k=64 < the 150 distinct users, so the MG candidate
    // pruning genuinely fires in every window before the exact verify
    "t23_windowed_hh" -> { (s, dir) =>
      val e = graft.core.Tables.events(s, dir)
        .filter(col("ts").isNotNull) // symmetric with the oracle's WHERE
      graft.operators.Frequency.windowedHeavyHitters(
        e.select(
          graft.core.Graft.floorDivExpr("unix_millis(ts)", 86400000L)
            .as("day"),
          col("user_id").cast("string").as("user_id")),
        windowCol = col("day") * 86400000L,
        valueCol = "user_id", k = 64, num = 1L, den = 50L)
    },

    // ---- weighted (priority) sampling: exact k per stratum ----------------
    // sequential Poisson sampling ∝ token count — longer docs
    // proportionally more likely, exactly 5 survivors per source,
    // deterministic under repartitioning (priority = md5-uniform / w)
    "t24_weighted_sample" -> { (s, dir) =>
      graft.operators.Mixing.prioritySample(
        docs(s, dir), "source", "doc_id", nTokens(col("text")), k = 5)
        .select(col("doc_id"), col("source"))
    },

    // two-pass variant: octave-bucketed cutoff pass, then the exact
    // rank window over ~k survivors per stratum — same oracle SQL as
    // t24 because the output contract is bit-identical; a green row
    // certifies the threshold pass loses nothing
    "t25_weighted_sample_2p" -> { (s, dir) =>
      graft.operators.Mixing.prioritySampleThresholded(
        docs(s, dir), "source", "doc_id", nTokens(col("text")), k = 5)
        .select(col("doc_id"), col("source"))
    },

    // ---- deterministic stratified sampling -------------------------------
    // per-language rates: en downsampled hard, zh half, rest 80% — the
    // "rebalance the corpus" op every multilingual pipeline runs
    "t9_stratified_sample" -> { (s, dir) =>
      docs(s, dir)
        .filter(stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> 2000, "zh" -> 5000), defaultPermyriad = 8000))
        .select(col("doc_id"), col("lang"))
    },

    // ---- sequence packing into fixed token budgets -----------------------
    // contiguous chunks of ~2048 tokens in doc_id order via the
    // two-phase distributed prefix sum; verified here by per-chunk
    // document and token totals
    "t10_pack_chunks" -> { (s, dir) =>
      graft.operators.Packing
        .packByBudget(docs(s, dir), "doc_id",
          nTokens(col("text")), budget = 2048L)
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("doc_ct"),
          sum(coalesce(nTokens(col("text")).cast(LongType), lit(0L)))
            .as("tok_sum"))
    },

    // ---- RAG sliding-window chunking --------------------------------------
    // 32-token windows, stride 24 (8-token overlap): every doc ≥ 1
    // chunk, multi-chunk docs exercise the overlap and tail paths
    "t20_chunk_rag" -> { (s, dir) =>
      graft.operators.Chunking.slidingChunks(
        docs(s, dir), "doc_id", "text", window = 32, stride = 24)
    },

    // ---- vocabulary head coverage (Zipf mass report) -----------------------
    // share of total token mass covered by the top-k terms, k ∈
    // {5, 10, 100} (100 > vocab exercises the saturation edge). Top-k
    // goes through orderBy+limit (TakeOrdered, never a global window
    // over the vocabulary); ties rank (cf DESC, term ASC) on both
    // engines
    "t22_head_coverage" -> { (s, dir) =>
      val tf = docs(s, dir)
        .select(explode(tokenize(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      val total = tf.agg(sum(col("cf")).as("total"))
      Seq(5, 10, 100).map { k =>
        tf.orderBy(col("cf").desc, col("term")).limit(k)
          .agg(sum(col("cf")).as("head_mass"))
          .select(lit(k).as("top_k"), col("head_mass"))
      }.reduce(_.unionByName(_))
        .crossJoin(total)
        // empty-vocabulary edge: the global agg still emits one row of
        // nulls per k while the oracle's CROSS JOIN over an empty
        // relation emits none — drop the null-total rows so both
        // engines agree on "no tokens → no report"
        .filter(col("total").isNotNull)
        .select(col("top_k"), col("head_mass"), col("total"),
          (col("head_mass").cast(DoubleType) / col("total").cast(DoubleType))
            .as("coverage"))
    },

    // ---- per-source data card --------------------------------------------
    // the composition summary a dataset release ships with: volume,
    // token mass, and language mix per source. Two-level aggregate so
    // the language argmax partial-aggregates (max over structs), never
    // collects rows; tie on count → greatest lang string, mirrored in
    // the oracle's ORDER BY ct DESC, lang DESC
    "t19_data_card" -> { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("ct"),
          sum(nTokens(col("text")).cast(LongType)).as("toks"))
        .groupBy(col("source"))
        .agg(sum(col("ct")).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          (sum(col("toks")).cast(DoubleType) /
            sum(col("ct")).cast(DoubleType)).as("avg_tokens"),
          count(lit(1)).as("n_langs"),
          max(struct(col("ct"), col("lang"))).getField("lang")
            .as("top_lang"),
          max(struct(col("ct"), col("lang"))).getField("ct")
            .as("top_lang_ct"))
    },

    // ---- unigram surprisal: the LM-free perplexity surrogate -------------
    // exact integer log2 via bit-length (length(bin(N DIV ct)) − 1) —
    // no float log anywhere, so the per-doc bit totals hash-match; the
    // mean is the single final divide
    "t30_surprisal" -> { (s, dir) =>
      graft.operators.Frequency.unigramSurprisal(
        docs(s, dir), "doc_id", tokenize(lower(col("text"))))
    },

    // ---- bigram conditional surprisal: order-aware LM surrogate ----------
    // t30's upgrade to a first-order LM: tokens score against
    // p(w|prev) (first token: unigram fallback), so scrambled word
    // order now raises surprisal even over common words; same integer
    // bit-length log2 discipline
    "t43_bigram_surprisal" -> { (s, dir) =>
      graft.operators.Frequency.bigramSurprisal(
        docs(s, dir), "doc_id", tokenize(lower(col("text"))))
    },

    // ---- CCNet perplexity buckets: head / middle / tail terciles ---------
    // the published LM-filter recipe (CCNet §4.3): score docs with an
    // LM (here t43's bigram surprisal as the deterministic surrogate),
    // cut the corpus into terciles, tag each doc head/middle/tail so
    // downstream sampling can weight buckets. Surprisal quantizes to
    // integer permille (bits_sum*1000 DIV n_tokens) so the tercile
    // cuts ride the exact value-count quantile machinery (t32) —
    // state ∝ distinct permille values, never a global row sort
    "t46_ppl_buckets" -> { (s, dir) =>
      val sur = graft.operators.Frequency.bigramSurprisal(
          docs(s, dir), "doc_id", tokenize(lower(col("text"))))
        .withColumn("_g", lit(0))
        .withColumn("ppm", expr("(bits_sum * 1000) DIV n_tokens"))
      val cuts = graft.operators.Quantiles.groupQuantiles(
          sur, "_g", col("ppm"), Seq(333, 667))
        .select(col("p333m").as("_c1"), col("p667m").as("_c2"))
      sur.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("ppm"),
          when(col("ppm") <= col("_c1"), "head")
            .when(col("ppm") <= col("_c2"), "middle")
            .otherwise("tail").as("bucket"))
    },

    // ---- trained quality filter: NB log-odds classifier ------------------
    // the CCNet/fastText tier above the rule gates: train a
    // multinomial-NB linear model on a labeled seed (lang='en' plays
    // the wiki-side seed on this corpus) and score every doc; all
    // log2 terms are integer bit-lengths, so the model and scores are
    // bit-exact cross-engine
    "t45_nb_quality" -> { (s, dir) =>
      val d = docs(s, dir)
      val toks = tokenize(lower(col("text")))
      val model = graft.operators.Classify.nbTrain(
        d, toks, col("lang") === "en")
      graft.operators.Classify.nbScore(d, "doc_id", toks, model)
    },

    // ---- DSIR importance resampling (Xie et al. 2023) --------------------
    // the seed-only cousin of t45: hashed unigram+bigram buckets
    // (B=256 — the model is bucket-sized, never vocabulary-sized),
    // target (lang='en') vs RAW bucket log-odds in integer bits, and
    // a per-source exact priority resample (k=3) where the weight
    // 2^score_bits makes the sampling key an integer SHIFT — the
    // whole draw replays bit-exactly in the oracle
    "t47_dsir_sample" -> { (s, dir) =>
      val d = docs(s, dir)
      val B = 256
      // featurization (the only pass over text bytes) staged once per
      // (corpus, B, target); model and scores both aggregate the
      // staged 3-column frame map-side
      val rows = graft.core.Artifacts.table(s, "dsir-rows|B=256|tgt=lang-en",
        graft.core.Artifacts.fingerprint(dir))(
        graft.operators.Dsir.featureRows(d, "doc_id",
          tokenize(lower(col("text"))), col("lang") === "en", B))
      val m = graft.operators.Dsir.modelFromRows(rows, B)
      val sc = graft.operators.Dsir.scoresFromRows(rows, "doc_id", m)
      graft.operators.Dsir.resample(
          sc.join(d.select(col("doc_id"), col("source")), Seq("doc_id")),
          "source", "doc_id", k = 3)
        .select(col("doc_id"), col("source"), col("n_grams"),
          col("score_bits"))
    },

    // ---- tokenizer fertility by language ---------------------------------
    // the tokenizer-eval metric every multilingual pipeline reports:
    // BPE tokens per whitespace word, per language — high fertility
    // means the tokenizer fragments that language (costs context
    // budget and training FLOPs). Served from the staged per-doc BPE
    // counts (t39's artifact), so this is one dim join + one
    // lang-sized aggregate over an already-materialized frame
    "t49_bpe_fertility" -> { (s, dir) =>
      bpeCountsIdx(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast(LongType).as("n_words"),
          sum(col("bpe_tokens")).cast(LongType).as("bpe_tokens"))
        .withColumn("fertility",
          col("bpe_tokens").cast(DoubleType) /
            nullif(col("n_words"), lit(0L)).cast(DoubleType))
    },

    // ---- context-length truncation-waste sweep ---------------------------
    // the "pick max_seq_len" eval: for each candidate context length,
    // how many docs truncate and what fraction of the corpus's tokens
    // fall past the boundary (truncation-style loading; packing t10
    // is the alternative this quantifies against). One explode of a
    // 3-literal array over the per-doc token counts — map-side until
    // the 3-row aggregate
    "t50_truncation_sweep" -> { (s, dir) =>
      val L = Seq(64, 128, 256)
      docs(s, dir)
        .select(nTokens(col("text")).cast(LongType).as("_n"))
        .select(col("_n"), explode(typedLit(L)).as("ctx_len"))
        .groupBy(col("ctx_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("_n") > col("ctx_len"), 1L).otherwise(0L))
            .as("docs_truncated"),
          sum(col("_n")).cast(LongType).as("total_tokens"),
          sum(greatest(col("_n") - col("ctx_len"), lit(0L)))
            .cast(LongType).as("tokens_lost"))
        .withColumn("loss_frac",
          col("tokens_lost").cast(DoubleType) /
            nullif(col("total_tokens"), lit(0L)).cast(DoubleType))
    },

    // ---- within-doc duplicate-chunk removal (keep-first) -----------------
    // the LOCAL complement of d10's corpus-wide chunk dedup: repeated
    // chunks inside one page are cut before any global pass — a pure
    // map (zero shuffle), all higher-order array functions
    "t48_intradoc_dedup" -> { (s, dir) =>
      graft.operators.Repetition.dedupWithin(docs(s, dir))
    },

    // ---- F6/A4: the CJK (FMM) tokenizer path, oracle-anchored ------------
    // the reference's one true UDF (`utils/KeywordUtil.java:13-35`) on
    // actual CJK text: deterministic CJK sentences are derived from
    // doc_id IDENTICALLY on both sides (array-literal indexing — no
    // randomness, no fixture files), the Spark side segments with the
    // real CjkSegmenter UDF, and the oracle replays forward-maximum-
    // match in pure SQL (longest-dict-match-per-position table + a
    // recursive position walk). Keyword counts hash-match ⇒ the FMM
    // production path is verified, not just unit-tested.
    "t28_keyword_cjk" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), cjkText(col("doc_id")).as("text"))
        .select(col("doc_id"),
          explode(graft.functions.CjkSegmenter.tokenizeCjk(col("text")))
            .as("keyword"))
        .groupBy(col("keyword"))
        .agg(count(lit(1)).as("ct"),
          countDistinct(col("doc_id")).as("n_docs"))
    },

    // ---- max-word (ik_max_word, smart=false) twin ------------------------
    // the reference instantiates `new IKSegmenter(reader, false)` —
    // ALL overlapping dictionary matches, not one partition. SQL mirror
    // needs no recursion: every dict match at every position, plus
    // singles for positions no match covers.
    "t29_keyword_cjk_full" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), cjkText(col("doc_id")).as("text"))
        .select(col("doc_id"),
          explode(graft.functions.CjkSegmenter.tokenizeCjkFull(col("text")))
            .as("keyword"))
        .groupBy(col("keyword"))
        .agg(count(lit(1)).as("ct"),
          countDistinct(col("doc_id")).as("n_docs"))
    })

  /** Deterministic CJK sentence for a doc id — shared shape of t28/t29.
    * Five pool picks with per-position affine indexes plus a constant
    * infix, built so the result exercises the interesting segmentation
    * regimes: overlapping words (大数据 ⊃ 数据), longest-match wins
    * (购物车 over 购物), un-matched noise chars (的/了/车), and words
    * formed across pick boundaries (数据+仓库). Pool is pure CJK — the
    * Latin/whitespace fallback path is t1's oracle.
    */
  private val cjkPool: Seq[String] = Seq(
    "尚硅谷", "大数据", "数据", "仓库", "实时", "购物",
    "车", "的", "手机", "旗舰店", "了", "搜索")

  private def cjkText(id: Column): Column = {
    val pool = array(cjkPool.map(lit): _*)
    def pick(j: Int): Column = element_at(pool,
      (((id * (j + 3) + j) % cjkPool.size) + 1).cast(IntegerType))
    concat(pick(0), pick(1), lit("购物车"), pick(2), pick(3), pick(4))
  }

  /** The identical sentence in DuckDB SQL (1-based array indexing). */
  private def sqlCjkText: String = {
    val arr = cjkPool.map(w => s"'$w'").mkString("([", ", ", "])")
    def pick(j: Int) =
      s"$arr[((doc_id * ${j + 3} + $j) % ${cjkPool.size}) + 1]"
    Seq(pick(0), pick(1), "'购物车'", pick(2), pick(3), pick(4))
      .mkString(" || ")
  }

  /** The segmenter's dictionary as SQL VALUES rows (sorted: Set order
    * is not a contract).
    */
  private def sqlCjkDict: String =
    graft.functions.CjkSegmenter.defaultDict.toSeq.sorted
      .map(w => s"('$w')").mkString(", ")

  /** SQL token-set expression mirroring TextFunctions.tokenSet. */
  private[queries] val sqlTokenSet =
    "list_distinct(list_filter(string_split(lower(text),' '), x -> len(x) > 0))"
  private[queries] val sqlNTokens =
    "len(list_filter(string_split(text,' '), x -> len(x) > 0))"

  private[queries] def sqlProfile(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** The t55 synthesized-HTML CTE chain (`${p}b`, `${p}h`) over any
    * (doc_id, text) source — mirrors `Html.withHtmlPayload` verbatim.
    * CTE names take prefix `p` so the chain embeds in larger WITHs
    * (the t11d stage-0 composition) without name collisions.
    */
  private[queries] def sqlHtmlCtes(from: String, p: String = ""): String =
    s"""${p}b AS (
       |  SELECT doc_id, text,
       |    CASE WHEN doc_id % 13 = 0 THEN ''
       |         ELSE '<p>Q&amp;A &lt;doc&gt; ' || text || '</p>' END AS body
       |  FROM ($from)),
       |${p}h AS (
       |  SELECT doc_id,
       |    '<html><head><title>Doc ' || doc_id ||
       |    '</title><style>body { margin: 0; }</style>' ||
       |    '<script>var x = 1;</script></head><body>' ||
       |    '<div class="nav">Home &amp; About</div>' ||
       |    CASE WHEN doc_id % 5 = 0
       |      THEN '<script type="text/javascript">' ||
       |           'if (a < b && b > c) { run(); }</script>'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN '<div><div class="inner">' || body || '</div></div>'
       |      ELSE body END ||
       |    '<!-- id: ' || doc_id || ' --></body></html>' AS html
       |  FROM ${p}b)""".stripMargin

  /** The 6-rule strip chain (`Html.extractText`) over an html-typed
    * SQL expression; `main = true` prepends the title/nav boilerplate
    * strips (`Html.extractMainText`). RE2 'g' everywhere — Spark's
    * regexp_replace replaces all matches by default.
    */
  private[queries] def sqlHtmlExtract(h: String,
                                      main: Boolean = false): String = {
    val base = if (!main) h else
      s"""regexp_replace(
         |      regexp_replace($h,
         |        '(?s)<title[^>]*>.*?</title>', ' ', 'g'),
         |      '(?s)<div class="nav"[^>]*>.*?</div>', ' ', 'g')""".stripMargin
    s"""trim(regexp_replace(
       |      replace(replace(replace(replace(replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(
       |              regexp_replace($base,
       |                '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |              '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
       |            '(?s)<!--.*?-->', ' ', 'g'),
       |          '<[^>]*>', ' ', 'g'),
       |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |        '&#39;', ''''), '&amp;', '&'),
       |      '[ \t\n\r]+', ' ', 'g'))""".stripMargin
  }

  /** The t56 URL CTE chain (`${p}u/n/k/c`) over any doc_id source —
    * mirrors `Urls.withUrlPayload` + `Urls.canonicalUrl` /
    * `registrableDomain`. `${p}c` carries (doc_id, url, canon_url,
    * domain).
    */
  /** The t57 multi-label-TLD payload (mirrors
    * `Urls.withIntlUrlPayload`'s construction math).
    */
  private[queries] val sqlIntlUrls: String =
    """SELECT doc_id,
      |    'https://' ||
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN 'shop.Example.CO.UK'
      |      WHEN 1 THEN 'example.com'
      |      WHEN 2 THEN 'a.b.example.kobe.jp'
      |      WHEN 3 THEN 'city.kobe.jp'
      |      WHEN 4 THEN 'media.github.io'
      |      WHEN 5 THEN 'weird.unknowntld'
      |      WHEN 6 THEN 'uk'
      |      ELSE 'x.www.ck' END ||
      |    '/p/' || CAST(doc_id % 5 AS VARCHAR) AS url
      |  FROM documents""".stripMargin

  /** PSL registrable-domain CTE chain over a source CTE `src` with
    * (doc_id, url): mirrors `Urls.registrableDomainPsl` — candidate
    * trailing-label suffixes (plain + '*.'-wildcardized), the
    * `Urls.pslRules` VALUES table, the (exception, label-count)
    * prevailing pick, the implicit `*` fallback. Ends with a CTE
    * `psl`: (doc_id, url, host, public_suffix, registrable).
    */
  private[queries] def sqlPslCtes(src: String): String =
    """l AS (
      |  SELECT doc_id, url, host, string_split(host, '.') AS labels,
      |    len(string_split(host, '.')) AS n
      |  FROM (
      |    SELECT doc_id, url,
      |      lower(regexp_extract(url, '^[A-Za-z]+://([^/?#:]*)', 1))
      |        AS host
      |    FROM SRC)),
      |cand AS (
      |  SELECT doc_id, i AS nl,
      |    array_to_string(labels[n - i + 1:], '.') AS cand
      |  FROM l CROSS JOIN range(1, 6) r(i) WHERE i <= n
      |  UNION ALL
      |  SELECT doc_id, i AS nl,
      |    '*.' || array_to_string(labels[n - i + 2:], '.') AS cand
      |  FROM l CROSS JOIN range(2, 6) r(i) WHERE i <= n),
      |rules(rule, is_exception) AS (SELECT * FROM (VALUES
      |  ('com', false), ('org', false), ('net', false), ('io', false),
      |  ('jp', false), ('uk', false), ('co.uk', false),
      |  ('gov.uk', false), ('github.io', false), ('*.kobe.jp', false),
      |  ('city.kobe.jp', true), ('*.ck', false), ('www.ck', true))),
      |prev AS (
      |  SELECT doc_id,
      |    CASE WHEN exc = 1 THEN nl - 1 ELSE nl END AS ps_nl
      |  FROM (
      |    SELECT doc_id, CAST(is_exception AS INT) AS exc, nl,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY CAST(is_exception AS INT) DESC, nl DESC) AS rk
      |    FROM cand JOIN rules ON cand = rule)
      |  WHERE rk = 1),
      |psl AS (
      |  SELECT l.doc_id, l.url, l.host,
      |    array_to_string(l.labels[l.n - COALESCE(p.ps_nl, 1) + 1:], '.')
      |      AS public_suffix,
      |    CASE WHEN l.n > COALESCE(p.ps_nl, 1)
      |      THEN array_to_string(l.labels[l.n - COALESCE(p.ps_nl, 1):], '.')
      |    END AS registrable
      |  FROM l LEFT JOIN prev p ON p.doc_id = l.doc_id)"""
      .stripMargin.replace("SRC", src)

  /** The bucket-keyed host SQL — mirrors `Urls.hostOf`; shared by
    * [[sqlPageCore]] and the t61 anchor-text construction.
    */
  private def sqlHostOf(b: String): String =
    s"""CASE CAST(($b) % 4 AS INT)
       |      WHEN 0 THEN 'Example.COM'
       |      WHEN 1 THEN 'news.example.com'
       |      WHEN 2 THEN 'cdn.example.org'
       |      ELSE 'blog.sample.net' END""".stripMargin

  /** The bucket-keyed page-identity SQL (host || port || path || real
    * query) over a bucket expression — mirrors `Urls.hostOf/portOf/
    * pathQOf`, shared by the t56 payload and the t59 link hrefs.
    */
  private def sqlPageCore(b: String): String =
    s"""${sqlHostOf(b)} ||
       |    CASE WHEN ($b) % 5 = 0 THEN ':443' ELSE ':8080' END ||
       |    '/docs/article-' || CAST($b AS VARCHAR) ||
       |    '?page=' || CAST(($b) % 7 AS VARCHAR)""".stripMargin

  private[queries] def sqlUrlCtes(from: String, p: String = ""): String =
    s"""${p}u AS (
       |  SELECT doc_id,
       |    'https://' ||
       |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
       |         WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END ||
       |    ${sqlPageCore("doc_id // 3")} ||
       |    CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&gclid=x'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END AS url
       |  FROM ($from)),
       |${sqlCanonCtes(p)}""".stripMargin

  /** URL canonicalization CTE chain (t56's rules 1–6) over an
    * existing CTE `${p}u` with (doc_id, url) → `${p}c`:
    * (doc_id, url, canon_url, domain).
    */
  private[queries] def sqlCanonCtes(p: String = ""): String =
    s"""${p}n AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    regexp_replace(lower(
       |      regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)),
       |      '^www\\.', '') AS h0,
       |    regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS p0,
       |    regexp_extract(url, '\\?([^#]*)', 1) AS q0
       |  FROM ${p}u),
       |${p}k AS (
       |  SELECT *, array_to_string(list_filter(string_split(q0, '&'),
       |    p -> len(p) > 0 AND
       |         NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')),
       |    '&') AS kept
       |  FROM ${p}n),
       |${p}c AS (
       |  SELECT doc_id, url,
       |    scheme || '://' ||
       |    CASE WHEN scheme = 'https' AND regexp_matches(h0, ':443$$')
       |           THEN regexp_replace(h0, ':443$$', '')
       |         WHEN scheme = 'http' AND regexp_matches(h0, ':80$$')
       |           THEN regexp_replace(h0, ':80$$', '')
       |         ELSE h0 END ||
       |    CASE WHEN length(p0) = 0 THEN '/' ELSE p0 END ||
       |    CASE WHEN length(kept) > 0 THEN '?' || kept ELSE '' END
       |      AS canon_url,
       |    regexp_extract(lower(
       |      regexp_extract(url, '^[A-Za-z]+://([^/?#:]*)', 1)),
       |      '([^.]+\\.[^.]+)$$', 1) AS domain
       |  FROM ${p}k)""".stripMargin

  /** robots.txt fixture replay: the VALUES literal, line
    * classification (`rcl` keeps EVERY classified line — `Sitemap:`
    * records included), RFC group formation over the known-kind rows
    * only, rule rows, and the `agent`-resolved effective set `reff`
    * (exact group beats `*`). Shared by t60's gate and t64's
    * discovery frontier.
    */
  private def sqlRobotsCtes(agent: String): String = {
    val rb = graft.operators.Robots.fixtureRows.map { case (h, txt) =>
      val lits = txt.split("\n")
        .map(l => "'" + l.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
      s"('$h', $lits)"
    }.mkString(",\n  ")
    s"""rb(host, txt) AS (SELECT * FROM (VALUES
       |  $rb)),
       |rlns AS (
       |  SELECT host, unnest(range(1, len(ls) + 1)) AS ln, ls
       |  FROM (SELECT host, string_split(txt, chr(10)) AS ls FROM rb)),
       |rcl AS (
       |  SELECT host, ln,
       |    lower(regexp_extract(ls[ln], '^\\s*([A-Za-z-]+)\\s*:', 1))
       |      AS kind,
       |    trim(regexp_extract(ls[ln], '^[^:]*:(.*)$$', 1)) AS value
       |  FROM rlns),
       |rf AS (SELECT * FROM rcl
       |  WHERE kind IN ('user-agent', 'allow', 'disallow')),
       |rg AS (
       |  SELECT *, SUM(CASE WHEN kind = 'user-agent' AND
       |      (prev IS NULL OR prev <> 'user-agent') THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY host ORDER BY ln
       |          ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM (SELECT *, LAG(kind)
       |    OVER (PARTITION BY host ORDER BY ln) AS prev FROM rf)),
       |rag AS (
       |  SELECT host, grp, lower(value) AS agent FROM rg
       |  WHERE kind = 'user-agent'),
       |rru AS (
       |  SELECT host, grp, kind AS rule_type, value AS path FROM rg
       |  WHERE kind <> 'user-agent' AND len(value) > 0),
       |rrules AS (
       |  SELECT lower(r.host) AS host, a.agent, r.rule_type, r.path
       |  FROM rag a JOIN rru r ON r.host = a.host AND r.grp = a.grp),
       |rex AS (SELECT * FROM rrules WHERE agent = '$agent'),
       |rst AS (
       |  SELECT * FROM rrules WHERE agent = '*'
       |    AND host NOT IN (SELECT DISTINCT host FROM rex)),
       |reff AS (
       |  SELECT host, rule_type, path FROM rex
       |  UNION ALL
       |  SELECT host, rule_type, path FROM rst)""".stripMargin
  }

  /** The robots gate over `$src`'s ($idCol, $urlCol) against `reff`:
    * `${p}uu` (gid, gurl, host, path) and `${p}mt` (gid,
    * matched_path, matched_type, al) — the same longest-match /
    * Allow-wins / deterministic tie ROW_NUMBER as `applyRobots`'
    * max-struct.
    */
  private def sqlRobotsGateCtes(p: String, src: String, idCol: String,
                                urlCol: String): String =
    s"""${p}uu AS (
       |  SELECT $idCol AS gid, $urlCol AS gurl,
       |    lower(regexp_extract($urlCol,
       |      '^[A-Za-z]+://([^/?#:]*)', 1)) AS host,
       |    CASE WHEN length(p0) = 0 THEN '/' ELSE p0 END AS path
       |  FROM (SELECT *, regexp_extract($urlCol,
       |      '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS p0 FROM $src)),
       |${p}mt AS (
       |  SELECT gid, path AS matched_path, rule_type AS matched_type,
       |    rule_type = 'allow' AS al
       |  FROM (
       |    SELECT u.gid, e.path, e.rule_type,
       |      ROW_NUMBER() OVER (PARTITION BY u.gid
       |        ORDER BY length(e.path) DESC,
       |          CASE WHEN e.rule_type = 'allow' THEN 1 ELSE 0 END DESC,
       |          e.path DESC, e.rule_type DESC) AS rk
       |    FROM ${p}uu u
       |    JOIN reff e ON e.host = u.host
       |      AND starts_with(u.path, e.path))
       |  WHERE rk = 1)""".stripMargin

  /** Sitemap fixture replay: the VALUES literal `${p}sm` plus the
    * parse chain `${p}els`/`${p}fields`/`${p}listed` — the same lazy
    * regexes and &amp; decode as `Sitemaps.parseSitemap`, lid-keyed
    * for the canonicalization chain. Shared by t62 and t64.
    */
  private def sqlSitemapCtes(p: String, smSrc: String): String = {
    s"""${p}els AS (
       |  SELECT host,
       |    unnest(regexp_extract_all(xml, '(?s)<url>.*?</url>', 0))
       |      AS el
       |  FROM $smSrc),
       |${p}fields AS (
       |  SELECT host,
       |    replace(NULLIF(regexp_extract(el,
       |      '(?s)<loc>(.*?)</loc>', 1), ''), '&amp;', '&') AS loc,
       |    NULLIF(regexp_extract(el,
       |      '(?s)<lastmod>(.*?)</lastmod>', 1), '') AS lastmod,
       |    NULLIF(regexp_extract(el,
       |      '(?s)<changefreq>(.*?)</changefreq>', 1), '')
       |      AS changefreq
       |  FROM ${p}els),
       |${p}listed AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY host, loc) AS lid
       |  FROM ${p}fields WHERE loc IS NOT NULL)""".stripMargin
  }

  /** The crawl-delay fixture rows as a VALUES literal for
    * `dfx(host, txt)` — the [[sqlRobotsCtes]] verbatim-bytes
    * discipline applied to [[graft.operators.Robots.delayFixtureRows]].
    */
  private def sqlDelayVals: String =
    graft.operators.Robots.delayFixtureRows.map { case (h, txt) =>
      val lits = txt.split("\n")
        .map(l => "'" + l.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
      s"('$h', $lits)"
    }.mkString(",\n  ")

  /** The sitemap fixture rows as a VALUES literal for `sm(host, xml)`. */
  private def sqlSitemapVals: String =
    graft.operators.Sitemaps.fixtureRows.map { case (h, xml) =>
      val lits = xml.split("\n")
        .map(l => "'" + l.replace("'", "''") + "'")
        .mkString(" || chr(10) || ")
      s"('$h', $lits)"
    }.mkString(",\n  ")

  /** t24/t25 shared mirror: sequential-Poisson priority top-5 per
    * source — the thresholded two-pass variant must produce the
    * IDENTICAL result, so both oracle keys bind to this one SQL.
    */
  private lazy val sqlPrioritySample: String =
  """WITH d AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS w
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT doc_id, source,
        |    CAST(CAST('0x' || substr(md5('p:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE)
        |      / CAST(w AS DOUBLE) AS pr
        |  FROM d WHERE w > 0)
        |SELECT doc_id, source FROM p
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY pr, doc_id) <= 5""".stripMargin

  /** Recursive-CTE replay of [[graft.functions.Bpe]]'s greedy merge
    * loop over the distinct-word vocabulary, from the SAME merges
    * literal: per step, rank every adjacent pair via `list_position`
    * on the rank-ordered pair list (0 = absent → nullif → sentinel),
    * merge the leftmost minimum, recurse while a pair ranks; the
    * terminal token count per word is MIN(len) over the chain. `bt`
    * serves per-doc (n_words, bpe_tokens) via the word-multiplicity
    * join — exactly docTokenCounts' shape.
    */
  /** t52's mirror: BPE TRAINING unrolled to `m` literal SQL stages,
    * including Bpe.train's minCount early stop: each argmax stage is
    * filtered `WHERE pct >= 2`, so an exhausted round yields an empty
    * b-row, the union omits that rank, and the COALESCE(chr(1))
    * sentinel keeps replace() a no-op (chr(1) never occurs in the
    * space-framed state) — state is frozen exactly like the operator's
    * `done` flag. pct is cast to BIGINT (DuckDB SUM returns HUGEINT,
    * which pandas would widen to float64 and break the dtype hash).
    * Stage r: pair counts over state s{r} (double-space seam split →
    * adjacent pairs weighted by word count), argmax b{r} with the
    * (pct DESC, a, b) total tie-break, and the next state via
    * replace() — left-to-right non-overlapping on both engines, i.e.
    * the BPE apply rule. Generated by the same loop shape the Spark
    * side runs, from the same constants. Every stage CTE is
    * MATERIALIZED: DuckDB inlines CTEs by default and each stage
    * references its parent ~3× (state + two argmax scalar
    * subqueries), so the inlined expression tree grows 3^stages —
    * materialization makes the chain linear (0.08 s at sf0.01).
    */
  private lazy val sqlBpeTrain: String = {
    val m = 10
    val stages = (0 until m).map { r =>
      val pair =
        s"""p$r AS MATERIALIZED (
           |  SELECT t[i] AS a, t[i+1] AS b, SUM(ct)::BIGINT AS pct
           |  FROM (SELECT ct, t, unnest(range(1, len(t))) AS i
           |        FROM (SELECT ct, string_split(trim(s), '  ') AS t FROM s$r))
           |  GROUP BY 1, 2),
           |b$r AS MATERIALIZED (SELECT a, b, pct FROM p$r WHERE pct >= 2 ORDER BY pct DESC, a, b LIMIT 1)""".stripMargin
      val next =
        if (r == m - 1) ""
        else
          s""",
             |s${r + 1} AS MATERIALIZED (
             |  SELECT ct, replace(s,
             |    COALESCE((SELECT ' ' || a || '  ' || b || ' ' FROM b$r), chr(1)),
             |    COALESCE((SELECT ' ' || a || b || ' ' FROM b$r), chr(1))) AS s
             |  FROM s$r)""".stripMargin
      pair + next
    }.mkString(",\n")
    val union = (0 until m)
      .map(r => s"SELECT $r AS merge_rank, a AS lhs, b AS rhs, pct AS pair_ct FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""WITH wc AS (
       |  SELECT word, COUNT(*)::BIGINT AS ct FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
       |    FROM documents)
       |  GROUP BY word),
       |s0 AS MATERIALIZED (SELECT ct, regexp_replace(word, '(.)', ' \\1 ', 'g') AS s FROM wc),
       |$stages
       |$union""".stripMargin
  }

  private[queries] lazy val sqlBpeCtes: String = {
    val m = graft.functions.Bpe.sqlMergesList
    s"""tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |  FROM documents),
       |wc AS (
       |  SELECT doc_id, word, COUNT(*) AS ct
       |  FROM (SELECT doc_id, unnest(w) AS word FROM tk) GROUP BY 1, 2),
       |vocab AS (SELECT DISTINCT word FROM wc),
       |bpe(word, toks) AS (
       |  SELECT word, list_transform(range(1, len(word) + 1), i -> word[i:i])
       |  FROM vocab
       |  UNION ALL
       |  SELECT word, toks[1:p-1] || [toks[p] || toks[p+1]] || toks[p+2:len(toks)]
       |  FROM (
       |    SELECT word, toks,
       |      list_position(rk, list_min(rk)) AS p, list_min(rk) AS m
       |    FROM (
       |      SELECT word, toks,
       |        list_transform(range(1, len(toks)), i ->
       |          coalesce(nullif(
       |            list_position($m, toks[i] || '|' || toks[i+1]), 0),
       |            999999)) AS rk
       |      FROM bpe) rr) ss
       |  WHERE m < 999999),
       |wlen AS (SELECT word, MIN(len(toks)) AS n FROM bpe GROUP BY word),
       |bt AS (
       |  SELECT wc.doc_id, SUM(wc.ct) AS n_words,
       |    SUM(wc.ct * wlen.n) AS bpe_tokens
       |  FROM wc JOIN wlen USING (word) GROUP BY wc.doc_id)""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "t1_keyword_stats" ->
      """SELECT keyword, source, COUNT(*) AS ct
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS keyword
        |      FROM documents) t
        |WHERE len(keyword) > 0
        |GROUP BY keyword, source""".stripMargin,

    "t2_lang_id" -> {
      val scores = langProfiles.map { case (l, p) =>
        s"len(list_intersect($sqlTokenSet, ${sqlProfile(p)})) AS s_$l"
      }.mkString(",\n  ")
      val best = langProfiles.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val cases = langProfiles.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("\n  ")
      s"""WITH sc AS (SELECT doc_id, lang, $scores FROM documents),
         |b AS (SELECT *, $best AS best FROM sc)
         |SELECT doc_id,
         |  CASE $cases ELSE 'und' END AS pred_lang,
         |  lang AS labeled_lang
         |FROM b""".stripMargin
    },

    "t3_quality_score" -> {
      val stops = sqlProfile(langProfiles.flatMap(_._2).distinct)
      s"""WITH m AS (
         |  SELECT doc_id,
         |    $sqlNTokens AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_ct,
         |    CAST(len(list_filter(list_filter(string_split(lower(text),' '), x -> len(x) > 0),
         |        w -> list_contains($stops, w))) AS DOUBLE) / nullif($sqlNTokens, 0) AS stop_ratio
         |  FROM documents)
         |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
         |  CAST(punct_ct AS INT) AS punct_ct, stop_ratio,
         |  CASE WHEN n_tokens > 0 THEN
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + least(stop_ratio * 4.0, 1.0) * 0.4
         |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2
         |  END AS quality
         |FROM m""".stripMargin
    },

    // ten unrolled training rounds: each stage re-derives pair counts
    // from the previous state, picks the (pct DESC, a, b) argmax, and
    // applies it with replace() — whose left-to-right non-overlapping
    // scan is exactly the BPE apply rule on both engines
    "t52_bpe_train" -> sqlBpeTrain,

    "t39_bpe_tokens" ->
      s"""WITH RECURSIVE $sqlBpeCtes
         |SELECT d.doc_id,
         |  CAST(COALESCE(bt.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(COALESCE(bt.bpe_tokens, 0) AS BIGINT) AS bpe_tokens
         |FROM documents d LEFT JOIN bt USING (doc_id)""".stripMargin,

    // t15's prefix-budget mirror with the BPE recursive replay as the
    // weight source
    "t40_bpe_domain_mix" ->
      s"""WITH RECURSIVE $sqlBpeCtes,
         |x AS (
         |  SELECT d.doc_id, d.source, COALESCE(bt.bpe_tokens, 0) AS tok,
         |    CAST('0x' || substr(md5('m:' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) AS pr
         |  FROM documents d LEFT JOIN bt USING (doc_id)),
         |p AS (
         |  SELECT doc_id, source,
         |    COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY pr, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_prefix
         |  FROM x)
         |SELECT doc_id, source, CAST(tok_prefix AS BIGINT) AS tok_prefix
         |FROM p
         |WHERE tok_prefix < CASE WHEN source = 'src0' THEN 1800 ELSE 2500 END""".stripMargin,

    "t4_token_count" ->
      s"""SELECT source, COUNT(*) AS doc_ct,
         | CAST(SUM($sqlNTokens) AS BIGINT) AS ws_tokens,
         | CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS re_tokens
         |FROM documents GROUP BY source""".stripMargin,

    "t5_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS fp,
        | md5(text) AS content_hash
        |FROM documents""".stripMargin,

    // hex→int per the portable-hash rule: Spark conv(substr(md5..)) ≡
    // DuckDB CAST('0x'||substr(md5..) AS INT)
    "t7_stable_split" ->
      s"""SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) * 1000 < 900 * 65536
         |  THEN 'train' ELSE 'val' END AS split,
         | COUNT(*) AS doc_ct,
         | CAST(SUM($sqlNTokens) AS BIGINT) AS tok_sum
         |FROM documents GROUP BY 1""".stripMargin,

    // integer threshold (ct*30 > n) — no float boundary; the oracle is
    // the plain exact formulation the 2-pass MG scheme provably equals
    "t8_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS token
        |           FROM documents),
        |t AS (SELECT token FROM w WHERE len(token) > 0),
        |n AS (SELECT COUNT(*) AS n FROM t)
        |SELECT token, COUNT(*) AS ct
        |FROM t, n
        |GROUP BY token, n.n
        |HAVING COUNT(*) * 30 > n.n""".stripMargin,

    // counts exact; lift is the IDENTICAL left-to-right double
    // expression (cxy·N·N / (B·cx·cy)) on both engines, and the tie-
    // break is the bigram's bytewise string order
    // first-occurrence min(doc_id) per distinct lowercase word;
    // integer bin edges ((mx+1)*k)//8 - 1 on both engines
    "t53_vocab_growth" ->
      s"""WITH d AS (
         |  SELECT doc_id AS id, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |mx AS (SELECT MAX(id) AS mx FROM d),
         |edges AS (
         |  SELECT CAST(g.k AS INT) AS bin,
         |    ((mx + 1) * g.k) // 8 - 1 AS id_le
         |  FROM mx CROSS JOIN generate_series(1, 8) AS g(k)),
         |fs AS (
         |  SELECT w, MIN(id) AS first_id FROM (
         |    SELECT id, unnest(list_distinct(list_filter(
         |      string_split(lower(text), ' '), x -> len(x) > 0))) AS w
         |    FROM d) GROUP BY w),
         |tc AS (
         |  SELECT e.bin, COUNT(*) AS docs_cum,
         |    CAST(SUM($sqlNTokens) AS BIGINT) AS tokens_cum
         |  FROM edges e JOIN d ON d.id <= e.id_le GROUP BY 1),
         |vc AS (
         |  SELECT e.bin, COUNT(*) AS vocab_cum
         |  FROM edges e JOIN fs ON fs.first_id <= e.id_le GROUP BY 1)
         |SELECT e.bin, e.id_le,
         |  COALESCE(tc.docs_cum, 0) AS docs_cum,
         |  COALESCE(tc.tokens_cum, 0) AS tokens_cum,
         |  COALESCE(vc.vocab_cum, 0) AS vocab_cum
         |FROM edges e
         |LEFT JOIN tc ON tc.bin = e.bin
         |LEFT JOIN vc ON vc.bin = e.bin""".stripMargin,

    "t27_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |uc AS (
        |  SELECT w0 AS w, COUNT(*) AS c FROM (
        |    SELECT unnest(w) AS w0 FROM toks)
        |  GROUP BY 1),
        |bc AS (
        |  SELECT b['w1'] AS w1, b['w2'] AS w2, COUNT(*) AS cxy FROM (
        |    SELECT unnest(list_transform(range(len(w) - 1),
        |      i -> struct_pack(w1 := w[i+1], w2 := w[i+2]))) AS b
        |    FROM toks WHERE len(w) >= 2)
        |  GROUP BY 1, 2),
        |tot AS (SELECT (SELECT SUM(c) FROM uc) AS n_tok,
        |               (SELECT SUM(cxy) FROM bc) AS n_bi)
        |SELECT w1, w2, cxy, cx, cy,
        |  CAST(cxy AS DOUBLE) * n_tok * n_tok
        |    / (CAST(n_bi AS DOUBLE) * cx * cy) AS lift
        |FROM bc
        |JOIN (SELECT w AS w1, c AS cx FROM uc) USING (w1)
        |JOIN (SELECT w AS w2, c AS cy FROM uc) USING (w2)
        |CROSS JOIN tot
        |WHERE cxy >= 5
        |ORDER BY lift DESC, w1, w2
        |LIMIT 50""".stripMargin,

    // integer threshold per window (ct*50 > n_window); the oracle is
    // the exact per-window formulation the windowed 2-pass MG scheme
    // provably equals (no-false-negative retention at num/den >= 1/(k+1))
    "t23_windowed_hh" ->
      """WITH e AS (
        |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS window_start,
        |    CAST(user_id AS VARCHAR) AS user_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |n AS (SELECT window_start, COUNT(*) AS n FROM e GROUP BY window_start)
        |SELECT e.window_start, e.user_id, COUNT(*) AS ct
        |FROM e JOIN n USING (window_start)
        |GROUP BY e.window_start, e.user_id, n.n
        |HAVING COUNT(*) * 50 > n.n""".stripMargin,

    // priority = 48-bit salted-md5 uniform / token count — u is exact
    // in both BIGINT and DOUBLE, the division is the identical IEEE op,
    // so the per-source top-5 agrees bit-for-bit
    "t24_weighted_sample" -> sqlPrioritySample,

    // identical mirror to t24 by design: the two-pass sampler's
    // contract is bit-equality with the one-pass rank
    // identical mirror to t24 BY CONSTRUCTION: one shared binding,
    // so the "two-pass ≡ one-pass" contract can never certify
    // against a stale copy
    "t25_weighted_sample_2p" -> sqlPrioritySample,

    "t9_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) * 10000
        |    < (CASE WHEN lang = 'en' THEN 2000
        |            WHEN lang = 'zh' THEN 5000
        |            ELSE 8000 END) * 65536""".stripMargin,

    // chunk = exclusive prefix sum of token counts DIV budget, in
    // doc_id order (// is DuckDB integer floor division; both operands
    // non-negative, matching Spark's DIV)
    "t10_pack_chunks" ->
      s"""WITH x AS (
         |  SELECT doc_id, COALESCE($sqlNTokens, 0) AS tok FROM documents),
         |p AS (
         |  SELECT doc_id, tok,
         |    COALESCE(SUM(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM x)
         |SELECT CAST(pre // 2048 AS BIGINT) AS chunk_id, COUNT(*) AS doc_ct,
         |  CAST(SUM(tok) AS BIGINT) AS tok_sum
         |FROM p GROUP BY 1""".stripMargin,

    // rank ties (cf DESC, term ASC) mirror the Spark TakeOrdered key
    "t22_head_coverage" ->
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS term
         |  FROM documents),
         |tf AS (SELECT term, COUNT(*) AS cf FROM toks GROUP BY term),
         |tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total FROM tf),
         |r AS (
         |  SELECT cf, ROW_NUMBER() OVER (ORDER BY cf DESC, term) AS rnk
         |  FROM tf)
         |SELECT k.top_k,
         |  CAST(SUM(CASE WHEN rnk <= k.top_k THEN cf ELSE 0 END) AS BIGINT) AS head_mass,
         |  tot.total,
         |  CAST(SUM(CASE WHEN rnk <= k.top_k THEN cf ELSE 0 END) AS DOUBLE)
         |    / CAST(tot.total AS DOUBLE) AS coverage
         |FROM r CROSS JOIN (VALUES (5), (10), (100)) k(top_k) CROSS JOIN tot
         |GROUP BY k.top_k, tot.total""".stripMargin,

    // chunk count = 1 + ceil((n-32)/24) for n > 32 (integer ceil-div,
    // non-negative operands, so // ≡ Spark DIV); slices are 1-based
    // inclusive on both engines
    "t20_chunk_rag" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text,' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 1),
        |c AS (
        |  SELECT doc_id, w, n,
        |    unnest(range(CASE WHEN n <= 32 THEN 1
        |                 ELSE 1 + (n - 32 + 23) // 24 END)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  list_aggregate(w[chunk_idx*24 + 1 : chunk_idx*24 + 32],
        |    'string_agg', ' ') AS chunk_text,
        |  CAST(least(32, n - chunk_idx*24) AS INT) AS n_tokens
        |FROM c""".stripMargin,

    // top lang per source: ct DESC, lang DESC mirrors Spark's
    // max(struct(ct, lang)) tie rule
    "t19_data_card" ->
      s"""WITH sl AS (
         |  SELECT source, lang, COUNT(*) AS ct,
         |    CAST(SUM($sqlNTokens) AS BIGINT) AS toks
         |  FROM documents GROUP BY source, lang),
         |agg AS (
         |  SELECT source,
         |    CAST(SUM(ct) AS BIGINT) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(toks) AS DOUBLE) / CAST(SUM(ct) AS DOUBLE) AS avg_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_langs
         |  FROM sl GROUP BY source),
         |top AS (
         |  SELECT source, lang AS top_lang, CAST(ct AS BIGINT) AS top_lang_ct
         |  FROM (
         |    SELECT source, lang, ct,
         |      ROW_NUMBER() OVER (PARTITION BY source
         |        ORDER BY ct DESC, lang DESC) AS rnk
         |    FROM sl)
         |  WHERE rnk = 1)
         |SELECT a.source, a.n_docs, a.n_tokens, a.avg_tokens, a.n_langs,
         |  t.top_lang, t.top_lang_ct
         |FROM agg a JOIN top t USING (source)""".stripMargin,

    "t6_corpus_profile" -> {
      val scores = langProfiles.map { case (l, p) =>
        s"len(list_intersect($sqlTokenSet, ${sqlProfile(p)})) AS s_$l"
      }.mkString(",\n  ")
      val best = langProfiles.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val cases = langProfiles.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("\n  ")
      val stops = sqlProfile(langProfiles.flatMap(_._2).distinct)
      s"""WITH sc AS (SELECT text, $scores FROM documents),
         |b AS (SELECT *, $best AS best FROM sc),
         |m AS (
         |  SELECT CASE $cases ELSE 'und' END AS pred_lang,
         |    $sqlNTokens AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_ct,
         |    CAST(len(list_filter(list_filter(string_split(lower(text),' '), x -> len(x) > 0),
         |        w -> list_contains($stops, w))) AS DOUBLE) / nullif($sqlNTokens, 0) AS stop_ratio
         |  FROM b)
         |SELECT pred_lang, COUNT(*) AS doc_ct,
         |  quantile_cont(n_tokens, 0.25) AS tok_p25,
         |  quantile_cont(n_tokens, 0.5) AS tok_p50,
         |  quantile_cont(n_tokens, 0.75) AS tok_p75,
         |  MIN(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |    + least(stop_ratio * 4.0, 1.0) * 0.4
         |    + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2) AS min_q,
         |  MAX(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |    + least(stop_ratio * 4.0, 1.0) * 0.4
         |    + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2) AS max_q
         |FROM m GROUP BY pred_lang""".stripMargin
    },

    "t30_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '),
        |      x -> len(x) > 0)) AS term
        |  FROM documents),
        |c AS (SELECT term, COUNT(*) AS ct FROM tok GROUP BY 1),
        |t AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tok FROM c)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(length(bin(n_tok // ct)) - 1) AS BIGINT) AS bits_sum,
        |  CAST(SUM(length(bin(n_tok // ct)) - 1) AS DOUBLE) / COUNT(*)
        |    AS avg_surprisal
        |FROM tok JOIN c USING (term) CROSS JOIN t
        |GROUP BY doc_id""".stripMargin,

    // conditional mirror: cx // cxy for tokens with a predecessor,
    // n_tok // ct for each doc's first token
    // t43's machinery + a third gram level, counts restricted to the
    // t7 train split, CASE ladder = the exact backoff rule (trigram →
    // bigram +1 → unigram +2 → OOV ceiling +levels)
    "t54_backoff_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
        |      * 1000 < 900 * 65536 AS is_train,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, is_train, unnest(range(1, len(w) + 1)) AS i, w
        |  FROM w WHERE len(w) >= 1),
        |tr AS (
        |  SELECT doc_id, is_train, w[CAST(i AS INT)] AS term,
        |    CASE WHEN i > 1 THEN w[CAST(i - 1 AS INT)] END AS prev,
        |    CASE WHEN i > 2 THEN w[CAST(i - 2 AS INT)] END AS prev2
        |  FROM tok),
        |c1 AS (SELECT term, COUNT(*) AS c FROM tr WHERE is_train GROUP BY 1),
        |c2 AS (
        |  SELECT prev, term, COUNT(*) AS c FROM tr
        |  WHERE is_train AND prev IS NOT NULL GROUP BY 1, 2),
        |c3 AS (
        |  SELECT prev2, prev, term, COUNT(*) AS c FROM tr
        |  WHERE is_train AND prev2 IS NOT NULL GROUP BY 1, 2, 3),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM c1),
        |sc AS (
        |  SELECT tr.doc_id, tr.is_train,
        |    CASE
        |      WHEN tr.prev2 IS NOT NULL AND g3.c IS NOT NULL
        |        THEN length(bin(x2.c // g3.c)) - 1
        |      WHEN tr.prev IS NOT NULL AND g2.c IS NOT NULL
        |        THEN length(bin(p1.c // g2.c)) - 1
        |             + CASE WHEN tr.prev2 IS NOT NULL THEN 1 ELSE 0 END
        |      WHEN u.c IS NOT NULL
        |        THEN length(bin(t.n_tok // u.c)) - 1
        |             + CASE WHEN tr.prev2 IS NOT NULL THEN 2
        |                    WHEN tr.prev IS NOT NULL THEN 1 ELSE 0 END
        |      ELSE length(bin(t.n_tok)) - 1
        |           + CASE WHEN tr.prev2 IS NOT NULL THEN 2
        |                  WHEN tr.prev IS NOT NULL THEN 1 ELSE 0 END
        |    END AS bits,
        |    CASE WHEN u.c IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tr
        |  LEFT JOIN c1 u ON u.term = tr.term
        |  LEFT JOIN c1 p1 ON p1.term = tr.prev
        |  LEFT JOIN c2 g2 ON g2.prev = tr.prev AND g2.term = tr.term
        |  LEFT JOIN c2 x2 ON x2.prev = tr.prev2 AND x2.term = tr.prev
        |  LEFT JOIN c3 g3 ON g3.prev2 = tr.prev2 AND g3.prev = tr.prev
        |    AND g3.term = tr.term
        |  CROSS JOIN t)
        |SELECT doc_id, is_train, COUNT(*) AS n_tokens,
        |  CAST(SUM(bits) AS BIGINT) AS bits_sum,
        |  CAST(SUM(oov) AS BIGINT) AS oov_ct,
        |  CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS avg_surprisal
        |FROM sc GROUP BY 1, 2""".stripMargin,

    // construction replayed verbatim (pure string math on (id, text)),
    // then the same 6 strip rules in RE2 ('g' = all matches, matching
    // Spark's replace-all default; the whitespace class is explicit —
    // Java's \s and RE2's \s disagree on \x0B); entity decode order
    // identical (&amp; last); lengths are code-point counts in both
    // engines and the ratio divides the same exact integers
    "t55_html_extract" ->
      s"""WITH ${sqlHtmlCtes("SELECT doc_id, text FROM documents")},
        |x AS (
        |  SELECT doc_id, html,
        |    ${sqlHtmlExtract("html")} AS extracted
        |  FROM h)
        |SELECT doc_id, extracted,
        |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT)
        |    AS n_tags,
        |  CAST(length(html) AS BIGINT) AS html_len,
        |  CAST(length(extracted) AS BIGINT) AS text_len,
        |  CAST(length(extracted) AS DOUBLE) /
        |    CAST(length(html) AS DOUBLE) AS markup_ratio
        |FROM x""".stripMargin,

    // construction replayed (pure string math on the id), then the
    // same 6 canonicalization rules in RE2; keeper = MIN(doc_id)
    // per canonical group — both engines window on the same string
    "t56_url_dedup" ->
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")}
        |SELECT doc_id, url, canon_url, domain,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY canon_url) AS keeper
        |FROM c""".stripMargin,

    // PSL replay: the same payload construction, candidate-suffix
    // generation (plain + '*.'-wildcardized forms), rule VALUES table,
    // and (exception, label-count) prevailing pick as the Spark side
    "t57_registrable_domain" ->
      s"""WITH u AS ($sqlIntlUrls),
        |${sqlPslCtes("u")}
        |SELECT doc_id, url, host, public_suffix, registrable
        |FROM psl""".stripMargin,

    // robots replay: the fixture rows verbatim (chr(10)-joined), the
    // same line classification, LAG-based group formation, two-tier
    // agent resolution, and the same (length, allow, path) prevailing
    // order over the t56 canonical URLs
    "t60_robots_gate" -> {
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |${sqlRobotsCtes("crawler-x")},
         |cu AS (SELECT doc_id, canon_url FROM c),
         |${sqlRobotsGateCtes("", "cu", "doc_id", "canon_url")}
         |SELECT u.gid AS doc_id, u.gurl AS url, u.host,
         |  m.matched_path, m.matched_type,
         |  COALESCE(m.al, TRUE) AS allowed
         |FROM uu u LEFT JOIN mt m ON m.gid = u.gid""".stripMargin
    },

    // link-graph replay: own URLs + the two bucket-keyed hrefs, both
    // through the shared canonicalization chain (prefixes '', 'l'),
    // distinct edges, then the d13 integer-pagerank rounds (exact //
    // arithmetic — bit-identical across engines) over STRING nodes
    "t59_link_graph" -> {
      val total = graft.operators.Graph.TotalMass
      val iters = (1 to 3).map { k =>
        s"""c$k AS (
           |  SELECT e.dst, SUM(r.r // od.deg) AS m
           |  FROM edges e
           |  JOIN r${k - 1} r ON r.node = e.src
           |  JOIN od ON od.src = e.src
           |  GROUP BY e.dst),
           |r$k AS (
           |  SELECT node,
           |    (($total // 100) * 15) // n
           |      + (85 * COALESCE(m, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN c$k ON c$k.dst = nodes.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |lu AS (
         |  SELECT doc_id,
         |    'https://www.' || ${sqlPageCore("(doc_id * 7 + 1) % 97")} ||
         |    '&utm_source=link' AS url
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id,
         |    'https://' || ${sqlPageCore("(doc_id * 13 + 5) % 97")} ||
         |    '#ref' AS url
         |  FROM documents),
         |${sqlCanonCtes("l")},
         |edges AS (
         |  SELECT DISTINCT c.canon_url AS src, lc.canon_url AS dst
         |  FROM c JOIN lc ON lc.doc_id = c.doc_id
         |  WHERE c.canon_url <> lc.canon_url),
         |nodes AS (
         |  SELECT src AS node FROM edges
         |  UNION
         |  SELECT dst FROM edges),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |od AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT node, $total // n AS r FROM nodes CROSS JOIN nn),
         |$iters
         |SELECT node, CAST(r AS BIGINT) AS rank_units,
         |  CAST(r AS DOUBLE) / ${total.toDouble} AS rank
         |FROM r3""".stripMargin
    },

    // sitemap replay: the fixture bytes render verbatim (the robots
    // discipline — both engines parse the same bytes), url blocks and
    // fields split with the same lazy regexes, locs run the shared
    // canonicalization chain keyed by a deterministic row number, the
    // crawled set is t56's canonical payload, and the fetch rank is
    // the same (crawled, lastmod desc, loc) window
    "t62_sitemap_audit" -> {
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |crawled AS (SELECT DISTINCT canon_url FROM c),
         |sm(host, xml) AS (SELECT * FROM (VALUES
         |  $sqlSitemapVals)),
         |${sqlSitemapCtes("", "sm")},
         |lmu AS (SELECT lid AS doc_id, loc AS url FROM listed),
         |${sqlCanonCtes("lm")}
         |SELECT l.host, l.loc, cc.canon_url AS canon_loc, l.lastmod,
         |  l.changefreq,
         |  cr.canon_url IS NOT NULL AS crawled,
         |  ROW_NUMBER() OVER (PARTITION BY l.host
         |    ORDER BY (cr.canon_url IS NOT NULL) ASC,
         |      COALESCE(l.lastmod, '0000-00-00') DESC, l.loc ASC)
         |    AS fetch_rank
         |FROM listed l
         |JOIN lmc cc ON cc.doc_id = l.lid
         |LEFT JOIN crawled cr ON cr.canon_url = cc.canon_url""".stripMargin
    },

    // line-dedup replay: the page payload constructs IDENTICALLY
    // (host header/footer, nav, 8-word content chunks — the d10
    // slicing shape, the page-bucket line), lines index via the
    // range-unnest pattern, document frequency is the same
    // doc-distinct-then-count, and the rebuild is an idx-ordered
    // string_agg skipping flagged lines (sums cast to BIGINT per the
    // HUGEINT discipline)
    "t63_line_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'home | about | contact | ' || ${sqlHostOf("doc_id")}
         |    || chr(10) ||
         |    'section ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
         |    array_to_string(list_transform(
         |      range(0, CAST(ceil(
         |        len(string_split(text, ' ')) / 8.0) AS BIGINT)),
         |      j -> array_to_string((string_split(text, ' '))
         |        [CAST(j*8+1 AS INT) : CAST(j*8+8 AS INT)], ' ')),
         |      chr(10)) || chr(10) ||
         |    'page ' || CAST(doc_id // 3 AS VARCHAR) || chr(10) ||
         |    'copyright 2024 ' || ${sqlHostOf("doc_id")} AS page_text
         |  FROM documents WHERE text IS NOT NULL),
         |l AS (
         |  SELECT doc_id, unnest(range(0, len(ls))) AS idx, ls
         |  FROM (SELECT doc_id,
         |          string_split(page_text, chr(10)) AS ls FROM u)),
         |lx AS (
         |  SELECT doc_id, idx, ls[CAST(idx + 1 AS INT)] AS line FROM l),
         |f AS (
         |  SELECT line FROM (SELECT DISTINCT line, doc_id FROM lx)
         |  GROUP BY line HAVING count(*) >= 4)
         |SELECT lx.doc_id,
         |  COALESCE(string_agg(CASE WHEN f.line IS NULL THEN lx.line END,
         |    chr(10) ORDER BY lx.idx), '') AS clean_text,
         |  count(*) AS n_lines,
         |  CAST(SUM(CASE WHEN f.line IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  CAST(SUM(CASE WHEN f.line IS NOT NULL THEN len(lx.line)
         |    ELSE 0 END) AS BIGINT) AS chars_removed
         |FROM lx LEFT JOIN f ON f.line = lx.line
         |GROUP BY lx.doc_id""".stripMargin,

    // discovery-loop replay: the robots VALUES drive BOTH halves —
    // `rcl`'s sitemap records pick the advertised sitemap files, the
    // shared parse + canonicalization chains list and key the locs,
    // the crawled set prunes to the frontier, and the shared gate
    // CTEs prune disallowed locs before the freshness rank
    "t64_discovery_frontier" -> {
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |crawled AS (SELECT DISTINCT canon_url FROM c),
         |${sqlRobotsCtes("crawler-x")},
         |sd AS (
         |  SELECT DISTINCT lower(regexp_extract(value,
         |    '^[A-Za-z]+://([^/?#:]*)', 1)) AS host
         |  FROM rcl WHERE kind = 'sitemap' AND len(value) > 0),
         |sm(host, xml) AS (SELECT * FROM (VALUES
         |  $sqlSitemapVals)),
         |smd AS (SELECT * FROM sm WHERE host IN (SELECT host FROM sd)),
         |${sqlSitemapCtes("", "smd")},
         |lmu AS (SELECT lid AS doc_id, loc AS url FROM listed),
         |${sqlCanonCtes("lm")},
         |unc AS (
         |  SELECT l.host, l.loc, cc.canon_url AS canon_loc, l.lastmod
         |  FROM listed l
         |  JOIN lmc cc ON cc.doc_id = l.lid
         |  LEFT JOIN crawled cr ON cr.canon_url = cc.canon_url
         |  WHERE cr.canon_url IS NULL),
         |${sqlRobotsGateCtes("g", "unc", "loc", "loc")}
         |SELECT u.host, u.loc, u.canon_loc, u.lastmod,
         |  ROW_NUMBER() OVER (PARTITION BY u.host
         |    ORDER BY COALESCE(u.lastmod, '0000-00-00') DESC,
         |      u.loc ASC) AS fetch_order
         |FROM unc u
         |LEFT JOIN gmt m ON m.gid = u.loc
         |WHERE COALESCE(m.al, TRUE)""".stripMargin
    },

    // refetch replay: same listed/canon/crawled chain, the freq
    // table as VALUES, day-count*86400 epoch arithmetic (no timezone
    // anywhere in the chain), same due CASE order and rank window
    "t65_refetch_schedule" -> {
      val asOfS = java.time.LocalDate.parse("2024-02-20")
        .toEpochDay * 86400L
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |crawled AS (SELECT DISTINCT canon_url FROM c),
         |sm(host, xml) AS (SELECT * FROM (VALUES
         |  $sqlSitemapVals)),
         |${sqlSitemapCtes("", "sm")},
         |lmu AS (SELECT lid AS doc_id, loc AS url FROM listed),
         |${sqlCanonCtes("lm")},
         |sched AS (
         |  SELECT l.host, l.loc, cc.canon_url AS canon_loc,
         |    l.lastmod,
         |    CASE WHEN l.changefreq IN ('always', 'daily', 'hourly',
         |        'monthly', 'never', 'weekly', 'yearly')
         |      THEN l.changefreq ELSE 'monthly' END AS eff_freq
         |  FROM listed l
         |  JOIN lmc cc ON cc.doc_id = l.lid
         |  JOIN crawled cr ON cr.canon_url = cc.canon_url),
         |fs(freq, s) AS (SELECT * FROM (VALUES
         |  ('always', 0), ('hourly', 3600), ('daily', 86400),
         |  ('weekly', 604800), ('monthly', 2592000),
         |  ('yearly', 31536000))),
         |nd AS (
         |  SELECT host, loc, canon_loc, lastmod, eff_freq,
         |    CASE WHEN lastmod IS NOT NULL AND f.s IS NOT NULL THEN
         |      CAST(date_diff('day', DATE '1970-01-01',
         |        CAST(lastmod AS DATE)) * 86400 + f.s AS BIGINT)
         |    END AS next_due_s
         |  FROM sched LEFT JOIN fs f ON f.freq = eff_freq),
         |d AS (
         |  SELECT *, CASE WHEN eff_freq = 'never' THEN FALSE
         |    WHEN lastmod IS NULL THEN TRUE
         |    ELSE next_due_s <= $asOfS END AS due
         |  FROM nd)
         |SELECT host, loc, canon_loc, lastmod, eff_freq, next_due_s,
         |  due,
         |  ROW_NUMBER() OVER (PARTITION BY host
         |    ORDER BY due DESC,
         |      COALESCE(next_due_s, ${Long.MinValue}) ASC, loc ASC)
         |    AS refetch_rank
         |FROM d""".stripMargin
    },

    // politeness replay: the delay fixture bytes render verbatim
    // (the robots discipline), crawl-delay lines parse with the same
    // line regexes and agent-run grouping over the (user-agent,
    // crawl-delay) sequence, numeric-only values, exact agent over
    // `*`, MAX per host; the audit chain is t62's, and the schedule
    // is pure arithmetic on the rank
    "t67_politeness" ->
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
         |crawled AS (SELECT DISTINCT canon_url FROM c),
         |sm(host, xml) AS (SELECT * FROM (VALUES
         |  $sqlSitemapVals)),
         |${sqlSitemapCtes("", "sm")},
         |lmu AS (SELECT lid AS doc_id, loc AS url FROM listed),
         |${sqlCanonCtes("lm")},
         |aud AS (
         |  SELECT l.host, l.loc,
         |    cr.canon_url IS NOT NULL AS crawled,
         |    ROW_NUMBER() OVER (PARTITION BY l.host
         |      ORDER BY (cr.canon_url IS NOT NULL) ASC,
         |        COALESCE(l.lastmod, '0000-00-00') DESC, l.loc ASC)
         |      AS fetch_rank
         |  FROM listed l
         |  JOIN lmc cc ON cc.doc_id = l.lid
         |  LEFT JOIN crawled cr ON cr.canon_url = cc.canon_url),
         |dfx(host, txt) AS (SELECT * FROM (VALUES
         |  $sqlDelayVals)),
         |dlns AS (
         |  SELECT host, unnest(range(1, len(ls) + 1)) AS ln, ls
         |  FROM (SELECT host, string_split(txt, chr(10)) AS ls
         |        FROM dfx)),
         |dcl AS (
         |  SELECT host, ln,
         |    lower(regexp_extract(ls[ln], '^\\s*([A-Za-z-]+)\\s*:', 1))
         |      AS kind,
         |    trim(regexp_extract(ls[ln], '^[^:]*:(.*)$$', 1)) AS value
         |  FROM dlns),
         |df0 AS (SELECT * FROM dcl
         |  WHERE kind IN ('user-agent', 'crawl-delay')),
         |dg AS (
         |  SELECT *, SUM(CASE WHEN kind = 'user-agent' AND
         |      (prev IS NULL OR prev <> 'user-agent') THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY host ORDER BY ln
         |          ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM (SELECT *, LAG(kind)
         |    OVER (PARTITION BY host ORDER BY ln) AS prev FROM df0)),
         |dag AS (
         |  SELECT host, grp, lower(value) AS agent FROM dg
         |  WHERE kind = 'user-agent'),
         |ddl AS (
         |  SELECT host, grp, CAST(value AS DOUBLE) AS delay_s FROM dg
         |  WHERE kind = 'crawl-delay'
         |    AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$$')),
         |drows AS (
         |  SELECT lower(a.host) AS host, a.agent, d.delay_s
         |  FROM dag a JOIN ddl d ON d.host = a.host AND d.grp = a.grp),
         |dex AS (SELECT * FROM drows WHERE agent = 'crawler-x'),
         |dst AS (
         |  SELECT * FROM drows WHERE agent = '*'
         |    AND host NOT IN (SELECT DISTINCT host FROM dex)),
         |dd AS (
         |  SELECT host, MAX(delay_s) AS delay_s
         |  FROM (SELECT host, delay_s FROM dex
         |        UNION ALL SELECT host, delay_s FROM dst)
         |  GROUP BY host)
         |SELECT a.host, a.loc, a.crawled, a.fetch_rank,
         |  COALESCE(dd.delay_s, 5.0) AS delay_s,
         |  CAST(a.fetch_rank - 1 AS DOUBLE) * COALESCE(dd.delay_s, 5.0)
         |    AS offset_s
         |FROM aud a LEFT JOIN dd ON dd.host = a.host""".stripMargin,

    // inbound-anchor replay: both link legs re-CONSTRUCT their hrefs
    // and anchor text from the doc-id math (the t55/t59 discipline —
    // the Spark side PARSES what the payload constructed, so the
    // construction replay validates the parse end to end), hrefs run
    // the shared canonicalization chain, then the same
    // count/window/prevailing-pick
    "t61_anchor_text" -> {
      val b1 = "(doc_id * 7 + 1) % 97"
      val b2 = "(doc_id * 13 + 5) % 97"
      s"""WITH l1u AS (
         |  SELECT doc_id,
         |    'https://www.' || ${sqlPageCore(b1)} ||
         |    '&utm_source=link' AS url
         |  FROM documents),
         |${sqlCanonCtes("l1")},
         |l2u AS (
         |  SELECT doc_id,
         |    'https://' || ${sqlPageCore(b2)} || '#ref' AS url
         |  FROM documents),
         |${sqlCanonCtes("l2")},
         |an AS (
         |  SELECT canon_url AS page,
         |    'see ' || ${sqlHostOf(b1)} || ' page ' ||
         |      CAST((($b1)) % 7 AS VARCHAR) AS anchor
         |  FROM l1c
         |  UNION ALL
         |  SELECT canon_url AS page,
         |    'ref item ' || CAST((($b2)) % 5 AS VARCHAR) AS anchor
         |  FROM l2c),
         |ct AS (
         |  SELECT page, anchor, CAST(COUNT(*) AS BIGINT) AS ct
         |  FROM an GROUP BY 1, 2)
         |SELECT page, n_inlinks, n_variants, anchor AS top_anchor,
         |  ct AS top_ct
         |FROM (
         |  SELECT page, anchor, ct,
         |    CAST(SUM(ct) OVER (PARTITION BY page) AS BIGINT)
         |      AS n_inlinks,
         |    COUNT(*) OVER (PARTITION BY page) AS n_variants,
         |    ROW_NUMBER() OVER (PARTITION BY page
         |      ORDER BY ct DESC, anchor) AS rk
         |  FROM ct)
         |WHERE rk = 1""".stripMargin
    },

    // per-domain crawl governance: t56's URL payload + dedup keepers,
    // t57's PSL registrable domains, one GROUP BY domain — page and
    // keeper counts are exact ints, dup_rate/avg their double ratios
    "t58_domain_stats" ->
      s"""WITH ${sqlUrlCtes("SELECT doc_id FROM documents")},
        |kp AS (
        |  SELECT doc_id, url,
        |    doc_id = MIN(doc_id) OVER (PARTITION BY canon_url) AS keeper
        |  FROM c),
        |${sqlPslCtes("kp")}
        |SELECT p.registrable AS domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_pages,
        |  CAST(SUM(CASE WHEN k.keeper THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  1.0 - CAST(SUM(CASE WHEN k.keeper THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
        |  CAST(SUM($sqlNTokens) AS BIGINT) AS total_weight,
        |  CAST(SUM($sqlNTokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS avg_weight
        |FROM kp k
        |JOIN psl p ON p.doc_id = k.doc_id
        |JOIN documents d ON d.doc_id = k.doc_id
        |GROUP BY p.registrable""".stripMargin,

    "t43_bigram_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w
        |  FROM w WHERE len(w) >= 1),
        |tr AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS term,
        |    CASE WHEN i > 1 THEN w[CAST(i - 1 AS INT)] END AS prev
        |  FROM tok),
        |c1 AS (SELECT term, COUNT(*) AS ct FROM tr GROUP BY 1),
        |c2 AS (
        |  SELECT prev, term, COUNT(*) AS cxy FROM tr
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tok FROM c1)
        |SELECT tr.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN tr.prev IS NULL
        |    THEN length(bin(t.n_tok // u.ct)) - 1
        |    ELSE length(bin(cu.ct // c2.cxy)) - 1 END) AS BIGINT) AS bits_sum,
        |  CAST(SUM(CASE WHEN tr.prev IS NULL
        |    THEN length(bin(t.n_tok // u.ct)) - 1
        |    ELSE length(bin(cu.ct // c2.cxy)) - 1 END) AS DOUBLE) / COUNT(*)
        |    AS avg_surprisal
        |FROM tr
        |JOIN c1 u ON u.term = tr.term
        |LEFT JOIN c1 cu ON cu.term = tr.prev
        |LEFT JOIN c2 ON c2.prev = tr.prev AND c2.term = tr.term
        |CROSS JOIN t
        |GROUP BY tr.doc_id""".stripMargin,

    // t43's bits core -> permille quantize -> the t33 integer
    // ceil-rank tercile selection over a value-count reduction
    "t46_ppl_buckets" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w
        |  FROM w WHERE len(w) >= 1),
        |tr AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS term,
        |    CASE WHEN i > 1 THEN w[CAST(i - 1 AS INT)] END AS prev
        |  FROM tok),
        |c1 AS (SELECT term, COUNT(*) AS ct FROM tr GROUP BY 1),
        |c2 AS (
        |  SELECT prev, term, COUNT(*) AS cxy FROM tr
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tok FROM c1),
        |s AS (
        |  SELECT tr.doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CASE WHEN tr.prev IS NULL
        |      THEN length(bin(t.n_tok // u.ct)) - 1
        |      ELSE length(bin(cu.ct // c2.cxy)) - 1 END) AS BIGINT) AS bits_sum
        |  FROM tr
        |  JOIN c1 u ON u.term = tr.term
        |  LEFT JOIN c1 cu ON cu.term = tr.prev
        |  LEFT JOIN c2 ON c2.prev = tr.prev AND c2.term = tr.term
        |  CROSS JOIN t
        |  GROUP BY tr.doc_id),
        |q AS (SELECT doc_id, (bits_sum * 1000) // n_tokens AS ppm FROM s),
        |vc AS (SELECT ppm, COUNT(*) AS c FROM q GROUP BY 1),
        |p AS (SELECT ppm, SUM(c) OVER (ORDER BY ppm) AS cum,
        |             SUM(c) OVER () AS n FROM vc),
        |cut AS (
        |  SELECT MIN(CASE WHEN cum >= (n * 333 + 999) // 1000 THEN ppm END) AS c1v,
        |         MIN(CASE WHEN cum >= (n * 667 + 999) // 1000 THEN ppm END) AS c2v
        |  FROM p)
        |SELECT q.doc_id, q.ppm,
        |  CASE WHEN q.ppm <= cut.c1v THEN 'head'
        |       WHEN q.ppm <= cut.c2v THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM q CROSS JOIN cut""".stripMargin,

    // NB replay: per-term class counts -> bit-length log-odds with the
    // folded Laplace normalizers -> per-doc instance-weighted sum
    "t45_nb_quality" ->
      """WITH w AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |tok AS (SELECT doc_id, pos, unnest(w) AS term FROM w),
        |c AS (
        |  SELECT term,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS ctp,
        |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS ctn
        |  FROM tok GROUP BY 1),
        |t AS (SELECT CAST(SUM(ctp) AS BIGINT) AS np,
        |             CAST(SUM(ctn) AS BIGINT) AS nn,
        |             CAST(COUNT(*) AS BIGINT) AS v FROM c),
        |m AS (
        |  SELECT term, CAST((length(bin(ctp + 1)) - 1)
        |    - (length(bin(ctn + 1)) - 1)
        |    - (length(bin(np + v)) - 1)
        |    + (length(bin(nn + v)) - 1) AS BIGINT) AS w_bits
        |  FROM c CROSS JOIN t)
        |SELECT tok.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(m.w_bits) AS BIGINT) AS score_bits,
        |  CAST(SUM(m.w_bits) AS DOUBLE) / COUNT(*) AS avg_bits,
        |  CAST(SUM(m.w_bits) AS BIGINT) >= 0 AS pred
        |FROM tok JOIN m USING (term)
        |GROUP BY 1""".stripMargin,

    // the whole DSIR draw replayed exactly: hashed gram buckets (md5
    // 16-bit % 256), Laplace bit-length log-odds vs the raw corpus,
    // per-doc score sums, and the shift-key priority sample — every
    // value BIGINT, so ROW_NUMBER ties equal Spark's
    "t47_dsir_sample" ->
      """WITH w AS (
        |  SELECT doc_id, source, lang,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, lang, unnest(list_concat(w,
        |    CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)),
        |             i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)])
        |      ELSE [] END)) AS gram
        |  FROM w WHERE len(w) >= 1),
        |b AS (
        |  SELECT doc_id, source, lang,
        |    CAST('0x' || substr(md5('d:' || gram), 1, 4) AS BIGINT) % 256
        |      AS bucket
        |  FROM g),
        |cnt AS (
        |  SELECT bucket,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ctt,
        |    COUNT(*) AS ctr
        |  FROM b GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ctt) AS BIGINT) AS nt,
        |               CAST(SUM(ctr) AS BIGINT) AS nr FROM cnt),
        |m AS (
        |  SELECT bucket, CAST((length(bin(ctt + 1)) - 1)
        |    - (length(bin(ctr + 1)) - 1)
        |    - (length(bin(nt + 256)) - 1)
        |    + (length(bin(nr + 256)) - 1) AS BIGINT) AS wb
        |  FROM cnt CROSS JOIN tot),
        |sc AS (
        |  SELECT b.doc_id, b.source, COUNT(*) AS n_grams,
        |    CAST(SUM(m.wb) AS BIGINT) AS score_bits
        |  FROM b JOIN m USING (bucket) GROUP BY 1, 2),
        |mx AS (SELECT source, MAX(score_bits) AS smax FROM sc GROUP BY 1),
        |ky AS (
        |  SELECT sc.doc_id, sc.source, sc.n_grams, sc.score_bits,
        |    (CAST('0x' || substr(md5('r:' || CAST(sc.doc_id AS VARCHAR)),
        |       1, 4) AS BIGINT) + 1)
        |    * (CAST(1 AS BIGINT)
        |       << CAST(LEAST(mx.smax - sc.score_bits, 40) AS INT)) AS k
        |  FROM sc JOIN mx USING (source)),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY source ORDER BY k, doc_id) AS rk FROM ky)
        |SELECT doc_id, source, n_grams, score_bits FROM r
        |WHERE rk <= 3""".stripMargin,

    // token counts exploded over the literal length sweep; CASE
    // instead of greatest() so null-text docs contribute 0 lost
    // tokens under both engines' null rules
    "t50_truncation_sweep" ->
      """WITH n AS (
        |  SELECT len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |    AS _n
        |  FROM documents),
        |e AS (SELECT _n, unnest([64, 128, 256]) AS ctx_len FROM n)
        |SELECT ctx_len, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN _n > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_truncated,
        |  CAST(SUM(_n) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN _n > ctx_len THEN _n - ctx_len ELSE 0 END)
        |    AS BIGINT) AS tokens_lost,
        |  CAST(SUM(CASE WHEN _n > ctx_len THEN _n - ctx_len ELSE 0 END)
        |    AS DOUBLE) / nullif(CAST(SUM(_n) AS BIGINT), 0) AS loss_frac
        |FROM e GROUP BY 1""".stripMargin,

    // t39's recursive-CTE BPE replay, aggregated per language; the
    // division is int-sum / int-sum in DOUBLE on both engines
    "t49_bpe_fertility" ->
      s"""WITH RECURSIVE $sqlBpeCtes
         |SELECT d.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(COALESCE(bt.n_words, 0)) AS BIGINT) AS n_words,
         |  CAST(SUM(COALESCE(bt.bpe_tokens, 0)) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(COALESCE(bt.bpe_tokens, 0)) AS DOUBLE)
         |    / nullif(CAST(SUM(COALESCE(bt.n_words, 0)) AS BIGINT), 0)
         |    AS fertility
         |FROM documents d LEFT JOIN bt USING (doc_id)
         |GROUP BY 1""".stripMargin,

    // d10's chunk grid, keep-first WITHIN each doc: list_position is
    // the first index of the value, so `= i` (DuckDB lambdas index
    // 1-based; Spark's filter 0-based, hence `= i + 1` there) keeps
    // exactly the first occurrence
    "t48_intradoc_dedup" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE text IS NOT NULL),
        |ch AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(ceil(len(w) / 3.0) AS BIGINT)),
        |      j -> array_to_string(
        |             w[CAST(j*3+1 AS INT) : CAST(j*3+3 AS INT)], ' '))
        |      AS c
        |  FROM wd),
        |k AS (
        |  SELECT doc_id, c,
        |    list_filter(c, (x, i) -> list_position(c, x) = i) AS kc
        |  FROM ch)
        |SELECT doc_id, array_to_string(kc, ' ') AS clean_text,
        |  CAST(len(kc) AS BIGINT) AS kept_chunks,
        |  CAST(len(c) - len(kc) AS BIGINT) AS dropped_chunks
        |FROM k""".stripMargin,

    // FMM replay in SQL: `best` is the longest dictionary match at each
    // character position (ties impossible: one substring, one word);
    // the recursive `walk` starts at 1 and advances by the match length
    // (1 on no match) — exactly segment()'s control flow. Depth = token
    // count per doc (~15), well inside recursion limits.
    "t28_keyword_cjk" ->
      s"""WITH RECURSIVE
         |cd AS (SELECT doc_id, $sqlCjkText AS text FROM documents),
         |dict(w) AS (VALUES $sqlCjkDict),
         |pos AS (
         |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
         |  FROM cd),
         |best AS (
         |  SELECT pos.doc_id, pos.p,
         |    arg_max(dict.w, length(dict.w)) AS w,
         |    MAX(length(dict.w)) AS len
         |  FROM pos JOIN dict
         |    ON substr(pos.text, CAST(pos.p AS INT), length(dict.w)) = dict.w
         |  GROUP BY pos.doc_id, pos.p),
         |walk(doc_id, p) AS (
         |  SELECT doc_id, CAST(1 AS BIGINT) FROM cd
         |  UNION ALL
         |  SELECT walk.doc_id, walk.p + COALESCE(best.len, 1)
         |  FROM walk
         |  JOIN cd ON cd.doc_id = walk.doc_id
         |  LEFT JOIN best ON best.doc_id = walk.doc_id AND best.p = walk.p
         |  WHERE walk.p <= length(cd.text))
         |SELECT COALESCE(best.w, substr(cd.text, CAST(walk.p AS INT), 1)) AS keyword,
         |  COUNT(*) AS ct, COUNT(DISTINCT walk.doc_id) AS n_docs
         |FROM walk
         |JOIN cd ON cd.doc_id = walk.doc_id
         |LEFT JOIN best ON best.doc_id = walk.doc_id AND best.p = walk.p
         |WHERE walk.p <= length(cd.text)
         |GROUP BY 1""".stripMargin,

    // max-word replay: all dict matches at all positions; a single char
    // is emitted iff no match STARTING at or before it spans it —
    // segmentFull's `covered` array, set-relationally.
    "t29_keyword_cjk_full" ->
      s"""WITH
         |cd AS (SELECT doc_id, $sqlCjkText AS text FROM documents),
         |dict(w) AS (VALUES $sqlCjkDict),
         |pos AS (
         |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
         |  FROM cd),
         |m AS (
         |  SELECT pos.doc_id, pos.p, dict.w, length(dict.w) AS len
         |  FROM pos JOIN dict
         |    ON substr(pos.text, CAST(pos.p AS INT), length(dict.w)) = dict.w),
         |singles AS (
         |  SELECT pos.doc_id, substr(pos.text, CAST(pos.p AS INT), 1) AS w
         |  FROM pos
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM m
         |    WHERE m.doc_id = pos.doc_id
         |      AND m.p <= pos.p AND m.p + m.len > pos.p)),
         |tokens AS (
         |  SELECT doc_id, w FROM m
         |  UNION ALL SELECT doc_id, w FROM singles)
         |SELECT w AS keyword, COUNT(*) AS ct,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM tokens GROUP BY 1""".stripMargin
  )
}
