package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.langProfiles
import graft.operators.{CorpusPipeline, Sharding}

/** End-state oracle for the full corpus-curation composition
  * ([[graft.operators.CorpusPipeline.curate]]): per document, the first
  * failing stage (or "kept"), the train/val split, the packed chunk id,
  * and the near-dup cluster label — one row per input doc, so the
  * whole language-ID → quality → exact-dedup → near-dup-cluster →
  * stratified-sample → split → pack cascade is pinned in one query.
  *
  * The oracle SQL is the composition of the already-proven t2/t3
  * (language/quality), d1 (exact dedup), d2/d3/d6 (LSH candidates,
  * Jaccard verify, cluster closure), t9 (salted sampling), t7 (stable
  * split), and t10 (budget packing) mirrors, re-rooted on the
  * quality-surviving doc set exactly as the pipeline stages are.
  */
object CurateOps {

  /** Non-default rates so the "sampled" stage actually fires. */
  private val cfg = CorpusPipeline.Config(
    sampleRates = Map("en" -> 8000), defaultRate = 9000)

  /** t11b: the same pipeline with all three QC gates ON. Thresholds
    * are set where the sf0.01 corpus actually has mass (top-bigram
    * p95 ≈ 0.091, survivor dup_frac p99 ≈ 0.09), so every gate's
    * drop_reason bucket is non-empty — the full gated composition is
    * hash-checked end to end, not just the per-gate reports
    * (t12/t13/t18). src0 plays the benchmark (as in t13), so the
    * curated corpus is the other 19 sources.
    */
  private val cfgGated = cfg.copy(
    maxTopBigramFrac = Some(0.09),
    maxDupSpanFrac = Some(0.08),
    dupSpanN = 4,
    decontamN = 4)

  /** t11c: the ROUND-12 full cascade — t11b's gates plus the
    * within-doc repetition gate, the trained NB classifier gate, and
    * the perplexity-tail gate. Thresholds sit where the sf0.01 corpus
    * has mass (intradoc dup p>0 on a handful of docs; NB avg_bits
    * p5 ≈ −0.67; surprisal p900 cuts ~10%), so every new drop_reason
    * bucket is non-empty and the full eleven-stage cascade is
    * hash-checked end to end.
    */
  private val intraT = 0.01
  private val nbT = -0.22
  private val pplCut = 900
  private val cfgFull = cfgGated.copy(
    maxIntradocDupFrac = Some(intraT),
    intradocN = 3,
    nbSeed = Some(col("lang") === "en"),
    minNbAvgBits = Some(nbT),
    pplTailCutPermille = Some(pplCut))

  private def stageSelect(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      coalesce(col("drop_reason"), lit("kept")).as("stage"),
      // nulls coalesced to sentinels: the driver compare hashes
      // scalar values, and "" / -1 are unambiguous here (split and
      // chunk_id exist iff kept, cluster_id iff in a near-dup
      // component)
      coalesce(col("split"), lit("")).as("split"),
      coalesce(col("chunk_id"), lit(-1L)).as("chunk_id"),
      coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))

  /** Build/serve staging for the pipeline's shuffling legs
    * ([[CorpusPipeline.Stager]]): each leg is keyed by the input dir's
    * content fingerprint plus every config field it can depend on
    * (`benchmark` is excluded from the case-class key — its identity
    * is the same dir's fingerprint plus the `tag`), so a regenerated
    * corpus or a changed threshold rebuilds instead of serving stale
    * rows. First run builds (the honest cold cost); every later
    * cold-started run serves the staged tables — the production
    * economics, where the near-dup index and span report are
    * materialized once per corpus version.
    */
  private def stager(s: SparkSession, dir: String, tag: String,
                     c: CorpusPipeline.Config): CorpusPipeline.Stager = {
    // logicalId = pipeline tag + config + LEG NAME; generation = the
    // input dir's fingerprint. Keeping the fingerprint out of the
    // logicalId means a regenerated corpus GCs each leg's old
    // generation — and sibling legs (distinct logicalIds) are provably
    // untouched by a leg's publish.
    val cfg = c.copy(benchmark = None).toString
    val fp = graft.core.Artifacts.fingerprint(dir)
    (name, build) =>
      graft.core.Artifacts.table(s, s"curate|$tag|$cfg|$name", fp)(build())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- epoch shuffle + exact-balanced shards ---------------------------
    // the corpus -> training-loader step: a reproducible pseudo-random
    // permutation (md5(seed || id)) with contiguous equal shards,
    // computed by the two-phase rank (bucket counts -> broadcast
    // offsets -> local windows) - never a global single-task sort
    "t35_epoch_shards" -> { (s, dir) =>
      Sharding.epochShards(Tables.load(s, dir, "documents"),
        "doc_id", numShards = 7, seed = "epoch0")
    },

    // ---- token-balanced shards -------------------------------------------
    // shard boundaries at multiples of total-tokens/S along the epoch
    // order: each loader worker gets near-equal token WORK, not
    // near-equal doc counts (heterogeneous doc lengths skew t35's
    // doc-balanced shards by whole factors)
    "t37_token_shards" -> { (s, dir) =>
      Sharding.epochShardsByWeight(Tables.load(s, dir, "documents"),
        "doc_id", graft.functions.TextFunctions.nTokens(col("text")),
        numShards = 5, seed = "epoch0")
    },

    // ---- BPE-token-balanced shards ----------------------------------------
    // t37 re-run on the weight a data loader actually budgets: shard
    // boundaries at multiples of total BPE tokens / S along the same
    // epoch permutation (the staged bpe-counts artifact serves the
    // weights; the two-phase rank is weight-agnostic)
    "t41_bpe_token_shards" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .join(TextOps.bpeCountsIdx(s, dir)
          .select(col("doc_id"), col("bpe_tokens")), "doc_id")
      Sharding.epochShardsByWeight(d, "doc_id", col("bpe_tokens"),
        numShards = 5, seed = "epoch0")
    },

    "t11_curate" -> { (s, dir) =>
      stageSelect(
        CorpusPipeline.curate(Tables.load(s, dir, "documents"), cfg,
          stage = stager(s, dir, "t11", cfg)))
    },
    "t11b_curate_gated" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val c = cfgGated.copy(benchmark = Some(d.filter(col("source") === "src0")))
      stageSelect(CorpusPipeline.curate(
        d.filter(col("source") =!= "src0"), c,
        stage = stager(s, dir, "t11b", c)))
    },
    "t11c_curate_full" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val c = cfgFull.copy(benchmark = Some(d.filter(col("source") === "src0")))
      stageSelect(CorpusPipeline.curate(
        d.filter(col("source") =!= "src0"), c,
        stage = stager(s, dir, "t11c", c)))
    },

    // t11d: the FROM-CRAWL pipeline — t11c's full 11-gate cascade fed
    // by stage 0 (URL-dedup keepers over synthesized crawl-variant
    // URLs, then boilerplate-aware HTML extraction: title/nav chrome
    // stripped BEFORE dedup, because site chrome plants the same
    // 4-grams in every page and detonates the dup-span candidate
    // join). One hash-checked query from markup to train/val shards.
    "t11d_curate_web" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      // stage 0 STAGED (r18): the URL-dedup keeper window + the
      // boilerplate-stripped HTML extraction are the one shuffling leg
      // of this pipeline that was still rebuilt inline on every run —
      // production crawls materialize exactly this table once per
      // crawl version (the WET-file step). Keyed like every other leg:
      // the input fingerprint is the generation.
      val stage0 = graft.core.Artifacts.table(s,
        "curate|t11d|stage0|urldedup+extract",
        graft.core.Artifacts.fingerprint(dir))({
        val nonBench = d.filter(col("source") =!= "src0")
        val keepers = graft.operators.Urls.urlDedupReport(
            graft.operators.Urls.withUrlPayload(nonBench))
          .filter(col("keeper")).select("doc_id")
        graft.operators.Html.withHtmlPayload(
            nonBench.join(keepers, "doc_id"))
          .select(col("doc_id"),
            graft.operators.Html.extractMainText(col("html")).as("text"),
            col("source"), col("lang"))
      })
      val c = cfgFull.copy(benchmark = Some(d.filter(col("source") === "src0")))
      stageSelect(CorpusPipeline.curate(stage0, c,
        stage = stager(s, dir, "t11d", c)))
    })

  def oracle: Map[String, String] = Map(
    // t37's window mirror with the BPE recursive replay as the weight
    "t41_bpe_token_shards" ->
      s"""WITH RECURSIVE ${TextOps.sqlBpeCtes},
         |x AS (
         |  SELECT d.doc_id, COALESCE(bt.bpe_tokens, 0) AS wt,
         |    md5('epoch0:' || CAST(d.doc_id AS VARCHAR)) AS h
         |  FROM documents d LEFT JOIN bt USING (doc_id)),
         |r AS (
         |  SELECT doc_id, wt,
         |    ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS rank,
         |    COALESCE(SUM(wt) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
         |    SUM(wt) OVER () AS total
         |  FROM x)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank,
         |  CAST(LEAST((cumb * 5) // total, 4) AS INT) AS shard
         |FROM r""".stripMargin,
    // single-window mirror of the two-phase rank: global ROW_NUMBER
    // over (md5, id); shard = integer rank*S // total
    "t35_epoch_shards" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      - 1 AS rank,
        |    COUNT(*) OVER () AS total
        |  FROM documents)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank,
        |  CAST((rank * 7) // total AS INT) AS shard
        |FROM r""".stripMargin,

    // window mirror: cumulative tokens BEFORE the row along the md5
    // epoch order; shard = least((cum*S)//total, S-1)
    "t37_token_shards" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text,' '), t -> len(t) > 0))
        |      AS BIGINT) AS wt,
        |    md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, wt,
        |    ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS rank,
        |    COALESCE(SUM(wt) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
        |    SUM(wt) OVER () AS total
        |  FROM x)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank,
        |  CAST(LEAST((cumb * 5) // total, 4) AS INT) AS shard
        |FROM r""".stripMargin,

    "t11_curate" -> {
      val scores = langProfiles.map { case (l, p) =>
        s"len(list_intersect(${TextOps.sqlTokenSet}, ${TextOps.sqlProfile(p)})) AS s_$l"
      }.mkString(",\n  ")
      val best = langProfiles.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val cases = langProfiles.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("\n  ")
      val stops = TextOps.sqlProfile(langProfiles.flatMap(_._2).distinct)
      val nt = TextOps.sqlNTokens
      val minQ = cfg.minQuality
      val sampleRate =
        s"CASE WHEN pred_lang = 'en' THEN ${cfg.sampleRates("en")} ELSE ${cfg.defaultRate} END"
      s"""WITH RECURSIVE sc AS (
         |  SELECT doc_id, text, $scores,
         |    $nt AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_ct,
         |    CAST(len(list_filter(list_filter(string_split(lower(text),' '), x -> len(x) > 0),
         |        w -> list_contains($stops, w))) AS DOUBLE) / nullif($nt, 0) AS stop_ratio
         |  FROM documents),
         |b AS (SELECT *, $best AS best FROM sc),
         |m AS (
         |  SELECT doc_id, text, n_tokens,
         |    CASE $cases ELSE 'und' END AS pred_lang,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + least(stop_ratio * 4.0, 1.0) * 0.4
         |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2 AS quality
         |  FROM b),
         |ok AS (
         |  SELECT doc_id, text FROM m
         |  WHERE text IS NOT NULL AND len(text) > 0
         |    AND quality IS NOT NULL AND quality >= $minQ),
         |${DedupOps.sqlCandidatesFrom("ok")},
         |${DedupOps.sqlClusterCtes(cfg.jaccard)},
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY md5(text)),
         |dr AS (
         |  SELECT m.doc_id,
         |    CASE
         |      WHEN m.text IS NULL OR len(m.text) = 0 THEN 'empty'
         |      WHEN m.quality IS NULL OR m.quality < $minQ THEN 'quality'
         |      WHEN k.doc_id IS NULL THEN 'exact_dup'
         |      WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> m.doc_id THEN 'near_dup'
         |      WHEN NOT (CAST('0x' || substr(md5('s:' || CAST(m.doc_id AS VARCHAR)), 1, 4) AS INT) * 10000
         |                < ($sampleRate) * 65536) THEN 'sampled'
         |      ELSE NULL END AS drop_reason,
         |    m.n_tokens, c.cluster_id
         |  FROM m
         |  LEFT JOIN keep k ON k.doc_id = m.doc_id
         |  LEFT JOIN clus c ON c.doc_id = m.doc_id),
         |pk AS (
         |  SELECT doc_id,
         |    CAST(COALESCE(SUM(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // ${cfg.budget} AS BIGINT) AS chunk_id
         |  FROM (SELECT doc_id, COALESCE(n_tokens, 0) AS tok
         |        FROM dr WHERE drop_reason IS NULL))
         |SELECT d.doc_id,
         |  COALESCE(d.drop_reason, 'kept') AS stage,
         |  CASE WHEN d.drop_reason IS NULL THEN
         |    CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) * 1000
         |              < ${cfg.trainPermille} * 65536
         |         THEN 'train' ELSE 'val' END
         |  ELSE '' END AS split,
         |  COALESCE(pk.chunk_id, -1) AS chunk_id,
         |  COALESCE(d.cluster_id, -1) AS cluster_id
         |FROM dr d LEFT JOIN pk ON pk.doc_id = d.doc_id""".stripMargin
    },

    // the gates-on composition: same cascade as t11 re-rooted on the
    // non-src0 corpus, plus the t12 (repetition), t13 (decontamination
    // vs src0), and t18 (duplicated spans, measured over the DEDUP
    // SURVIVORS — see CorpusPipeline.Config) mirrors in the pipeline's
    // gate order: empty → quality → repetition → contaminated →
    // exact_dup → near_dup → dup_spans → sampled
    "t11b_curate_gated" -> curateGatedOracle(full = false),
    "t11c_curate_full" -> curateGatedOracle(full = true),

    // stage 0 as CTEs ahead of the shared generator: URL keepers
    // (wu/wn/wk/wc + the keeper window), synthesized HTML over the
    // survivors (wb/wh), then src = the main-text extraction — the
    // SAME strip/canonicalization fragments t55/t56 hash-check
    "t11d_curate_web" -> curateGatedOracle(full = true, srcCtes =
      s"""${TextOps.sqlUrlCtes(
             "SELECT doc_id FROM documents WHERE source <> 'src0'", "w")},
         |wkeep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      doc_id = MIN(doc_id) OVER (PARTITION BY canon_url)
         |        AS keeper
         |    FROM wc) WHERE keeper),
         |${TextOps.sqlHtmlCtes(
             "SELECT d.doc_id, d.text FROM documents d " +
               "JOIN wkeep USING (doc_id)", "w")},
         |src AS MATERIALIZED (
         |  SELECT d.doc_id,
         |    ${TextOps.sqlHtmlExtract("wh.html", main = true)} AS text,
         |    d.source, d.lang
         |  FROM documents d JOIN wh ON wh.doc_id = d.doc_id)""".stripMargin)
  )

  /** Shared mirror of the gated curate cascade. `full = false` is
    * t11b (quality/repetition/decontam/dedup/span gates); `full =
    * true` adds the round-12 tiers — within-doc repetition
    * (list_distinct over the d10 chunk grid), the NB classifier
    * (t45's replay re-rooted on the curated corpus), and the
    * perplexity tail (t43's replay + the t46 ceil-rank permille cut).
    * One builder, two bindings: the t11b contract can never drift
    * from t11c's shared stages.
    */
  /** @param srcCtes the CTE chain that DEFINES `src` — the curated
    * input relation (doc_id, text, lang[, source]). The default is
    * the raw-documents split t11/t11b/t11c use; t11d passes the
    * stage-0 composition (URL-dedup keepers → boilerplate-stripped
    * HTML extraction), so one oracle generator covers both the
    * clean-text and the from-crawl pipelines.
    */
  private def curateGatedOracle(full: Boolean,
      srcCtes: String =
        "src AS (SELECT * FROM documents WHERE source <> 'src0')")
      : String = {
      val scores = langProfiles.map { case (l, p) =>
        s"len(list_intersect(${TextOps.sqlTokenSet}, ${TextOps.sqlProfile(p)})) AS s_$l"
      }.mkString(",\n  ")
      val best = langProfiles.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val cases = langProfiles.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("\n  ")
      val stops = TextOps.sqlProfile(langProfiles.flatMap(_._2).distinct)
      val nt = TextOps.sqlNTokens
      val minQ = cfgGated.minQuality
      val repT = cfgGated.maxTopBigramFrac.get
      val spanT = cfgGated.maxDupSpanFrac.get
      val sampleRate =
        s"CASE WHEN m.pred_lang = 'en' THEN ${cfgGated.sampleRates("en")} ELSE ${cfgGated.defaultRate} END"
      // 4-gram explode shared by the decontamination and span CTEs
      def grams4(toks: String) =
        s"""SELECT doc_id, unnest(list_transform(range(len(w) - 3),
           |    i -> list_aggregate(w[i+1:i+4], 'string_agg', ' '))) AS g
           |  FROM $toks WHERE len(w) >= 4""".stripMargin
      // ---- round-12 gate fragments (t11c only) ---------------------------
      // intradoc: the d10/t48 chunk grid + list_distinct fraction;
      // nb: the t45 replay re-rooted on src; ppl: the t43 replay plus
      // the t46 ceil-rank permille cut. All pre-stripped flush text —
      // the outer stripMargin leaves lines without a margin bar alone.
      val extraCtes = if (!full) "" else
        s"""iw AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM src
WHERE text IS NOT NULL),
ich AS (SELECT doc_id,
  list_transform(range(0, CAST(ceil(len(w2) / 3.0) AS BIGINT)),
    j -> array_to_string(w2[CAST(j*3+1 AS INT) : CAST(j*3+3 AS INT)], ' '))
  AS c FROM iw),
intra AS (SELECT doc_id,
  CAST(len(c) - len(list_distinct(c)) AS DOUBLE) / nullif(len(c), 0)
  AS ifrac FROM ich),
nbtok AS (SELECT doc_id, lang = 'en' AS pos,
  unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0))
  AS term FROM src),
nbc AS (SELECT term,
  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS ctp,
  CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS ctn
  FROM nbtok GROUP BY 1),
nbt AS (SELECT CAST(SUM(ctp) AS BIGINT) AS np,
  CAST(SUM(ctn) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS v FROM nbc),
nbm AS (SELECT term, CAST((length(bin(ctp + 1)) - 1)
  - (length(bin(ctn + 1)) - 1) - (length(bin(np + v)) - 1)
  + (length(bin(nn + v)) - 1) AS BIGINT) AS wb FROM nbc CROSS JOIN nbt),
nb AS (SELECT nbtok.doc_id, CAST(SUM(nbm.wb) AS DOUBLE) / COUNT(*)
  AS avg_bits FROM nbtok JOIN nbm USING (term) GROUP BY 1),
ptr AS (SELECT doc_id, w[CAST(i AS INT)] AS term,
  CASE WHEN i > 1 THEN w[CAST(i - 1 AS INT)] END AS prev
  FROM (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w
        FROM (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> len(x) > 0)
                AS w FROM src)
        WHERE len(w) >= 1)),
pc1 AS (SELECT term, COUNT(*) AS ct FROM ptr GROUP BY 1),
pc2 AS (SELECT prev, term, COUNT(*) AS cxy FROM ptr
  WHERE prev IS NOT NULL GROUP BY 1, 2),
pt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tok FROM pc1),
ps AS (SELECT ptr.doc_id, COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN ptr.prev IS NULL
    THEN length(bin(pt.n_tok // u.ct)) - 1
    ELSE length(bin(cu.ct // pc2.cxy)) - 1 END) AS BIGINT) AS bits_sum
  FROM ptr JOIN pc1 u ON u.term = ptr.term
  LEFT JOIN pc1 cu ON cu.term = ptr.prev
  LEFT JOIN pc2 ON pc2.prev = ptr.prev AND pc2.term = ptr.term
  CROSS JOIN pt GROUP BY ptr.doc_id),
pplq AS (SELECT doc_id, (bits_sum * 1000) // n_tokens AS ppm FROM ps),
pvc AS (SELECT ppm, COUNT(*) AS c FROM pplq GROUP BY 1),
pp AS (SELECT ppm, SUM(c) OVER (ORDER BY ppm) AS cum,
  SUM(c) OVER () AS n FROM pvc),
pcut AS (SELECT MIN(CASE WHEN cum >= (n * $pplCut + 999) // 1000
  THEN ppm END) AS cv FROM pp),
"""
      val extraJoins = if (!full) "" else
        s"""LEFT JOIN intra it ON it.doc_id = m.doc_id
  LEFT JOIN nb ON nb.doc_id = m.doc_id
  LEFT JOIN pplq pq ON pq.doc_id = m.doc_id
  CROSS JOIN pcut pc
  """
      val extraFilter = if (!full) "" else
        s"""
    AND NOT COALESCE(it.ifrac > $intraT, FALSE)
    AND NOT COALESCE(nb.avg_bits < $nbT, FALSE)
    AND NOT COALESCE(pq.ppm > pc.cv, FALSE)"""
      val extraCases = if (!full) "" else
        s"""WHEN COALESCE(it.ifrac > $intraT, FALSE) THEN 'intradoc_rep'
      WHEN COALESCE(nb.avg_bits < $nbT, FALSE) THEN 'nb_quality'
      WHEN COALESCE(pq.ppm > pc.cv, FALSE) THEN 'ppl_tail'
      """
      s"""WITH RECURSIVE $srcCtes,
         |sc AS (
         |  SELECT doc_id, text, $scores,
         |    $nt AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_ct,
         |    CAST(len(list_filter(list_filter(string_split(lower(text),' '), x -> len(x) > 0),
         |        w -> list_contains($stops, w))) AS DOUBLE) / nullif($nt, 0) AS stop_ratio
         |  FROM src),
         |b AS (SELECT *, $best AS best FROM sc),
         |m AS (
         |  SELECT doc_id, text, n_tokens,
         |    CASE $cases ELSE 'und' END AS pred_lang,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + least(stop_ratio * 4.0, 1.0) * 0.4
         |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2 AS quality
         |  FROM b),
         |rtoks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS w FROM src),
         |rgrams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM rtoks WHERE len(w) >= 2),
         |rtop AS (SELECT doc_id, MAX(c) AS top_ct FROM (
         |    SELECT doc_id, g, COUNT(*) AS c FROM rgrams GROUP BY doc_id, g) GROUP BY doc_id),
         |rep AS (SELECT t.doc_id,
         |    CAST(COALESCE(p.top_ct, 0) AS DOUBLE) / nullif(greatest(len(t.w) - 1, 0), 0) AS tbf
         |  FROM rtoks t LEFT JOIN rtop p USING (doc_id)),
         |btoks AS (
         |  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS w
         |  FROM documents WHERE source = 'src0'),
         |cgrams AS (SELECT DISTINCT doc_id, g FROM (${grams4("rtoks")})),
         |bgrams AS (SELECT DISTINCT g FROM (${grams4("btoks")})),
         |contam AS (SELECT DISTINCT doc_id FROM cgrams JOIN bgrams USING (g)),
         |${extraCtes}ok AS (
         |  SELECT m.doc_id, m.text FROM m
         |  LEFT JOIN rep r ON r.doc_id = m.doc_id
         |  LEFT JOIN contam c ON c.doc_id = m.doc_id
         |  ${extraJoins}WHERE m.text IS NOT NULL AND len(m.text) > 0
         |    AND m.quality IS NOT NULL AND m.quality >= $minQ
         |    AND NOT COALESCE(r.tbf > $repT, FALSE)
         |    AND c.doc_id IS NULL$extraFilter),
         |${DedupOps.sqlCandidatesFrom("ok")},
         |${DedupOps.sqlClusterCtes(cfgGated.jaccard)},
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY md5(text)),
         |surv AS (
         |  SELECT o.doc_id, o.text FROM ok o
         |  JOIN keep k ON k.doc_id = o.doc_id
         |  LEFT JOIN clus c2 ON c2.doc_id = o.doc_id
         |  WHERE c2.cluster_id IS NULL OR c2.cluster_id = o.doc_id),
         |stoks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS w FROM surv),
         |sdg AS (
         |  SELECT doc_id, substr(md5(g), 1, 16) AS gh, COUNT(*) AS ct
         |  FROM (${grams4("stoks")}) GROUP BY doc_id, gh),
         |sgd AS (SELECT gh, COUNT(*) AS n_docs FROM sdg GROUP BY gh),
         |span AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN n_docs >= 2 THEN ct ELSE 0 END) AS DOUBLE)
         |      / CAST(SUM(ct) AS DOUBLE) AS dup_frac
         |  FROM sdg JOIN sgd USING (gh) GROUP BY doc_id),
         |dr AS (
         |  SELECT m.doc_id,
         |    CASE
         |      WHEN m.text IS NULL OR len(m.text) = 0 THEN 'empty'
         |      WHEN m.quality IS NULL OR m.quality < $minQ THEN 'quality'
         |      WHEN COALESCE(r.tbf > $repT, FALSE) THEN 'repetition'
         |      ${extraCases}WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |      WHEN k.doc_id IS NULL THEN 'exact_dup'
         |      WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> m.doc_id THEN 'near_dup'
         |      WHEN COALESCE(sp.dup_frac > $spanT, FALSE) THEN 'dup_spans'
         |      WHEN NOT (CAST('0x' || substr(md5('s:' || CAST(m.doc_id AS VARCHAR)), 1, 4) AS INT) * 10000
         |                < ($sampleRate) * 65536) THEN 'sampled'
         |      ELSE NULL END AS drop_reason,
         |    m.n_tokens, cl.cluster_id
         |  FROM m
         |  LEFT JOIN rep r ON r.doc_id = m.doc_id
         |  LEFT JOIN contam c ON c.doc_id = m.doc_id
         |  LEFT JOIN keep k ON k.doc_id = m.doc_id
         |  LEFT JOIN clus cl ON cl.doc_id = m.doc_id
         |  LEFT JOIN span sp ON sp.doc_id = m.doc_id
         |  $extraJoins),
         |pk AS (
         |  SELECT doc_id,
         |    CAST(COALESCE(SUM(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // ${cfgGated.budget} AS BIGINT) AS chunk_id
         |  FROM (SELECT doc_id, COALESCE(n_tokens, 0) AS tok
         |        FROM dr WHERE drop_reason IS NULL))
         |SELECT d.doc_id,
         |  COALESCE(d.drop_reason, 'kept') AS stage,
         |  CASE WHEN d.drop_reason IS NULL THEN
         |    CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) * 1000
         |              < ${cfgGated.trainPermille} * 65536
         |         THEN 'train' ELSE 'val' END
         |  ELSE '' END AS split,
         |  COALESCE(pk.chunk_id, -1) AS chunk_id,
         |  COALESCE(d.cluster_id, -1) AS cluster_id
         |FROM dr d LEFT JOIN pk ON pk.doc_id = d.doc_id""".stripMargin
  }
}
