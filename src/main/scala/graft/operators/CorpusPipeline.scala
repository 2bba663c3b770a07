package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/** End-to-end corpus curation: the composition every training-data
  * pipeline runs, built entirely from this library's oracle-checked
  * stages — language ID and quality scoring, exact dedup, near-dup
  * cluster labeling, per-language stratified sampling, stable
  * train/val split, and token-budget sequence packing.
  *
  * Each stage ANNOTATES rather than drops: the output carries the full
  * provenance (`drop_reason` null = kept, else the first failing
  * stage), so downstream consumers can audit attrition per stage —
  * the operational requirement a silent filter chain fails. Kept rows
  * additionally carry `split` and `chunk_id`.
  *
  * Scale shape: every stage is one of the already-analyzed operators
  * (SCALING.md) — map-side scoring and sampling predicates, one
  * content-hash shuffle for exact dedup, LSH bucket joins + component
  * labeling for near-dups, and the two-phase prefix sum for packing.
  * Nothing here adds a new shuffle beyond its constituent stages.
  */
object CorpusPipeline {

  /** @param minQuality   drop docs scoring below this (null score drops)
    * @param jaccard      near-dup threshold for cluster labeling
    * @param sampleRates  per-language keep rates in permyriad
    * @param defaultRate  keep rate for unlisted languages
    * @param budget       tokens per packed chunk
    * @param maxTopBigramFrac Gopher repetition gate: drop docs whose
    *   most common bigram covers more than this fraction (None = off;
    *   docs with no bigram slots pass — "no signal")
    * @param maxDupSpanFrac cross-doc duplicated-span gate over
    *   [[DupSpans.report]]'s `dup_frac` (None = off). Computed over the
    *   DEDUP SURVIVORS, not the raw corpus — RefinedWeb/Gopher apply
    *   duplicated-span filters after dedup, because measured pre-dedup
    *   every member of an exact/near-dup cluster sees its grams in ≥ 2
    *   docs (dup_frac ≈ 1.0) and the whole cluster is dropped with no
    *   representative surviving. Post-dedup, one copy of each
    *   duplicated doc gets a fair measurement against *distinct* docs.
    * @param dupSpanN     gram width for the span gate
    * @param benchmark    decontamination gate: drop docs sharing any
    *   `decontamN`-gram with this eval set (None = off)
    * @param maxIntradocDupFrac within-doc repetition gate over
    *   [[Repetition.dupChunkFrac]] (`intradocN`-word chunk grid):
    *   drop docs whose duplicated-chunk fraction exceeds this (None =
    *   off; chunk-less/null docs pass — "no signal"). A pure map.
    * @param nbSeed + @param minNbAvgBits trained-classifier gate: fit
    *   [[Classify.nbTrain]] on the INPUT corpus with `nbSeed` as the
    *   positive label and drop docs whose length-normalized log-odds
    *   `avg_bits` falls below the threshold (both must be set;
    *   docs with no tokens pass). The CCNet/fastText tier inside the
    *   cascade; the model leg stages as `nb_scores`.
    * @param pplTailCutPermille perplexity-tail gate (CCNet §4.3
    *   inverted: DROP the worst tail rather than bucket it): compute
    *   [[Frequency.bigramSurprisal]] over the input corpus, quantize
    *   to integer permille, cut at this permille rank via the exact
    *   value-count quantiles, drop docs ABOVE the cut (None = off;
    *   token-less docs pass). The scores leg stages as `ppl_scores`.
    *
    * The QC gates default OFF, so the base pipeline's oracle contract
    * (t11) is byte-identical with a default Config; each gate adds
    * only its own operator's cost when enabled (a pure map for
    * repetition/intradoc, the t18/t13 shuffles for spans and
    * decontamination, the t45/t43 count shuffles for the trained
    * gates).
    */
  case class Config(minQuality: Double = 0.3,
                    jaccard: Double = 0.5,
                    sampleRates: Map[String, Int] = Map.empty,
                    defaultRate: Int = 10000,
                    budget: Long = 2048L,
                    trainPermille: Int = 900,
                    maxTopBigramFrac: Option[Double] = None,
                    maxDupSpanFrac: Option[Double] = None,
                    dupSpanN: Int = 4,
                    benchmark: Option[DataFrame] = None,
                    decontamN: Int = 4,
                    maxIntradocDupFrac: Option[Double] = None,
                    intradocN: Int = 3,
                    nbSeed: Option[org.apache.spark.sql.Column] = None,
                    minNbAvgBits: Option[Double] = None,
                    pplTailCutPermille: Option[Int] = None)

  /** Staging hook for [[curate]]'s heavy legs — the build/serve split
    * ([[graft.core.Artifacts]]): `stage(name, build)` may serve a
    * persisted table instead of running `build`'s lineage. The legs
    * are `contam_hits` (benchmark gram join), `neardup_clusters` (LSH
    * index + verify + closure), `dup_spans` (span shingling), and
    * `exact_keepers` (the content-hash dedup shuffle) — the four
    * shuffling stages; everything else in the cascade is map-side
    * scoring plus id-keyed joins. The default runs every leg
    * inline (the t11/t11b oracle shape); callers staging must key by
    * input fingerprint AND config, since each leg's rows depend on
    * both.
    */
  type Stager = (String, () => DataFrame) => DataFrame
  val inlineStager: Stager = (_, build) => build()

  /** Annotate `docs` (doc_id, text, …) with curation decisions.
    * Output adds: pred_lang, quality, drop_reason, cluster_id (null =
    * no near-dup), split, chunk_id (null for dropped rows).
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
             stage: Stager = inlineStager): DataFrame = {
    val base = docs
      .withColumn("pred_lang", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
    // optional QC gates annotate _*_fail flags (false when off, so
    // the default plan carries only literals — no joins, no shuffles)
    val withRep = cfg.maxTopBigramFrac match {
      case Some(t) =>
        val n = size(TextFunctions.tokenize(col("text")))
        val frac = Repetition.topBigramCount(col("text")).cast("double") /
          nullif(greatest(n - 1, lit(0)), lit(0))
        base.withColumn("_rep_fail", coalesce(frac > t, lit(false)))
      case None => base.withColumn("_rep_fail", lit(false))
    }
    // within-doc repetition: a pure column, no join
    val withIntra = cfg.maxIntradocDupFrac match {
      case Some(t) => withRep.withColumn("_intra_fail",
        coalesce(Repetition.dupChunkFrac(col("text"), cfg.intradocN) > t,
          lit(false)))
      case None => withRep.withColumn("_intra_fail", lit(false))
    }
    // trained NB gate: model fit on the INPUT corpus with the seed
    // label, scores staged; docs outside the token stream pass
    val withNb = (cfg.nbSeed, cfg.minNbAvgBits) match {
      case (Some(seed), Some(t)) =>
        val toks = TextFunctions.tokenize(lower(col("text")))
        val nb = stage("nb_scores", () =>
            Classify.nbScore(docs, "doc_id", toks,
              Classify.nbTrain(docs, toks, seed))
              .select(col("doc_id"), col("avg_bits")))
        withIntra.join(nb, Seq("doc_id"), "left")
          .withColumn("_nb_fail", coalesce(col("avg_bits") < t, lit(false)))
          .drop("avg_bits")
      case _ => withIntra.withColumn("_nb_fail", lit(false))
    }
    // perplexity tail: staged surprisal permilles, exact quantile cut
    val withPpl = cfg.pplTailCutPermille match {
      case Some(cut) =>
        val ppl = stage("ppl_scores", () =>
            Frequency.bigramSurprisal(docs, "doc_id",
              TextFunctions.tokenize(lower(col("text"))))
              .select(col("doc_id"),
                expr("(bits_sum * 1000) DIV n_tokens").as("_ppm")))
        val cutVal = Quantiles.groupQuantiles(
            ppl.withColumn("_g", lit(0)), "_g", col("_ppm"), Seq(cut))
          .select(col(Quantiles.qName(cut)).as("_ppl_cut"))
        withNb.join(ppl, Seq("doc_id"), "left")
          .crossJoin(broadcast(cutVal))
          .withColumn("_ppl_fail",
            coalesce(col("_ppm") > col("_ppl_cut"), lit(false)))
          .drop("_ppm", "_ppl_cut")
      case None => withNb.withColumn("_ppl_fail", lit(false))
    }
    val scored = cfg.benchmark match {
      case Some(bench) =>
        val hits = stage("contam_hits", () =>
            Decontaminate.contaminationReport(
              docs, bench, "doc_id", "text", cfg.decontamN))
          .select(col("doc_id"), lit(true).as("_contam"))
        withPpl.join(hits, Seq("doc_id"), "left")
          .withColumn("_contam", coalesce(col("_contam"), lit(false)))
      case None => withPpl.withColumn("_contam", lit(false))
    }
    // dedup runs on the gate-surviving set: a cluster whose min id
    // failed an earlier gate must not claim (and then drop) its
    // survivors. With that, each near-dup cluster's representative
    // (the min id) is also its hash group's min, so it always survives
    // exact dedup — the stages compose without orphaned clusters.
    val qualityOk = scored.filter(col("text").isNotNull &&
      length(col("text")) > 0 &&
      col("quality").isNotNull && col("quality") >= cfg.minQuality &&
      !col("_rep_fail") && !col("_intra_fail") && !col("_nb_fail") &&
      !col("_ppl_fail") && !col("_contam"))
    // exact dedup: keep the min doc_id per content hash
    val keepers = stage("exact_keepers", () =>
      Dedup.exact(qualityOk, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"), lit(1).as("_exact_keep")))
    // near-dup clusters over the survivors; keep each cluster's min id
    val clusters = stage("neardup_clusters", () =>
      Dedup.clusterIds(
        Dedup.nearDupPairs(qualityOk, threshold = cfg.jaccard,
          idCol = "doc_id", textCol = "text")
          .select(col("doc_a"), col("doc_b"))))
    val preAnnot = scored
      .join(keepers, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
    // duplicated-span gate — measured over the DEDUP SURVIVORS (the
    // set a downstream trainer would actually see), per the Config
    // scaladoc. A doc dropped here carries 'dup_spans', never
    // 'exact_dup'/'near_dup': the dedup reasons fire first below.
    val withSpan = cfg.maxDupSpanFrac match {
      case Some(t) =>
        val survivors = preAnnot
          .filter(col("_exact_keep").isNotNull &&
            (col("cluster_id").isNull || col("cluster_id") === col("doc_id")))
          .select(col("doc_id"), col("text"))
        val ds = stage("dup_spans", () =>
            DupSpans.report(survivors, "doc_id", "text", cfg.dupSpanN))
          .select(col("doc_id"),
            coalesce(col("dup_frac") > t, lit(false)).as("_span_fail"))
        preAnnot.join(ds, Seq("doc_id"), "left")
          .withColumn("_span_fail", coalesce(col("_span_fail"), lit(false)))
      case None => preAnnot.withColumn("_span_fail", lit(false))
    }
    val annotated = withSpan
      .withColumn("drop_reason",
        when(col("text").isNull || length(col("text")) === 0, "empty")
          .when(col("quality").isNull || col("quality") < cfg.minQuality,
            "quality")
          .when(col("_rep_fail"), "repetition")
          .when(col("_intra_fail"), "intradoc_rep")
          .when(col("_nb_fail"), "nb_quality")
          .when(col("_ppl_fail"), "ppl_tail")
          .when(col("_contam"), "contaminated")
          .when(col("_exact_keep").isNull, "exact_dup")
          .when(col("cluster_id").isNotNull &&
            col("cluster_id") =!= col("doc_id"), "near_dup")
          .when(col("_span_fail"), "dup_spans")
          .when(!TextFunctions.stratifiedKeep(col("doc_id"),
            col("pred_lang"), cfg.sampleRates, cfg.defaultRate), "sampled")
          .otherwise(lit(null).cast("string")))
      .drop("_exact_keep", "_rep_fail", "_intra_fail", "_nb_fail",
        "_ppl_fail", "_span_fail", "_contam")
      .withColumn("split",
        when(col("drop_reason").isNull,
          TextFunctions.stableSplit(col("doc_id"), cfg.trainPermille)))
      // persisted: packByBudget's two driver actions plus the final
      // provenance join would otherwise re-run the scoring regexes and
      // both dedup joins ~4× (nearDupPairs' internal persists cover
      // only the LSH lineage). Same cache lifecycle as the other
      // multi-consumer seams: callers sweeping corpora clear between
      // pipelines.
      .persist()
    // pack only the kept rows; dropped rows keep a null chunk_id
    val kept = annotated.filter(col("drop_reason").isNull)
    val packed = Packing.packByBudget(kept, "doc_id",
        TextFunctions.nTokens(col("text")), cfg.budget,
        cacheInput = false) // `annotated` is already persisted above
      .select(col("doc_id"), col("chunk_id"))
    annotated.join(packed, Seq("doc_id"), "left")
  }

  /** Per-stage attrition report: rows and token mass per drop_reason
    * (null reason = the kept set).
    */
  def attrition(curated: DataFrame): DataFrame =
    curated
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(coalesce(TextFunctions.nTokens(col("text")).cast(LongType),
          lit(0L))).as("tok_sum"))
}
