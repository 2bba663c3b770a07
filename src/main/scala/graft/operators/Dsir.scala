package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents that LOOK LIKE a target seed corpus by
  * (1) featurizing every doc as a bag of hashed n-grams, (2) fitting
  * bucket distributions on the target slice and on the raw corpus,
  * (3) scoring each doc with the log importance ratio
  * Σ_b c_b(doc)·(log p̂_target[b] − log p̂_raw[b]), and (4) resampling
  * without replacement with probability ∝ the importance weight. This
  * is the published scale recipe for "get more target-domain-like
  * pretraining data" — a trained-classifier selector ([[Classify]])
  * needs labeled negatives; DSIR needs only the target slice.
  *
  * Determinism discipline (shared with [[Classify]] /
  * `Frequency.bigramSurprisal`): every log₂ is the integer bit-length
  * ⌊log₂ x⌋ = `length(bin(x)) − 1`, so bucket weights and doc scores
  * are exact integers, replayable cross-engine. The resampling step
  * keeps that exactness (see [[resample]]): importance weights are
  * 2^score_bits — exact powers of two — so the priority u/w of
  * sequential-Poisson sampling becomes an integer SHIFT, never a
  * float: key = (u16+1)·2^(s_max−s), compared in BIGINT.
  *
  * Scale shape: the model is one gram explode → per-bucket count
  * (ONE shuffle, state = `buckets` rows — broadcast-sized by
  * construction, unlike a vocabulary); scoring is a gram explode →
  * broadcast model join → per-doc sum (ONE shuffle); resampling is a
  * per-stratum top-k rank window (WindowGroupLimit keeps k rows per
  * task before the final sort). The corpus is never shuffled row-wise.
  */
object Dsir {

  /** ⌊log₂ x⌋ for x ≥ 1 as an integer column. */
  private def bits(x: Column): Column = length(bin(x)) - 1

  /** Unigram + bigram strings of `_w` (an array<string> column named
    * literally `_w` in scope): [a,b,c] → [a, b, c, "a b", "b c"].
    * The size guard lives in the CASE because sequence(1, 0) would
    * step DOWNWARD, not produce empty (same pitfall as
    * `Frequency.collocations`).
    */
  private val gramExpr = expr(
    """concat(_w,
      |  CASE WHEN size(_w) >= 2
      |    THEN transform(sequence(1, size(_w) - 1),
      |           i -> concat(_w[i-1], ' ', _w[i]))
      |    ELSE array() END)""".stripMargin)

  /** Hash a gram string into [0, buckets): first 16 md5 bits, salted
    * so the bucket hash is independent of every other md5 use in the
    * library, mod buckets. Exact in both engines
    * (`CAST('0x'||substr(md5('d:'||g),1,4) AS INT) % buckets`).
    */
  private def bucketOf(g: Column, buckets: Int): Column =
    conv(substring(md5(concat(lit("d:"), g)), 1, 4), 16, 10)
      .cast(LongType) % buckets

  /** (id-or-label, bucket) rows: one per gram INSTANCE (multinomial
    * counts, not presence). Docs with no tokens contribute nothing.
    */
  private def bucketRows(docs: DataFrame, keep: Column, toks: Column,
                         buckets: Int): DataFrame =
    docs.select(keep.as("_k"), toks.as("_w"))
      .filter(size(col("_w")) >= 1)
      .select(col("_k"), explode(gramExpr).as("_g"))
      .select(col("_k"), bucketOf(col("_g"), buckets).as("bucket"))

  /** Featurized gram-instance rows (id, tgt, bucket) — the frame both
    * [[modelFromRows]] and [[scoresFromRows]] aggregate. Stage it ONCE
    * per (corpus, buckets, target) via `core/Artifacts`: featurization
    * (tokenize → grams → md5 buckets) is the only pass that touches
    * text bytes, so serving both legs from the staged parquet halves
    * the corpus scans and both consumers stay map-side aggregations
    * of a compact 3-column frame.
    */
  def featureRows(docs: DataFrame, idCol: String, toks: Column,
                  target: Column, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), target.as("tgt"), toks.as("_w"))
      .filter(size(col("_w")) >= 1)
      .select(col(idCol), col("tgt"), explode(gramExpr).as("_g"))
      .select(col(idCol), col("tgt"),
        bucketOf(col("_g"), buckets).as("bucket"))
  }

  /** [[model]] from staged [[featureRows]]: identical output (spec-
    * pinned), one bucket-keyed partial-aggregated shuffle over the
    * staged frame.
    */
  def modelFromRows(rows: DataFrame, buckets: Int): DataFrame = {
    val counts = rows.groupBy(col("bucket"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ctt"),
        count(lit(1)).as("ctr"))
    val tot = counts.agg(sum(col("ctt")).as("nt"), sum(col("ctr")).as("nr"))
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (bits(col("ctt") + 1) - bits(col("ctr") + 1)
          - bits(col("nt") + buckets) + bits(col("nr") + buckets))
          .cast(LongType).as("w_bits"))
  }

  /** [[scores]] from staged [[featureRows]]: identical output (spec-
    * pinned), no second pass over text.
    */
  def scoresFromRows(rows: DataFrame, idCol: String, model: DataFrame,
                     unseenW: Column = lit(0L)): DataFrame =
    rows.select(col(idCol), col("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("w_bits"), unseenW)).cast(LongType)
          .as("score_bits"))

  /** Fit the hashed-bucket importance model: (bucket, w_bits) with
    * w_bits[b] = ⌊log₂(ct_t[b]+1)⌋ − ⌊log₂(ct_r[b]+1)⌋
    *           − ⌊log₂(N_t+B)⌋ + ⌊log₂(N_r+B)⌋
    * — Laplace-smoothed target vs RAW log-likelihood ratio in integer
    * bits. `target` marks the seed slice; the raw side is the whole
    * input (target included, per the paper: q is the corpus being
    * resampled). Only buckets observed in the corpus appear — scoring
    * the same corpus can never miss the join.
    *
    * At most `buckets` rows come out of one partial-aggregated
    * shuffle: the model broadcasts at any corpus size, the property
    * hashing buys over a vocabulary model.
    */
  def model(docs: DataFrame, toks: Column, target: Column,
            buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    modelFromRows(
      bucketRows(docs, target, toks, buckets).withColumnRenamed("_k", "tgt"),
      buckets)
  }

  /** Per-doc importance score: (id, n_grams, score_bits) with
    * score_bits = Σ over gram instances of w_bits[bucket(gram)].
    * Token-less docs (and null ids) don't appear — they have no
    * features and can't be resampled. Buckets absent from the model
    * (impossible when scoring the training corpus; possible when a
    * STREAM drifts past it) weigh `unseenW` — the formula's
    * ct_t = ct_r = 0 floor is −⌊log₂(N_t+B)⌋ + ⌊log₂(N_r+B)⌋, which
    * callers scoring out-of-train data derive from the training
    * totals (the [[graft.operators.Classify.unseenBits]] pattern).
    */
  def scores(docs: DataFrame, idCol: String, toks: Column,
             model: DataFrame, buckets: Int,
             unseenW: Column = lit(0L)): DataFrame =
    scoresFromRows(
      bucketRows(docs.filter(col(idCol).isNotNull), col(idCol), toks,
        buckets).withColumnRenamed("_k", idCol),
      idCol, model, unseenW)

  /** Sample `k` rows per stratum WITHOUT replacement, with inclusion
    * probability ∝ 2^score_bits — sequential-Poisson (priority)
    * sampling exactly like `Mixing.prioritySample`, but EXACT in
    * integers: the weight is a power of two, so the priority
    * u / 2^s rescales to key = (u16+1) · 2^(s_max−s) (same order,
    * s_max per stratum), a BIGINT shift instead of a float divide.
    * The k smallest keys per stratum win; ties (the 16-bit uniform
    * grain) break by id, making the draw a pure function of
    * (id, score) — stable across runs, engines, partitioning.
    *
    * `band` clamps the shift: docs more than `band` bits below the
    * stratum max share the floor key tier (order within it falls to
    * u16, then id). A doc 2^40 times lighter than the heaviest has no
    * practical chance anyway; the clamp keeps every key ≤ 2^(16+band)
    * < 2^63 exact. Needs score_bits already computed — pass
    * [[scores]] output joined back to whatever stratum column the
    * caller samples within.
    */
  def resample(scored: DataFrame, strataCol: String, idCol: String,
               k: Int, band: Int = 40): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(band >= 1 && band <= 46, s"band must be in [1, 46], got $band")
    val u16 = conv(substring(md5(concat(lit("r:"),
        col(idCol).cast(StringType))), 1, 4), 16, 10).cast(LongType)
    val smax = scored.groupBy(col(strataCol))
      .agg(max(col("score_bits")).as("_smax"))
    val win = Window.partitionBy(col(strataCol))
      .orderBy(col("_key").asc, col(idCol))
    scored
      .filter(col(idCol).isNotNull)
      .join(broadcast(smax), Seq(strataCol))
      .withColumn("_sh", least(col("_smax") - col("score_bits"),
        lit(band.toLong)).cast("int"))
      .withColumn("_key",
        (u16 + 1L) * expr("shiftleft(CAST(1 AS BIGINT), _sh)"))
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") <= k)
      .drop("_key", "_rk", "_sh", "_smax")
  }
}
