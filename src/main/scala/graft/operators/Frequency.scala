package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency operators for the training-data pipeline: exact heavy
  * hitters over arbitrarily large token streams via a bounded-state
  * Misra–Gries sketch plus one exact verification pass.
  *
  * Scale shape (100 TB): a plain `groupBy(token).count()` shuffles one
  * row per DISTINCT token — fine for bounded vocabularies, quadratic
  * pain for open ones (URLs, n-grams, ids). The 2-pass scheme here
  * keeps state bounded everywhere: pass 1 is a map-side-combined
  * [[MisraGries]] aggregate whose partial buffers never exceed k
  * entries (the classic mergeable-summaries guarantee: the merged
  * sketch retains every value with true frequency > n/(k+1)); pass 2
  * re-scans the data counting ONLY the ≤ k surviving candidates via a
  * broadcast semi-join — no full-vocabulary shuffle ever happens, and
  * the output is provably EXACT (candidate superset + exact counts +
  * exact threshold), not approximate.
  */
object Frequency {

  /** Misra–Gries frequent-items sketch as a typed `Aggregator`: at most
    * `k` counters per buffer at every partial-aggregation boundary.
    *
    * `reduce` is the textbook update (hit → increment; room → insert;
    * full → decrement all, drop zeros). `merge` is the mergeable-
    * summaries combine (Agarwal et al., "Mergeable Summaries", PODS
    * 2012): sum counters pointwise, then subtract the (k+1)-th largest
    * count and drop non-positives. Both preserve the invariant
    * `true_count − n/(k+1) ≤ sketch_count ≤ true_count`, so every value
    * with frequency > n/(k+1) is present in the final sketch.
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGries needs k >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) b
      else b.get(x) match {
        case Some(c) => b.updated(x, c + 1L)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // full and x absent: decrement every counter (x's implicit
          // counter hits 0 and is not stored), drop exhausted entries
          b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from all, keep positives:
        // ≤ k survivors, error grows by that count — still ≤ n/(k+1)
        val d = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        m.collect { case (t, c) if c > d => t -> (c - d) }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact heavy hitters: every `valueCol` value whose count strictly
    * exceeds `num/den` of the total row count, with its exact count.
    *
    * Two passes over `rows`: (1) MG sketch (+ total count, same scan)
    * → ≤ k candidate values; (2) exact counts of candidates only,
    * via broadcast semi-join. The threshold comparison is integer
    * (`ct * den > n * num`) so the result is bit-identical to any
    * exact engine — no floating-point boundary cases.
    *
    * Requires φ = num/den ≥ 1/(k+1), the regime where Misra–Gries
    * guarantees no false negatives; checked at call time.
    */
  /** @param cacheInput cache the filtered input across the two passes
    * (default). The cached frame is the TOKEN-level dataset — the
    * largest in the pipeline — so a long-lived session sweeping many
    * distinct corpora should either pass false (re-scan instead of
    * accumulating cache entries) or clear the cache between sweeps;
    * repeated calls over the SAME input reuse one entry either way
    * (CacheManager plan-matching).
    */
  def heavyHitters(rows: DataFrame, valueCol: String, k: Int,
                   num: Long = 1L, den: Long = 30L,
                   cacheInput: Boolean = true): DataFrame = {
    require(num > 0 && den > 0, s"need positive threshold, got $num/$den")
    require((k + 1L) * num >= den,
      s"heavyHitters needs num/den >= 1/(k+1) for the MG no-false-negative " +
        s"guarantee, got $num/$den with k=$k")
    val sketch = udaf(new MisraGries(k))
    val filtered = rows.filter(col(valueCol).isNotNull)
    val in = if (cacheInput) filtered.persist() else filtered
    // single-row frame: sketch + exact total from one scan
    val first = in.agg(sketch(col(valueCol)).as("_mg"), count(lit(1)).as("_n"))
    val cands = first.select(explode(map_keys(col("_mg"))).as(valueCol),
      col("_n"))
    in.join(broadcast(cands), valueCol)
      .groupBy(col(valueCol), col("_n"))
      .agg(count(lit(1)).as("ct"))
      .filter(col("ct") * den > col("_n") * num)
      .select(col(valueCol), col("ct"))
  }

  /** Exact heavy hitters PER TUMBLING WINDOW: [[heavyHitters]]'s
    * two-pass scheme keyed by a window column — the batch twin of
    * [[graft.streaming.FrequencyStreaming.windowedHeavyHitters]],
    * sharing the same [[MisraGries]] fold, so the per-window sketch
    * semantics are oracle-checkable (the streaming variant emits the
    * sketch itself; this one verifies candidates to exact counts, and
    * a dropped true heavy hitter in ANY window would surface as a
    * missing row vs the exact oracle).
    *
    * Scale shape: pass 1 partial-aggregates ≤ k counters per (window,
    * partition) before the shuffle; the candidate frame is ≤ k rows ×
    * open windows (windows are bounded — days/hours — so it stays
    * broadcastable at any corpus size); pass 2 is the same broadcast
    * semi-join + exact count as the global variant. No per-distinct-
    * value shuffle ever happens.
    *
    * @param windowCol window-start expression (e.g. day-truncated
    *   epoch millis); rows with a null value are excluded, mirroring
    *   the global variant.
    * @param cacheInput same lifecycle hazard as [[heavyHitters]]'s
    *   flag: the cached frame is the (window, value)-level dataset —
    *   a long-lived session sweeping many distinct corpora should
    *   pass false or clear the cache between sweeps, or cached copies
    *   accumulate until eviction thrashing.
    */
  def windowedHeavyHitters(rows: DataFrame, windowCol: Column,
                           valueCol: String, k: Int,
                           num: Long = 1L, den: Long = 30L,
                           cacheInput: Boolean = true): DataFrame = {
    require(num > 0 && den > 0, s"need positive threshold, got $num/$den")
    require((k + 1L) * num >= den,
      s"windowedHeavyHitters needs num/den >= 1/(k+1), got $num/$den with k=$k")
    val sketch = udaf(new MisraGries(k))
    // null windows are excluded like null values: a null-window group
    // would otherwise surface heavy-hitter rows with a null
    // window_start that no consumer (or oracle mirror) models
    val filtered = rows
      .filter(col(valueCol).isNotNull && windowCol.isNotNull)
      .select(windowCol.as("_w"), col(valueCol))
    val in = if (cacheInput) filtered.persist() else filtered
    val first = in.groupBy(col("_w"))
      .agg(sketch(col(valueCol)).as("_mg"), count(lit(1)).as("_n"))
    val cands = first.select(col("_w"),
      explode(map_keys(col("_mg"))).as(valueCol), col("_n"))
    in.join(broadcast(cands), Seq("_w", valueCol))
      .groupBy(col("_w"), col(valueCol), col("_n"))
      .agg(count(lit(1)).as("ct"))
      .filter(col("ct") * den > col("_n") * num)
      .select(col("_w").as("window_start"), col(valueCol), col("ct"))
  }

  /** Rare-term QC scoring: per document, how much of it is made of
    * corpus-rare tokens (OCR garbage, misspellings, random ids — the
    * word-frequency quality filter of corpus curation). A term is
    * "rare" iff `cf · 1000 < permille · total_tokens` — an integer
    * comparison on corpus-relative frequency, so the rule is scale-
    * invariant and has no float boundary. Output per doc (docs with
    * zero tokens are absent): token count, the corpus frequency of its
    * rarest term, and the count/fraction of rare-term occurrences.
    *
    * Scale shape: the token stream collapses map-side to (doc, term)
    * term frequencies first, so the vocabulary join moves distinct
    * pairs, not raw tokens; the corpus total enters as a broadcast
    * 1-row frame (never a driver collect); Zipf-head skew on the join
    * key is per-(doc,term) rows, bounded by doc count, and AQE's skew
    * split covers the residue.
    */
  def rareTermScore(docs: DataFrame, idCol: String, toks: Column,
                    permille: Long = 1L): DataFrame = {
    require(permille >= 1, s"permille must be >= 1, got $permille")
    val tf = docs.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val stats = vocab.agg(sum(col("cf")).as("tot"))
    val marked = vocab.crossJoin(broadcast(stats))
      .select(col("term"), col("cf"),
        (col("cf") * 1000L < col("tot") * permille).as("is_rare"))
    tf.join(marked, "term")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_toks"),
        min(col("cf")).as("min_cf"),
        sum(when(col("is_rare"), col("tf")).otherwise(lit(0L))).as("rare_ct"))
      .select(col(idCol), col("n_toks"), col("min_cf"), col("rare_ct"),
        (col("rare_ct").cast("double") / col("n_toks").cast("double"))
          .as("rare_frac"))
  }

  /** Corpus-level collocations: the top word bigrams by LIFT,
    * p(xy)/(p(x)·p(y)) — the exponent-free core of PMI, the "which
    * phrases behave as units" signal behind tokenizer-vocab and
    * stop-phrase curation. `minCount` suppresses the classic PMI
    * pathology (hapax pairs scoring ∞-ish).
    *
    * Determinism: counts are exact integers; lift is ONE fixed-shape
    * double expression over them — c_xy·N·N / (B·c_x·c_y), evaluated
    * left-to-right in both engines — and the top-k orders by (lift,
    * bigram), so ranking is bit-stable cross-engine.
    *
    * Scale shape: unigram and bigram counts are two partial-aggregated
    * shuffles (state bounded by vocab / observed-bigram count); the
    * count-table joins are equi-joins on the word; scalar totals ride
    * a broadcast; the final top-k is TakeOrdered (orderBy + limit),
    * never a global sort. For open vocabularies where even the bigram
    * count table is too fat, gate the input through [[heavyHitters]]
    * first — lift needs c_x, c_y ≥ minCount survivors only.
    */
  /** Per-document unigram surprisal — the language-model-free
    * perplexity surrogate a curation stack uses to flag gibberish
    * (high surprisal) and boilerplate (low): each token scores
    * ⌊log₂(N / ct(term))⌋ bits against the corpus's own unigram
    * distribution, and the doc gets the total and the mean.
    *
    * Determinism discipline: a float log₂ would make boundary tokens
    * engine-dependent in the last bit; ⌊log₂⌋ of a BIGINT is computed
    * EXACTLY as `length(bin(N DIV ct)) − 1` — bit-length, no floating
    * point anywhere until the final mean divide — so the scores
    * hash-match any engine with integer division and binary
    * formatting.
    *
    * Scale shape: token explode → vocabulary-sized count aggregate →
    * size-based join back (broadcast while the vocab fits) → per-doc
    * sum. The corpus total rides a broadcast 1-row frame.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String,
                       toks: Column): DataFrame = {
    val tok = docs.select(col(idCol), explode(toks).as("term"))
    val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("ct"))
    val total = broadcast(counts.agg(sum(col("ct")).as("n_tok")))
    tok.join(counts, "term").crossJoin(total)
      .withColumn("bits", length(bin(expr("n_tok DIV ct"))) - 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).cast("long").as("bits_sum"))
      .withColumn("avg_surprisal",
        col("bits_sum").cast("double") / col("n_tokens"))
  }

  /** Per-document BIGRAM conditional surprisal — [[unigramSurprisal]]
    * upgraded to a first-order LM: token i ≥ 2 scores
    * ⌊log₂(ct(w_{i−1}) / ct(w_{i−1}, w_i))⌋ bits against the corpus's
    * own bigram conditionals p(w_i | w_{i−1}), and each doc's FIRST
    * token falls back to the unigram score (the start-context rule) —
    * so gibberish word ORDER now raises surprisal even when every
    * individual word is common, the failure mode a unigram surrogate
    * can't see.
    *
    * Same determinism discipline as t30: ⌊log₂⌋ of a BIGINT quotient
    * via bit-length (`length(bin(x DIV y)) − 1`), no floating point
    * until the final mean divide.
    *
    * Scale shape: position-tagged token explode → ONE tagged shuffle
    * counts unigrams and bigrams together (the [[collocations]]
    * trick — w2 null = unigram row; state bounded by vocab + observed
    * bigrams); the three count joins are equi-joins that broadcast
    * while the count tables fit; per-doc sum is the only other
    * exchange.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String,
                      toks: Column): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val tok = docs.select(col(idCol), toks.as("_w"))
      .filter(size(col("_w")) >= 1)
      .select(col(idCol), explode(expr(
        """transform(sequence(0, size(_w) - 1),
          |  i -> struct(_w[i] AS term,
          |              IF(i > 0, _w[i-1], CAST(NULL AS STRING)) AS prev))"""
          .stripMargin)).as("p"))
      .select(col(idCol), col("p.term").as("term"), col("p.prev").as("prev"))
    val uniRow = struct(col("term").as("w1"),
      lit(null).cast(StringType).as("w2"))
    val counted = tok.select(explode(
        when(col("prev").isNotNull,
          array(uniRow, struct(col("prev").as("w1"), col("term").as("w2"))))
          .otherwise(array(uniRow))).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val uni = counted.filter(col("w2").isNull)
      .select(col("w1").as("w"), col("c"))
    val bi = counted.filter(col("w2").isNotNull)
      .select(col("w1").as("bw1"), col("w2").as("bw2"), col("c").as("cxy"))
    val total = broadcast(uni.agg(sum(col("c")).as("n_tok")))
    tok
      .join(uni.select(col("w").as("term"), col("c").as("ct")), "term")
      .join(uni.select(col("w").as("prev"), col("c").as("cx")),
        Seq("prev"), "left")
      .join(bi, col("prev") === col("bw1") && col("term") === col("bw2"),
        "left")
      .crossJoin(total)
      .withColumn("bits",
        when(col("prev").isNull, length(bin(expr("n_tok DIV ct"))) - 1)
          .otherwise(length(bin(expr("cx DIV cxy"))) - 1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).cast("long").as("bits_sum"))
      .withColumn("avg_surprisal",
        col("bits_sum").cast("double") / col("n_tokens"))
  }

  /** Per-document TRIGRAM surprisal with backoff — [[bigramSurprisal]]
    * upgraded to the train/score split a real LM filter runs: n-gram
    * counts come from the TRAIN side only, every doc is scored against
    * them, and tokens whose trigram (or bigram, or unigram) was never
    * seen in training BACK OFF one level at a +1-bit penalty per level
    * — a power-of-two Stupid Backoff (Brants et al. 2007 use factor
    * 0.4; 0.5 = exactly one bit keeps every score an integer
    * bit-length, the repo's engine-exactness discipline). OOV tokens
    * score ⌊log₂ N⌋ (the count-1 ceiling) plus the full backoff
    * penalty and are counted separately.
    *
    * Scoring against held-out counts is what makes backoff REAL: a
    * corpus scored against its own counts never sees a zero (every
    * occurrence counts itself — the t43 shape), so val-side docs here
    * are where unseen trigrams, bigrams, and OOV words actually fire.
    *
    * Scale shape: one position-tagged explode; ONE tagged shuffle
    * counts unigrams, bigrams and trigrams together off the train
    * side (state bounded by observed grams); scoring is five
    * equi-joins against those count tables plus a per-doc sum.
    */
  def backoffSurprisal(docs: DataFrame, idCol: String, toks: Column,
                       isTrain: Column): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val tok = docs.select(col(idCol), isTrain.as("_tr"), toks.as("_w"))
      .filter(size(col("_w")) >= 1)
      .select(col(idCol), col("_tr"), explode(expr(
        """transform(sequence(0, size(_w) - 1),
          |  i -> struct(_w[i] AS term,
          |              IF(i > 0, _w[i-1], CAST(NULL AS STRING)) AS prev,
          |              IF(i > 1, _w[i-2], CAST(NULL AS STRING)) AS prev2))"""
          .stripMargin)).as("p"))
      .select(col(idCol), col("_tr"), col("p.term").as("term"),
        col("p.prev").as("prev"), col("p.prev2").as("prev2"))
    val nul = lit(null).cast(StringType)
    val uniRow = struct(col("term").as("w1"), nul.as("w2"), nul.as("w3"))
    val biRow = struct(col("prev").as("w1"), col("term").as("w2"),
      nul.as("w3"))
    val triRow = struct(col("prev2").as("w1"), col("prev").as("w2"),
      col("term").as("w3"))
    val counted = tok.filter(col("_tr"))
      .select(explode(
        when(col("prev2").isNotNull, array(uniRow, biRow, triRow))
          .when(col("prev").isNotNull, array(uniRow, biRow))
          .otherwise(array(uniRow))).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .agg(count(lit(1)).as("c"))
    val uni = counted.filter(col("w2").isNull)
      .select(col("w1").as("w"), col("c"))
    val bi = counted.filter(col("w2").isNotNull && col("w3").isNull)
    val tri = counted.filter(col("w3").isNotNull)
    val total = broadcast(uni.agg(sum(col("c")).as("n_tok")))
    tok
      .join(uni.select(col("w").as("term"), col("c").as("c1t")),
        Seq("term"), "left")
      .join(uni.select(col("w").as("prev"), col("c").as("c1p")),
        Seq("prev"), "left")
      .join(bi.select(col("w1").as("prev"), col("w2").as("term"),
        col("c").as("c2pt")), Seq("prev", "term"), "left")
      .join(bi.select(col("w1").as("prev2"), col("w2").as("prev"),
        col("c").as("c2ctx")), Seq("prev2", "prev"), "left")
      .join(tri.select(col("w1").as("prev2"), col("w2").as("prev"),
        col("w3").as("term"), col("c").as("c3")),
        Seq("prev2", "prev", "term"), "left")
      .crossJoin(total)
      // a seen trigram implies its context bigram (c2ctx) was seen,
      // and a seen bigram implies its left unigram (c1p) — quotients
      // are always >= 1 where the branch fires
      .withColumn("bits", expr(
        """CASE
          |  WHEN prev2 IS NOT NULL AND c3 IS NOT NULL
          |    THEN length(bin(c2ctx DIV c3)) - 1
          |  WHEN prev IS NOT NULL AND c2pt IS NOT NULL
          |    THEN length(bin(c1p DIV c2pt)) - 1
          |         + IF(prev2 IS NOT NULL, 1, 0)
          |  WHEN c1t IS NOT NULL
          |    THEN length(bin(n_tok DIV c1t)) - 1
          |         + CASE WHEN prev2 IS NOT NULL THEN 2
          |                WHEN prev IS NOT NULL THEN 1 ELSE 0 END
          |  ELSE length(bin(n_tok)) - 1
          |       + CASE WHEN prev2 IS NOT NULL THEN 2
          |              WHEN prev IS NOT NULL THEN 1 ELSE 0 END
          |END""".stripMargin))
      .groupBy(col(idCol), col("_tr"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).cast("long").as("bits_sum"),
        sum(when(col("c1t").isNull, 1L).otherwise(0L)).as("oov_ct"))
      .withColumnRenamed("_tr", "is_train")
      .withColumn("avg_surprisal",
        col("bits_sum").cast("double") / col("n_tokens"))
  }

  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val words = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.TextFunctions.tokenize(lower(col(textCol)))
          .as("_w"))
    // unigrams and bigrams counted in ONE tagged shuffle (w2 null =
    // unigram): the two-aggregate form scans and tokenizes the corpus
    // twice and shuffles it twice. Bigrams stay within a doc (never
    // straddle documents); the size guard lives in the CASE because
    // sequence(1, 0) would step DOWNWARD, not produce empty.
    val grams = words.select(explode(expr(
      """concat(
        |  transform(_w, x -> struct(x AS w1, CAST(NULL AS STRING) AS w2)),
        |  CASE WHEN size(_w) >= 2
        |    THEN transform(sequence(1, size(_w) - 1),
        |           i -> struct(_w[i-1] AS w1, _w[i] AS w2))
        |    ELSE array() END)""".stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val uni = grams.filter(col("w2").isNull)
      .select(col("w1").as("w"), col("c"))
    val bi = grams.filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("c").as("cxy"))
    // both corpus totals from the counted frame in one aggregate
    val totals = grams.agg(
      sum(when(col("w2").isNull, col("c"))).as("n_tok"),
      sum(when(col("w2").isNotNull, col("c"))).as("n_bi"))
    val lift = col("cxy").cast("double") * col("n_tok") * col("n_tok") /
      (col("n_bi").cast("double") * col("cx") * col("cy"))
    bi.filter(col("cxy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Vocabulary-growth (Heaps' law) curve: cumulative distinct-word
    * count at `bins` evenly spaced corpus prefixes (by id order),
    * beside the cumulative doc and token counts — the curve whose
    * V ≈ K·nᵝ fit forecasts how a vocabulary-bound state (BPE
    * training, inverted indexes, n-gram models) grows when the corpus
    * does, i.e. the planning input for every "state ∝ vocabulary"
    * scale claim in this repo.
    *
    * Exactness: a word's contribution to prefix k is decided by its
    * FIRST-occurrence id (`min(id)` — order-independent), and bin
    * edges are pure integer arithmetic `((max_id+1)·k) DIV bins − 1`,
    * so every value replays engine-exact.
    *
    * Scale shape: one explode + min-agg reduces the corpus to one row
    * per distinct word; the per-prefix counts are broadcast
    * nested-loop joins of that reduction (and the doc-level token
    * counts) against a bins-sized edge frame — ≤ bins-fold
    * replication of already-reduced rows, never of text. At 100 TB
    * the only full-data pass is the tokenize scan.
    */
  def vocabGrowth(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", bins: Int = 8): DataFrame = {
    require(bins >= 1 && bins <= 64, s"bins must be in [1, 64], got $bins")
    val d = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("text"))
    val edges = broadcast(
      d.agg(max(col("id")).as("mx"))
        .select(explode(sequence(lit(1), lit(bins))).as("bin"), col("mx"))
        .select(col("bin").cast("int").as("bin"),
          (expr(s"((mx + 1) * bin) DIV $bins") - 1).as("id_le")))
    val firstSeen = d
      .select(col("id"),
        explode(graft.functions.TextFunctions.tokenSet(col("text")))
          .as("w"))
      .groupBy(col("w")).agg(min(col("id")).as("first_id"))
    val docToks = d.select(col("id"),
      graft.functions.TextFunctions.nTokens(col("text")).cast("long")
        .as("nt"))
    val vocabCum = firstSeen.join(edges, col("first_id") <= col("id_le"))
      .groupBy(col("bin")).agg(count(lit(1)).as("vocab_cum"))
    val tokCum = docToks.join(edges, col("id") <= col("id_le"))
      .groupBy(col("bin")).agg(count(lit(1)).as("docs_cum"),
        sum(col("nt")).as("tokens_cum"))
    edges.join(tokCum, Seq("bin"), "left").join(vocabCum, Seq("bin"), "left")
      .select(col("bin"), col("id_le"),
        coalesce(col("docs_cum"), lit(0L)).as("docs_cum"),
        coalesce(col("tokens_cum"), lit(0L)).as("tokens_cum"),
        coalesce(col("vocab_cum"), lit(0L)).as("vocab_cum"))
  }
}
