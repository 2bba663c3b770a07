package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Document deduplication operators for the training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH, n-gram Jaccard, and SimHash.
  *
  * Scale design (100 TB): every operator is a shuffle-on-key
  * aggregation or a bucket-join — never an all-pairs product.
  *  - Exact dedup shuffles once on the 128-bit content hash.
  *  - MinHash/LSH turns near-dup search into an equi-join on band
  *    keys: candidate generation is O(docs × bands) map-side plus one
  *    shuffle on (band, key); only same-bucket docs are ever paired.
  *  - Verification (exact Jaccard) runs only on LSH candidates.
  *  - SimHash reduces each doc to a small signature whose equality
  *    (or banded sub-keys, at scale) again gives an equi-join.
  * All hashes derive from md5 so the DuckDB oracle can reproduce them
  * bit-for-bit; swapping in xxhash64 for production speed is a one-line
  * change per signature.
  */
object Dedup {

  /** Shingles over an ALREADY-PROJECTED word-array column. `words`
    * must be a bound attribute: the `transform` lambda evaluates it
    * once per shingle position, so passing `split(text, " ")` directly
    * re-splits the document per position — O(L²) per doc.
    */
  def shinglesOf(words: Column, n: Int): Column = {
    val starts = sequence(lit(1), greatest(size(words) - (n - 1), lit(1)))
    array_distinct(transform(starts, i => concat_ws(" ", slice(words, i, lit(n)))))
  }

  /** Word n-gram shingles of a text column, distinct, order-free.
    * Short docs (< n words) contribute their full text as one shingle.
    * For bulk scans prefer [[shingleRows]], which projects the split
    * into its own column first (see [[shinglesOf]]).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOf(split(text, " "), n)

  /** (id, shingle) rows — the distributed layout every downstream LSH
    * stage works from: explode of the map-side [[shingles]] array.
    * Entirely shuffle-free — shingling and dedup (array_distinct)
    * happen inside the scan stage, so the first exchange in any LSH
    * pipeline is the signature groupBy itself. (A window-lead
    * formulation trades this for codegen'd ops but costs a full
    * shuffle+sort of every word row plus a distinct — strictly worse
    * at any scale: the HOF is per-doc map work that partitions
    * perfectly.)
    */
  def shingleRows(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), explode(shinglesOf(col("_w"), n)).as("shingle"))

  /** Per-seed minhash aggregate columns h0..h{k-1}: the min over a
    * doc's shingle rows of md5(seed||shingle). Partial-aggregatable
    * (md5 hex strings are fixed-length, so lexicographic min == numeric
    * min — portable to any engine with md5).
    */
  private def minhashAggs(numHashes: Int): Seq[Column] =
    (0 until numHashes).map { k =>
      min(md5(concat(lit(s"$k:"), col("shingle")))).as(s"h$k")
    }

  /** MinHash signature table: id, h0..h{k-1}. One shuffle on id. */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 3,
                 numHashes: Int = 8): DataFrame = {
    val aggs = minhashAggs(numHashes)
    shingleRows(docs, idCol, textCol, n)
      .groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Signature frame → (id, band, key) bucket rows. */
  private def bandFrame(sigs: DataFrame, idCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val ks = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", ks: _*)).as("key"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Bucket rows → distinct candidate (a < b) pairs.
    *
    * `maxBucket` guards the quadratic failure mode at scale: one
    * degenerate bucket (boilerplate shingles, empty docs) makes the
    * self-join produce |bucket|² pairs. Buckets above the cap are
    * excluded from candidate generation — the standard production
    * treatment (their members are near-identical boilerplate, caught
    * by exact dedup) — via one cheap pre-aggregation on the same key
    * the join shuffles on.
    */
  private def pairsFromBuckets(bk: DataFrame, idCol: String,
                               maxBucket: Int = Int.MaxValue): DataFrame = {
    val capped =
      if (maxBucket == Int.MaxValue) bk
      else {
        val sizes = bk.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("_bsz"))
          .filter(col("_bsz") <= maxBucket)
        bk.join(sizes, Seq("band", "key"), "left_semi")
      }
    val a = capped.select(col("band"), col("key"), col(idCol).as("doc_a"))
    val b = capped.select(col("band").as("band_b"), col("key").as("key_b"),
      col(idCol).as("doc_b"))
    a.join(b,
        col("band") === col("band_b") && col("key") === col("key_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** id → (band, key) rows: `bands` groups of `rowsPerBand` signature
    * values, each group hashed to one bucket key. A pair of docs is a
    * candidate iff they share at least one (band, key).
    */
  def lshBuckets(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 bands: Int = 2, rowsPerBand: Int = 4): DataFrame =
    bandFrame(signatures(docs, idCol, textCol, numHashes = bands * rowsPerBand),
      idCol, bands, rowsPerBand)

  /** Candidate near-dup pairs: equi-self-join on the band key.
    * Distinct (a < b) so each pair appears once however many bands
    * collide.
    */
  /** One (bands, rowsPerBand) candidate with its S-curve quality:
    * `fn` = the miss mass above the threshold (pairs LSH should catch
    * but won't), `fp` = the candidate mass below it (pairs LSH wastes
    * a verify on), both as the integral of |P(s) − step_t(s)| over the
    * respective side of the unit interval, where
    * P(s) = 1 − (1 − s^r)^b is the classic banding catch probability.
    */
  case class LshPlan(bands: Int, rowsPerBand: Int,
                     fn: Double, fp: Double) {
    def cost(fnWeight: Double): Double = fnWeight * fn + fp
  }

  /** Choose (bands, rowsPerBand) for a Jaccard threshold — the
    * planning step every LSH deployment runs before the d2 pipeline:
    * enumerate every (b, r) with b·r ≤ `maxSignature` (signature width
    * is the storage/shuffle budget — 8 here costs 8 md5s per doc) and
    * pick the curve minimizing `fnWeight·fn + fp`, misses weighted
    * heavier than wasted verifies because a missed duplicate ships to
    * training while a false candidate only costs one array intersect.
    * Deterministic (stable ordering on ties: fewer rows first, then
    * more bands); the d12 calibration row is the empirical check that
    * the analytic curve matches this corpus.
    */
  def lshPlan(threshold: Double, maxSignature: Int = 8,
              fnWeight: Double = 4.0): LshPlan = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0, 1), got $threshold")
    require(maxSignature >= 1, s"maxSignature must be >= 1")
    val grid = 1000
    val plans = for {
      r <- 1 to maxSignature
      b <- 1 to (maxSignature / r)
    } yield {
      var fn = 0.0
      var fp = 0.0
      var i = 0
      while (i < grid) {
        val s = (i + 0.5) / grid
        val p = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        if (s >= threshold) fn += (1.0 - p) / grid
        else fp += p / grid
        i += 1
      }
      LshPlan(b, r, fn, fp)
    }
    plans.sortBy(p => (p.cost(fnWeight), p.rowsPerBand, -p.bands)).head
  }

  /** Candidate pairs from an ALREADY-COMPUTED signature frame (the
    * [[signatures]] output) — for consumers that also read the
    * signatures themselves (the d12 calibration eval): one shingle +
    * minhash pass serves both, instead of [[candidatePairs]]
    * recomputing the whole lineage internally.
    */
  def candidatePairsFromSignatures(sigs: DataFrame,
                                   idCol: String = "doc_id",
                                   bands: Int = 2, rowsPerBand: Int = 4,
                                   maxBucket: Int = Int.MaxValue): DataFrame =
    pairsFromBuckets(bandFrame(sigs, idCol, bands, rowsPerBand).persist(),
      idCol, maxBucket)

  def candidatePairs(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     bands: Int = 2, rowsPerBand: Int = 4,
                     maxBucket: Int = Int.MaxValue): DataFrame =
    // persist the small bucket frame — a self-join otherwise recomputes
    // the whole shingle+signature lineage per side (AQE's broadcast
    // path bypasses ReusedExchange). persist (lazy, non-blocking)
    // rather than localCheckpoint: no eager barrier job, and the first
    // pass through the scan stage populates it for the second side
    pairsFromBuckets(
      lshBuckets(docs, idCol, textCol, bands, rowsPerBand).persist(),
      idCol, maxBucket)

  /** Cross-corpus LSH candidates — the RETRIEVAL shape of
    * [[candidatePairs]]: find each query document's near-dup
    * candidates IN a (different, usually much larger) corpus, as a
    * directed (q_id, n_id) pair list. The self-join becomes a
    * query-buckets × corpus-buckets equi-join: with a small query set
    * the query side broadcasts and the corpus is probed once — the
    * batch twin of [[streamingCandidatePairs]]' per-micro-batch
    * contract, and the candidate tier under a "has this doc been seen
    * before" service. `maxBucket` caps degenerate CORPUS buckets
    * (boilerplate shingles), same discipline as the self-join.
    */
  def crossCandidatePairs(queries: DataFrame, corpus: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          bands: Int = 2, rowsPerBand: Int = 4,
                          maxBucket: Int = Int.MaxValue): DataFrame =
    crossCandidatePairsFromSignatures(
      signatures(queries, idCol, textCol, bands * rowsPerBand),
      signatures(corpus, idCol, textCol, bands * rowsPerBand),
      idCol, bands, rowsPerBand, maxBucket)

  /** [[crossCandidatePairs]] from ALREADY-COMPUTED signature frames —
    * the serve path when the corpus signature table is a staged
    * artifact (built once per corpus release): probing a new query
    * batch then skips the corpus's shingle + minhash pass entirely
    * and pays only the query-side signatures plus the bucket join.
    */
  def crossCandidatePairsFromSignatures(qSigs: DataFrame, cSigs: DataFrame,
                                        idCol: String = "doc_id",
                                        bands: Int = 2, rowsPerBand: Int = 4,
                                        maxBucket: Int = Int.MaxValue)
      : DataFrame = {
    val qb = bandFrame(qSigs, idCol, bands, rowsPerBand)
    val cb0 = bandFrame(cSigs, idCol, bands, rowsPerBand)
    val cb =
      if (maxBucket == Int.MaxValue) cb0
      else cb0.join(
        cb0.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("_bsz")).filter(col("_bsz") <= maxBucket)
          .select(col("band"), col("key")),
        Seq("band", "key"), "left_semi")
    qb.select(col("band"), col("key"), col(idCol).as("q_id"))
      .join(cb.select(col("band"), col("key"), col(idCol).as("n_id")),
        Seq("band", "key"))
      .select(col("q_id"), col("n_id")).distinct()
  }

  /** Exact Jaccard similarity over shingle sets — the verification pass
    * applied to LSH candidates only.
    */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast(DoubleType) /
      size(array_union(shA, shB))

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.
    *
    * Jaccard is computed set-relationally — |A∩B| by joining the two
    * docs' shingle rows, |A∪B| = |A| + |B| − |A∩B| — so no per-row
    * arrays survive into the join and every stage is a shuffled
    * aggregate. Candidates sharing no shingle drop out of the inner
    * join, which is equivalent to jaccard = 0 < threshold.
    */
  /** Cache lifecycle: the persisted intermediates are plan-matched by
    * the CacheManager, so repeated invocations over the SAME input
    * reuse one entry (no growth); distinct corpora add entries that
    * live until `df.unpersist()` / `spark.catalog.clearCache()` — a
    * long-lived session sweeping many corpora should clear between
    * pipelines (on a cluster these seams become persisted tables).
    * The repo's own lifecycle owners do exactly that: Bench and Verify
    * call `spark.catalog.clearCache()` after each query's action, so
    * intra-query reuse is kept and nothing accumulates across the
    * 110-query sweeps.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 3, bands: Int = 2, rowsPerBand: Int = 4,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    // sr feeds three consumers (signatures+sizes, both intersection
    // sides) and sigSize two — persist each so the lineage runs once
    // (lazy: no barrier jobs, unlike localCheckpoint)
    val sr = shingleRows(docs, idCol, textCol, n).persist()
    // one shuffle yields both the minhash signatures and the set sizes
    val aggs = minhashAggs(bands * rowsPerBand) :+ count(lit(1)).as("n_sh")
    val sigSize = sr.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .persist()
    val cand = pairsFromBuckets(
      bandFrame(sigSize, idCol, bands, rowsPerBand), idCol, maxBucket)
    val inter = cand
      .join(sr.select(col(idCol).as("doc_a"), col("shingle")), "doc_a")
      .join(sr.select(col(idCol).as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sigSize.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sigSize.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT Jaccard-threshold similarity join via prefix filtering —
    * the AllPairs/PPJoin family (Bayardo et al., WWW 2007; Xiao et
    * al., WWW 2008). The deterministic complement of [[nearDupPairs]]:
    * LSH candidates are probabilistic (d9 measures what they miss);
    * prefix filtering is a LOSSLESS filter, so the output is exactly
    * every pair with Jaccard ≥ threshold — at the cost of exact-join
    * candidate generation instead of banded hashing.
    *
    * The pruning argument: order every doc's shingles by ascending
    * document frequency (rarest first, ties by shingle — one global
    * canonical order). For J(A,B) ≥ t the FIRST shared shingle in
    * that order sits within the first |X| − ⌈t·|X|⌉ + 1 shingles of
    * BOTH docs (all earlier shingles are unshared, and ≥ ⌈t·|X|⌉
    * shared ones must still follow). So an equi-join on PREFIX
    * shingles alone finds every qualifying pair — and because
    * prefixes are built from the RAREST shingles, the Zipf head that
    * makes a naive shingle join df²-quadratic (the d11 problem)
    * never generates a candidate. A length filter (t·|A| ≤ |B|)
    * prunes the survivors before verification.
    *
    * Scale shape: document-frequency counts are vocab-sized; the
    * per-doc rank is one window over the doc's own shingle rows; the
    * candidate join touches prefix rows only (≈ (1−t)·corpus rows,
    * each with bounded df on the rare end of the vocabulary); the
    * verify leg is the shared intersection-count join restricted by
    * a semi-join to candidates. All thresholds integer (permille),
    * so the pair set replays bit-exactly cross-engine.
    */
  def prefixFilterPairs(docs: DataFrame, tauPermille: Long,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 3): DataFrame = {
    val sr = shingleRows(docs, idCol, textCol, n).persist()
    prefixFilterPairsFrom(sr,
      sr.groupBy(col("shingle")).agg(count(lit(1)).as("df")),
      docs, tauPermille, idCol, textCol, n)
  }

  /** [[prefixFilterPairs]] served from PRE-STAGED frames — the d15
    * staged-artifact recipe: `sr` is the (id, shingle) inverted index
    * and `dfreq` its (shingle, df) document-frequency table, both
    * normally parquet-backed [[graft.core.Artifacts]] tables built once
    * per corpus version, so a cold run of the exact join pays two small
    * parquet scans instead of re-shingling the corpus (the round-12
    * verdict's d26 cost driver). The self-joined prefix frame is still
    * persisted here — it is query-internal fan-in, not a reusable
    * artifact.
    */
  def prefixFilterPairsFrom(sr: DataFrame, dfreq: DataFrame,
                            docs: DataFrame, tauPermille: Long,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            n: Int = 3): DataFrame =
    // (r18 note: repartitioning this on `shingle` before the persist
    // was measured and REJECTED — an InMemoryRelation built from an
    // adaptive plan reports unknown output partitioning, so both
    // self-join consumers kept their exchanges and the extra shuffle
    // was pure cost: 2.15 → 2.97 s A/B at sf0.1.)
    pairsFromPrefixIndex(
      prefixIndex(sr, dfreq, tauPermille, idCol).persist(),
      docs, tauPermille, idCol, textCol, n)

  /** The PREFIX INDEX — the table AllPairs/PPJoin systems materialize:
    * each doc's shingles ranked rarest-first (df asc, shingle asc —
    * one global canonical order) and cut to the prefix
    * p = |X| − ⌈t·|X|⌉ + 1, carrying the doc's shingle-set size.
    * Depends only on (corpus version, n, τ), so it stages as an
    * [[graft.core.Artifacts]] table like the capped inverted index:
    * built once per corpus release, served read-only by every exact
    * similarity-join run.
    *
    * rank + size in one pass over the df-joined rows; prefix length
    * with ceil in integer arithmetic so the cut replays bit-exactly
    * cross-engine.
    */
  def prefixIndex(sr: DataFrame, dfreq: DataFrame, tauPermille: Long,
                  idCol: String = "doc_id"): DataFrame = {
    require(tauPermille > 0 && tauPermille <= 1000,
      s"tauPermille must be in (0, 1000], got $tauPermille")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("shingle"))
    val szW = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    sr.join(dfreq, "shingle")
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_sh", count(lit(1)).over(szW))
      .filter(col("rnk") <=
        expr(s"n_sh - (n_sh * $tauPermille + 999) DIV 1000 + 1"))
      // rnk rides along for PPJoin's POSITIONAL filter (r18): the
      // candidate join prunes occurrences whose positions already cap
      // the overlap below the Jaccard bound — see pairsFromPrefixIndex
      .select(col(idCol), col("shingle"), col("n_sh"), col("rnk"))
  }

  /** The exact-join QUERY leg over a served [[prefixIndex]]: prefix
    * equi-join → length filter → PPJoin per-pair intersection verify.
    * `pref` is normally a parquet-backed staged artifact (its two
    * consumers below are then two cheap file scans — no persist
    * needed); callers building it inline should persist it first
    * (the df-join + double-window lineage otherwise replays per
    * consumer — measured 10-25 s → ~1 s at sf0.1).
    */
  def pairsFromPrefixIndex(pref: DataFrame, docs: DataFrame,
                           tauPermille: Long,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           n: Int = 3): DataFrame = {
    require(tauPermille > 0 && tauPermille <= 1000,
      s"tauPermille must be in (0, 1000], got $tauPermille")
    val cand = pref.select(col(idCol).as("doc_a"), col("shingle"),
        col("n_sh").as("n_a"), col("rnk").as("rnk_a"))
      .join(pref.select(col(idCol).as("doc_b"), col("shingle"),
        col("n_sh").as("n_b"), col("rnk").as("rnk_b")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      // length filter: t·max ≤ min ⇒ t·|A| ≤ |B| and t·|B| ≤ |A|
      .filter(col("n_a") * tauPermille <= col("n_b") * 1000 &&
        col("n_b") * tauPermille <= col("n_a") * 1000)
      // PPJoin positional filter (Xiao et al. '08, r18 — LOSSLESS):
      // J ≥ τ needs overlap o ≥ ⌈τ(|A|+|B|)/(1000+τ)⌉; the shared
      // shingles of a qualifying pair all sit at rank ≥ this
      // occurrence's rank in BOTH docs for the pair's FIRST shared
      // shingle, so o ≤ 1 + min(|A|−rnk_a, |B|−rnk_b) holds for that
      // occurrence — an occurrence-level prune that keeps every true
      // pair (the exact verify below decides membership either way;
      // this only cuts rows reaching the distinct + array intersect)
      .filter(lit(1L) +
        least(col("n_a") - col("rnk_a"), col("n_b") - col("rnk_b")) >=
        expr(s"($tauPermille * (n_a + n_b) + ${1000 + tauPermille - 1})" +
          s" DIV ${1000 + tauPermille}"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .distinct()
    // verify: PPJoin's per-candidate set intersection — attach both
    // docs' shingle ARRAYS (map-side rebuild, no shuffle to produce)
    // and intersect per pair. Joins move |cand| rows with one array
    // payload each; the alternative (fanning cand out over shingle
    // ROWS) shuffles |cand|·|doc| exploded rows — measured 4.8 s vs
    // 1.3 s for this leg at sf0.1
    // persisted (r18): docSets feeds BOTH verify joins (doc_a side and
    // doc_b side) — unpinned, the full-corpus tokenize+shingle map ran
    // twice per query (the d26 plan scanned documents twice with the
    // shingle projection). One map pass fills the cache; both joins
    // read it. Same cache-lifecycle convention as nearDupPairs.
    val docSets = docs
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), shinglesOf(col("_w"), n).as("sh"))
      .persist()
    val a = docSets.select(col(idCol).as("doc_a"), col("sh").as("sh_a"))
    val b = docSets.select(col(idCol).as("doc_b"), col("sh").as("sh_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b")))
        .cast(LongType))
      .filter(col("inter") * 1000 >=
        (col("n_a") + col("n_b") - col("inter")) * tauPermille)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
  }

  /** Cross-source overlap matrix — the corpus-governance read a mixing
    * decision rests on: for each ordered source pair,
    * |shingles(A) ∩ shingles(B)| / |shingles(A)| — how much of A's
    * content space B already covers (asymmetric, like d11's
    * containment but at SOURCE granularity). High overlap argues for
    * down-weighting one side in the mixture; near-zero overlap means
    * the sources are complementary.
    *
    * Scale shape: distinct (source, shingle) rows are vocab-sized per
    * source (never corpus-sized — the distinct collapses duplication
    * before the join); the shingle equi-join joins ≤ |sources| rows
    * per shingle, so the worst case is |vocab| × |sources|², with no
    * per-document work anywhere.
    *
    * @param maxSourceFreq stop-shingle cap (the d15 lever at SOURCE
    *   granularity): shingles present in more than this many sources
    *   are excluded END-TO-END (both the intersection counts and
    *   |shingles(A)|), so the overlap is scored over the shingle
    *   space that actually DISCRIMINATES between sources — ubiquitous
    *   boilerplate carries no mixing signal but costs source-freq²
    *   join rows apiece. Default ∞ = exact overlap over all shingles.
    */
  /** @param rows pre-built DISTINCT (group, shingle) rows — a staged
    *   index artifact; None builds inline.
    */
  def sourceOverlap(docs: DataFrame, groupCol: String = "source",
                    textCol: String = "text", n: Int = 3,
                    maxSourceFreq: Long = Long.MaxValue,
                    rows: Option[DataFrame] = None): DataFrame = {
    val sh0 = rows.getOrElse(
      shingleRows(docs, groupCol, textCol, n).distinct()).persist()
    val sh =
      if (maxSourceFreq == Long.MaxValue) sh0
      else sh0.join(
        sh0.groupBy(col("shingle")).agg(count(lit(1)).as("_sf"))
          .filter(col("_sf") <= maxSourceFreq).select("shingle"),
        "shingle")
    val sizes = sh.groupBy(col(groupCol)).agg(count(lit(1)).as("sh_ct"))
    sh.select(col(groupCol).as("src_a"), col("shingle"))
      .join(sh.select(col(groupCol).as("src_b"), col("shingle")), "shingle")
      .filter(col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("inter_ct"))
      .join(sizes.select(col(groupCol).as("src_a"),
        col("sh_ct").as("size_a")), "src_a")
      .select(col("src_a"), col("src_b"), col("inter_ct"), col("size_a"),
        (col("inter_ct").cast(DoubleType) / col("size_a")).as("overlap"))
  }

  /** Split-leakage audit — the eval-integrity check a training
    * pipeline runs after assigning train/val membership: near-dup
    * pairs whose members land on OPPOSITE sides of the split are
    * evaluation leakage (the val doc's near-copy is trained on), the
    * failure mode deterministic per-doc splitting alone cannot
    * prevent. Returns each crossing pair with both split labels and
    * the verified Jaccard, for removal or reassignment.
    *
    * Scale shape: [[nearDupPairs]]'s bucketed candidate pipeline plus
    * two id-keyed, size-based joins of the (id, split) projection —
    * the split column is derived, never shuffled with the text.
    */
  /** @param pairs pre-built near-dup pairs (a staged index artifact —
    *   must match this call's threshold/shingling config); None
    *   builds [[nearDupPairs]] inline.
    */
  def splitLeakage(docs: DataFrame, threshold: Double, split: Column,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 3, bands: Int = 2, rowsPerBand: Int = 4,
                   maxBucket: Int = Int.MaxValue,
                   pairs: Option[DataFrame] = None): DataFrame = {
    val splits = docs.select(col(idCol), split.as("_split"))
    pairs.getOrElse(
        nearDupPairs(docs, threshold, idCol, textCol, n, bands,
          rowsPerBand, maxBucket))
      .join(splits.select(col(idCol).as("doc_a"),
        col("_split").as("split_a")), "doc_a")
      .join(splits.select(col(idCol).as("doc_b"),
        col("_split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))
  }

  /** [[splitLeakage]]'s REPAIR: the audit's crossing pairs turned into
    * a corrected assignment — every val doc with a near-copy in train
    * moves to train (the deterministic rule that keeps eval clean
    * without discarding training data; exactly one side of a crossing
    * pair is val by construction). Output is one row per doc:
    * (id, split, repaired_split, was_leaked) — the frame a curation
    * pipeline writes back as the split column of record.
    *
    * Scale shape: the leak list is pair-derived and id-distinct (≤
    * crossing-pair count, ≪ corpus); the repair itself is one
    * broadcast-sized left join against the (id, split) projection —
    * text never moves.
    */
  def splitRepair(docs: DataFrame, threshold: Double, split: Column,
                  idCol: String = "doc_id", textCol: String = "text",
                  n: Int = 3, bands: Int = 2, rowsPerBand: Int = 4,
                  maxBucket: Int = Int.MaxValue,
                  pairs: Option[DataFrame] = None): DataFrame = {
    val leaks = splitLeakage(docs, threshold, split, idCol, textCol,
      n, bands, rowsPerBand, maxBucket, pairs)
    val leaked = leaks
      .select(when(col("split_a") === "val", col("doc_a"))
        .otherwise(col("doc_b")).as(idCol))
      .distinct()
      .withColumn("_lk", lit(true))
    docs.select(col(idCol), split.as("split"))
      .join(leaked, Seq(idCol), "left")
      .select(col(idCol), col("split"),
        when(col("_lk"), lit("train")).otherwise(col("split"))
          .as("repaired_split"),
        coalesce(col("_lk"), lit(false)).as("was_leaked"))
  }

  /** 16-bit SimHash over the distinct-word set. Per word, a 16-bit
    * md5-derived hash votes ±1 on each bit position; the signature bit
    * is 1 where the vote sum is positive. Integer votes make the value
    * order-independent and oracle-portable.
    */
  def simhash16(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.tokenSet(col(textCol))).as("w"))
    val h = conv(substring(md5(col("w")), 1, 4), 16, 10).cast(IntegerType)
    val votes = (0 until 16).map { j =>
      sum((shiftright(h, j).bitwiseAND(lit(1))) * 2 - 1).as(s"v$j")
    }
    val sig = (0 until 16).map { j =>
      when(col(s"v$j") > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    words.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), sig.cast(IntegerType).as("simhash"))
  }

  /** 48-bit SimHash (the [[simhash16]] vote fold at BIGINT-safe
    * width): 12 md5 hex chars per distinct word vote ±1 on 48 bit
    * positions. 48 bits is the widest signature whose every derived
    * value (hash, band keys, XOR) stays inside a non-negative BIGINT
    * on both engines — the oracle-portability bound; production runs
    * wanting more headroom widen to 2×64-bit words, same fold.
    */
  def simhash48(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.tokenSet(col(textCol))).as("w"))
    val h = conv(substring(md5(col("w")), 1, 12), 16, 10).cast(LongType)
    val votes = (0 until 48).map { j =>
      sum((shiftright(h, j).bitwiseAND(lit(1L))) * 2 - 1).as(s"v$j")
    }
    val sig = (0 until 48).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    words.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), sig.cast(LongType).as("simhash"))
  }

  /** SimHash near-dup pairs via Hamming-band LSH — the cheapest text
    * near-dup join at corpus scale: ONE 48-bit signature per doc (one
    * shuffle — contrast MinHash's bands × rows hash evaluations), and
    * the pigeonhole guarantee makes banding EXACT, not probabilistic:
    * split 48 bits into `maxHamming + 1` bands and any two signatures
    * within Hamming distance `maxHamming` must agree on at least one
    * whole band — so the band equi-join is a strict superset of every
    * qualifying pair (zero false negatives, unlike MinHash banding),
    * and the XOR popcount verify discards the rest.
    *
    * Scale shape: candidates come from an equi-self-join on
    * (band index, band value) — never all-pairs; degenerate buckets
    * (16M docs sharing a 12-bit band value at 100 TB) are bounded by
    * `maxBucket`, the [[candidatePairs]] lever — and at that scale
    * the real fix is a wider signature (more band bits), same plan.
    * Verify is codegen'd `bit_count(xor)` on two longs.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text",
                     maxBucket: Int = Int.MaxValue): DataFrame =
    hammingBandPairs(simhash48(docs, idCol, textCol), idCol, "simhash",
      bits = 48, maxHamming = maxHamming, maxBucket = maxBucket)

  /** Generic Hamming-band near-dup join over any per-row bit
    * signature (SimHash, perceptual image hashes, sign-bit embedding
    * codes): the pigeonhole-exact banding documented on
    * [[simhashNearDup]], factored so every signature family shares
    * one plan shape. `sigCol` must be a non-negative BIGINT using the
    * low `bits` bits; emits (doc_a, doc_b, hamming) for all pairs
    * within `maxHamming`, candidates from a band equi-join (never
    * all-pairs), `maxBucket` capping degenerate bands.
    *
    * CACHE LIFETIME: the banded frame is persisted (both self-join
    * sides and the bucket-cap count read it; unpersisted, the
    * signature lineage — often a per-doc groupBy over exploded words —
    * replays per reader). The result is lazy, so the entry CANNOT be
    * released inside this call; it lives until the caller runs
    * `spark.catalog.clearCache()` (what Verify/Bench do between
    * queries) or unpersists it. Long-lived library callers issuing
    * many of these must clear between calls or cache entries accrete
    * — pinned in PlanRegressionSpec ("hammingBandPairs cache
    * lifetime").
    */
  def hammingBandPairs(sigs: DataFrame, idCol: String, sigCol: String,
                       bits: Int, maxHamming: Int,
                       maxBucket: Int = Int.MaxValue): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    require(maxHamming >= 0 && bits % (maxHamming + 1) == 0,
      s"maxHamming + 1 must divide $bits, got $maxHamming")
    val bands = maxHamming + 1
    val width = bits / bands
    // rename in its own projection: the band keys below must reference
    // a real input column, not a lateral alias from the same select
    val named = sigs.select(col(idCol), col(sigCol).as("simhash"))
    val banded0 = named.select(col(idCol), col("simhash"),
      explode(array((0 until bands).map(j => struct(
        lit(j).as("b"),
        shiftright(col("simhash"), j * width)
          .bitwiseAND(lit((1L << width) - 1)).as("v"))): _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.b").as("b"), col("bk.v").as("v"))
      .persist()
    val banded =
      if (maxBucket == Int.MaxValue) banded0
      else banded0.join(
        banded0.groupBy(col("b"), col("v"))
          .agg(count(lit(1)).as("_ct")).filter(col("_ct") <= maxBucket)
          .select("b", "v"),
        Seq("b", "v"))
    // popcount-verify BEFORE deduplicating candidates: the xor is
    // codegen'd and nearly free per band hit, while a pre-verify
    // distinct would shuffle every candidate row (bands × pairs — the
    // dominant row count when band values saturate); verifying first
    // shrinks the distinct's input to the qualifying pairs only
    banded
      .select(col("b"), col("v"), col(idCol).as("doc_a"),
        col("simhash").as("sig_a"))
      .join(banded.select(col("b"), col("v"), col(idCol).as("doc_b"),
        col("simhash").as("sig_b")), Seq("b", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming")).distinct()
  }

  /** Hamming-band CANDIDATE pairs at an arbitrary band count — the
    * measurable knob behind [[hammingBandPairs]]: split the `bits`-bit
    * signature into `bands` equal slices and emit every distinct
    * id-pair sharing at least one slice value. With bands > h the join
    * is pigeonhole-exact for Hamming ≤ h (what [[hammingBandPairs]]
    * runs, bands = h+1); with bands ≤ h it can miss pairs — the
    * recall/candidate-volume trade a banding sweep (d30) measures per
    * config against the exact truth, exactly as d29 does for MinHash
    * bandings. Candidates only (no popcount verify, distinct applied):
    * the sweep's n_candidates is the cost a production run would pay
    * in verify work at that config.
    */
  def hammingBandCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                            bits: Int, bands: Int,
                            maxBucket: Int = Int.MaxValue): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    require(bands >= 1 && bits % bands == 0,
      s"bands must divide $bits, got $bands")
    val width = bits / bands
    // the band fan-out + self-join behind this scan is many times the
    // scan's bytes — spread a narrow input first (Graft.fanout: no-op
    // once the input already has >= cores partitions)
    val named = graft.core.Graft.fanout(
      sigs.select(col(idCol), col(sigCol).as("simhash")), col(idCol))
    val banded0 = named.select(col(idCol),
      explode(array((0 until bands).map(j => struct(
        lit(j).as("b"),
        shiftright(col("simhash"), j * width)
          .bitwiseAND(lit((1L << width) - 1)).as("v"))): _*)).as("bk"))
      .select(col(idCol), col("bk.b").as("b"), col("bk.v").as("v"))
    val banded =
      if (maxBucket == Int.MaxValue) banded0
      else banded0.join(
        banded0.groupBy(col("b"), col("v"))
          .agg(count(lit(1)).as("_ct")).filter(col("_ct") <= maxBucket)
          .select("b", "v"),
        Seq("b", "v"))
    banded.select(col("b"), col("v"), col(idCol).as("doc_a"))
      .join(banded.select(col("b"), col("v"), col(idCol).as("doc_b")),
        Seq("b", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** The KMV sketch state: the ≤ k smallest DISTINCT hashes seen, as a
    * bounded sorted vector. reduce/merge keep the bound, so only k
    * longs per group cross each partial-aggregation boundary — a true
    * map-side-combined aggregate (contrast: a window-rank formulation
    * shuffles and sorts every distinct hash).
    */
  /** One KMV insert: keep the k smallest distinct hashes, sorted.
    * Steady-state fast path: a full sketch rejects any hash at or
    * above its largest member in O(1), no allocation (== is a
    * duplicate, > can never enter) — the common case per row. Shared
    * by the batch [[KmvAgg]] and the streaming windowed sketch
    * (`graft.streaming.KmvStreaming`), so the two are one fold.
    */
  private[graft] def kmvInsert(k: Int)(b: Seq[Long], h: Long): Seq[Long] =
    if (b.length >= k && h >= b.last) b
    else if (b.contains(h)) b
    else {
      val i = b.indexWhere(_ > h)
      val merged = if (i < 0) b :+ h else (b.take(i) :+ h) ++ b.drop(i)
      if (merged.size > k) merged.dropRight(1) else merged
    }

  /** Driver-side twin of the SQL hash in [[kmvDistinct]]: first 12
    * hex chars of md5 (48 bits) as a long.
    */
  private[graft] def kmvHash(v: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).take(6)
        .map("%02x".format(_)).mkString, 16)

  class KmvAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: java.lang.Long): Seq[Long] =
      if (h == null) b else kmvInsert(k)(b, h.longValue)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(kmvInsert(k))
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** KMV (k-minimum-values) distinct-count sketch: the estimate is
    * derived from the k-th smallest md5-hash of the distinct values —
    * (k−1) / fraction-of-hash-space-covered. Unlike HLL the sketch is
    * a deterministic function of the data (md5, no seed), so two
    * engines compute bit-identical estimates — exactly
    * oracle-checkable AND mergeable: the union of two sketches is the
    * k smallest of their combined hash sets, maintained here by a
    * custom bounded [[KmvAgg]] Aggregator so each partial-aggregation
    * boundary moves at most k longs per group.
    *
    * Returns per group: `distinct_le_k` (exact count when below k),
    * `kth` hash, and `kmv_estimate` (null while distinct < k — the
    * sketch is exact there; callers coalesce).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame =
    kmvFinish(kmvSketches(df, groupCol, valueCol, k), groupCol, k)

  /** The raw per-group sketch — the PRE-AGGREGATION surface: store
    * these (group, ≤ k sorted hashes) rows in a rollup table and
    * [[kmvMerge]] them into coarser groups later. Because the k-min of
    * a union IS the k-min of the parts' k-mins, merged estimates are
    * EXACTLY what a direct pass over the raw data would produce
    * (spec-pinned) — the property that lets a 100 TB pipeline keep
    * per-day sketch rows (k longs each) instead of re-scanning history
    * for every weekly/monthly distinct count.
    */
  def kmvSketches(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    // k < 2 has no defined estimator and k = 0 would drive
    // element_at(_mins, 0) into an ANSI error — fail fast instead
    require(k >= 2, s"kmv needs k >= 2, got $k")
    // 12 hex digits = 48 bits: fits a long exactly on both engines
    val h = conv(substring(md5(col(valueCol).cast(StringType)), 1, 12), 16, 10)
      .cast(LongType)
    val sketch = udaf(new KmvAgg(k))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), h.as("h"))
      .groupBy(col(groupCol))
      .agg(sketch(col("h")).as("kmv_mins"))
  }

  /** Merge fine-grained sketches into `groupCol` groups and finish to
    * estimates — the rollup read path. The merge re-runs the same
    * bounded fold over the parts' members (≤ k rows explode per input
    * sketch), so partial-aggregation boundaries still move at most k
    * longs per output group.
    */
  def kmvMerge(sketches: DataFrame, groupCol: String, k: Int = 64,
               minsCol: String = "kmv_mins"): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val sketch = udaf(new KmvAgg(k))
    kmvFinish(
      sketches.select(col(groupCol), explode(col(minsCol)).as("h"))
        .groupBy(col(groupCol)).agg(sketch(col("h")).as("kmv_mins")),
      groupCol, k)
  }

  /** Sketch-algebra source overlap — the KMV answer to
    * [[sourceOverlap]]'s exact matrix: per source pair, the distinct-
    * shingle UNION estimate from merged sketches (the k-min of a union
    * is the k-min of the parts' k-mins, so the pairwise merge is pure
    * array algebra on ≤ k longs — no second pass over data) and the
    * INTERSECTION estimate by inclusion–exclusion
    * (est(A) + est(B) − est(A∪B), floored at 0). The exact
    * intersection count rides along as the eval column (the v11/d9
    * recall-row pattern): at 100 TB you run ONLY the sketch path —
    * S sketches of k longs replace d19's vocab-wide shingle equi-join —
    * and this query is the calibration that says what that buys.
    *
    * The S×S pair frame is built from SKETCH rows (S sources, k longs
    * each), never data rows — a broadcast nested-loop over a
    * dim-sized side, the one place a non-equi join is the right call.
    * Every estimate is a deterministic function of the md5 hash set
    * (no RNG), so the whole matrix is hash-checkable cross-engine.
    */
  def kmvSetOps(docs: DataFrame, groupCol: String = "source",
                textCol: String = "text", n: Int = 3, k: Int = 64,
                rows: Option[DataFrame] = None): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val sh = rows.getOrElse(
      shingleRows(docs, groupCol, textCol, n).distinct()).persist()
    val sketches = kmvSketches(sh, groupCol, "shingle", k)
    def est(mins: Column): Column =
      when(size(mins) < k, size(mins).cast(DoubleType))
        .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
          element_at(mins, k))
    val a = sketches.select(col(groupCol).as("src_a"),
      col("kmv_mins").as("_ma"))
    val b = sketches.select(col(groupCol).as("src_b"),
      col("kmv_mins").as("_mb"))
    val merged = a.join(b, col("src_a") < col("src_b"))
      .withColumn("_mu",
        slice(array_sort(array_distinct(concat(col("_ma"), col("_mb")))),
          1, k))
    val exact = sh.select(col(groupCol).as("src_a"), col("shingle"))
      .join(sh.select(col(groupCol).as("src_b"),
        col("shingle").as("_s2")), col("shingle") === col("_s2") &&
        col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    merged
      .select(col("src_a"), col("src_b"),
        est(col("_ma")).as("est_a"), est(col("_mb")).as("est_b"),
        est(col("_mu")).as("est_union"))
      .withColumn("est_inter",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .join(exact, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
  }

  /** Shared estimator finishing, so direct and merged paths cannot
    * diverge: exact count below k, the deterministic (k−1)·2⁴⁸/kth
    * estimator at k.
    */
  private def kmvFinish(sketches: DataFrame, groupCol: String,
                        k: Int): DataFrame =
    sketches.select(col(groupCol),
      size(col("kmv_mins")).cast(LongType).as("distinct_le_k"),
      when(size(col("kmv_mins")) === k, element_at(col("kmv_mins"), k))
        .as("kth"))
      .withColumn("kmv_estimate",
        lit((k - 1).toDouble) * lit(281474976710656.0) / col("kth"))

  /** Exact dedup: group on content hash, keep the smallest id. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(TextFunctions.contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_ct"))

  /** [[exact]] over NORMALIZED text — casefold, collapse every
    * non-alphanumeric run to one space, trim — the "fuzzy-exact" tier
    * every production pipeline runs between byte-exact dedup and
    * MinHash (C4 and friends dedup normalized content: two crawls of
    * the same page differing only in case/punctuation/whitespace ARE
    * the same document, yet byte-exact d1 misses them and they waste
    * a near-dup candidate). Same scale shape as [[exact]]: the
    * normalization is map-side inside the scan projection, the only
    * exchange is the partial-aggregated groupBy on the 16-byte hash.
    */
  def exactNormalized(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.groupBy(
        md5(TextFunctions.normalizeText(col(textCol))).as("norm_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_ct"))

  /** Corpus-wide duplicate-chunk removal (C4/RefinedWeb-style "line
    * dedup", with fixed `n`-word chunks standing in for lines since
    * the harness text has no newlines): split each doc into
    * consecutive non-overlapping n-word chunks, keep only the FIRST
    * occurrence of every distinct chunk corpus-wide (ordered by
    * (doc id, chunk position)), and reassemble each doc from its
    * surviving chunks in order.
    *
    * Scale shape: chunking is map-side (one HOF projection inside the
    * scan); the only exchange is the hash-partition on the chunk text
    * for the first-occurrence window — each chunk group is tiny, so no
    * skewed sort; reassembly re-shuffles by doc id with a map-side
    * partial (collect_list) — never a global sort. The reference's
    * exact dedup (gmall-realtime keyed dedup, see [[exact]]) dedups
    * whole payloads; this is its intra-document refinement used in
    * LLM corpus cleaning.
    *
    * Output: (doc_id, clean_text, kept_chunks, dropped_chunks) — one
    * row per doc that produced at least one chunk; a doc whose every
    * chunk was seen earlier survives with clean_text = ''.
    */
  def chunkDedup(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .filter(col("_w").isNotNull)
    val chunks = words
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0),
            ceil(size(col("_w")).cast(DoubleType) / n).cast(LongType) - 1),
          j => concat_ws(" ",
            slice(col("_w"), (j * n + 1).cast(IntegerType), lit(n)))))
        .as(Seq("idx", "chunk")))
    val firstWins = Window.partitionBy(col("chunk"))
      .orderBy(col(idCol), col("idx"))
    chunks
      .withColumn("rn", row_number().over(firstWins))
      .groupBy(col(idCol))
      .agg(
        count(when(col("rn") === 1, 1)).as("kept_chunks"),
        count(when(col("rn") > 1, 1)).as("dropped_chunks"),
        coalesce(
          array_join(transform(
            array_sort(collect_list(
              when(col("rn") === 1, struct(col("idx"), col("chunk"))))),
            x => x.getField("chunk")), " "),
          lit("")).as("clean_text"))
      .select(col(idCol), col("clean_text"), col("kept_chunks"),
        col("dropped_chunks"))
  }

  /** Asymmetric n-gram containment pairs: |shingles(a) ∩ shingles(b)|
    * / |shingles(a)| ≥ threshold — "a is (mostly) contained in b".
    * Catches quote/extraction/boilerplate-wrapper near-dups that
    * symmetric Jaccard ([[nearDupPairs]]) misses: a short doc fully
    * quoted inside a long one has high containment but low Jaccard
    * (the union is dominated by the long doc).
    *
    * Same scale shape as the Jaccard path: candidates come from the
    * shared-shingle inverted index (equi-join on the shingle — a
    * superset of every containment > 0 pair, never a cross join), the
    * shared count is a partial-aggregatable groupBy, and the per-doc
    * shingle size joins in by id. All-integer arithmetic; the ratio is
    * one exact IEEE divide, so both engines agree bit-for-bit.
    *
    * @param maxDocFreq stop-shingle cap: shingles appearing in more
    *   than this many docs are excluded END-TO-END (both the pair
    *   count and |A|), so the score becomes containment over the
    *   INFORMATIVE shingle space — the stopword-removal analogy, and
    *   the production lever against the Zipf head (same discipline as
    *   [[candidatePairs]]'s maxBucket: a shingle in d docs costs d²
    *   candidate rows). Default ∞ = exact containment over all
    *   shingles.
    */
  /** @param rows pre-built (id, shingle) rows — a staged
    *   [[shingleRows]] index artifact (must match `n`; if the cap was
    *   already applied at index-build time, pass the capped rows and
    *   leave `maxDocFreq` at its default). None builds inline.
    *
    * No internal persist: a staged `rows` frame is a parquet scan
    * (re-reading it per use is cheap and pushdown-friendly), and an
    * inline build re-derives the map-side shingle explode — either is
    * preferable to a cached frame this lazy API could never safely
    * unpersist (a long-lived session sweeping corpora would
    * accumulate orphaned cache entries).
    */
  def containmentPairs(docs: DataFrame, threshold: Double,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       n: Int = 3,
                       maxDocFreq: Long = Long.MaxValue,
                       rows: Option[DataFrame] = None): DataFrame = {
    val sh0 = rows.getOrElse(shingleRows(docs, idCol, textCol, n))
    val sh =
      if (maxDocFreq == Long.MaxValue) sh0
      else sh0.join(
        sh0.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDocFreq).select("shingle"),
        "shingle")
    val sizes = sh.groupBy(col(idCol))
      .agg(count(lit(1)).as("sh_ct"))
    val shared = sh.select(col(idCol).as("doc_a"), col("shingle"))
      .join(sh.select(col(idCol).as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_ct"))
    shared
      .join(sizes.select(col(idCol).as("doc_a"), col("sh_ct").as("size_a")),
        "doc_a")
      .withColumn("containment",
        col("shared_ct").cast(DoubleType) / col("size_a").cast(DoubleType))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("shared_ct"), col("size_a"),
        col("containment"))
  }

  /** Streaming near-dup detection against a growing bucket index: per
    * micro-batch, the batch's LSH bucket rows join the accumulated
    * index (candidates = new doc × any prior doc sharing a band
    * bucket), then the batch's buckets append to the index. The index
    * is a parquet dir here — on a cluster the identical contract runs
    * against a Delta/Iceberg table; either way the per-batch work is
    * one bucket equi-join, never new × all-history content.
    *
    * `onBatch` receives (batchId, candidate pairs joined with bucket
    * keys removed) — sink them or feed the exact-Jaccard verify.
    */
  def streamingCandidatePairs(stream: DataFrame, indexDir: String,
      onBatch: (Long, DataFrame) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      bands: Int = 2, rowsPerBand: Int = 4,
      maxBucket: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val bk0 = bandFrame(
        signatures(batch, idCol, textCol, numHashes = bands * rowsPerBand),
        idCol, bands, rowsPerBand).persist()
      // cap degenerate buckets ONCE on the batch side; the capped frame
      // feeds both the within-batch pairing and the cross-batch probe,
      // so a boilerplate bucket is consistently excluded everywhere
      val bk =
        if (maxBucket == Int.MaxValue) bk0
        else bk0.join(
          bk0.groupBy(col("band"), col("key"))
            .agg(count(lit(1)).as("_bsz")).filter(col("_bsz") <= maxBucket),
          Seq("band", "key"), "left_semi").persist()
      // Hadoop FS, not java.io.File: indexDir may be HDFS/S3 on a
      // cluster — the local-FS check would always say "missing" there
      // and silently drop all cross-batch candidates
      val indexPath = new org.apache.hadoop.fs.Path(indexDir)
      val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var priorCache: Option[DataFrame] = None
      val candidates =
        if (!fs.exists(indexPath)) {
          // first batch: only within-batch pairs
          pairsFromBuckets(bk, idCol)
        } else {
          // foreachBatch is at-least-once: read only batches strictly
          // before this one, so a replayed batch neither joins against
          // its own half-written buckets nor double-counts them.
          // Layout contract: batch_id=N partition dirs ONLY — fail
          // loudly on anything else rather than mis-reading it.
          val index = spark.read.option("basePath", indexDir)
            .parquet(indexDir)
          require(index.columns.contains("batch_id"),
            s"$indexDir is not a batch_id-partitioned bucket index; " +
              "rebuild it (no in-place migration from other layouts)")
          // persisted: the size aggregate and the join probe otherwise
          // each rescan the whole accumulated index every batch
          val prior0 = index.filter(col("batch_id") < batchId).persist()
          priorCache = Some(prior0)
          // degenerate-bucket guard on the GROWN index side too — a
          // boilerplate bucket otherwise makes per-batch output grow
          // linearly forever (quadratic cumulatively)
          val prior =
            if (maxBucket == Int.MaxValue) prior0
            else prior0.join(
              prior0.groupBy(col("band"), col("key"))
                .agg(count(lit(1)).as("_bsz"))
                .filter(col("_bsz") <= maxBucket),
              Seq("band", "key"), "left_semi")
          val fresh = bk.select(col("band").as("band_b"),
            col("key").as("key_b"), col(idCol).as("id_b"))
          // prior × new (cross-batch) plus new × new (within-batch);
          // normalize orientation to (least, greatest) so a pair has
          // ONE representation regardless of which batch each side
          // arrived in (the within-batch path already emits a < b)
          prior.select(col("band"), col("key"), col(idCol).as("id_a"))
            .join(fresh,
              col("band") === col("band_b") && col("key") === col("key_b") &&
              col("id_a") =!= col("id_b"))
            .select(least(col("id_a"), col("id_b")).as("doc_a"),
              greatest(col("id_a"), col("id_b")).as("doc_b")).distinct()
            .unionByName(pairsFromBuckets(bk, idCol))
            .distinct()
        }
      // onBatch must consume within the call (foreachBatch contract);
      // the persisted frames release right after
      onBatch(batchId, candidates)
      // per-batch partition dir + Overwrite = idempotent under replay:
      // a recovered batch rewrites its own partition instead of
      // appending a duplicate copy. UNCAPPED rows are indexed — the
      // cap is a per-batch cost guard, not an index filter, so a
      // lowered cap on restart still sees full history
      bk0.write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      bk0.unpersist()
      if (bk ne bk0) bk.unpersist()
      priorCache.foreach(_.unpersist())
      ()
    }

  /** Compact the batch_id-partitioned bucket index that
    * [[streamingCandidatePairs]] grows: merge every committed batch
    * partition except the newest into one deduplicated partition, so
    * the per-micro-batch `spark.read.parquet(indexDir)` lists O(1)
    * directories instead of O(batches) — without compaction a
    * long-running stream's index read planning degrades linearly in
    * batch count (the classic small-files problem).
    *
    * Correctness under the streaming contract:
    *  - The NEWEST batch dir is never folded in: foreachBatch is
    *    at-least-once and a replayed batch overwrites its OWN partition
    *    dir — folding it away would let the replay clobber merged
    *    history. Everything older is committed and immutable.
    *  - The merged rows land in the second-newest batch dir's id, so
    *    the reader's `batch_id < currentBatch` filter sees exactly the
    *    same rows before and after.
    *  - Crash-safe by staging: rows are fully written to an
    *    underscore-prefixed dir (invisible to partition discovery),
    *    then superseded dirs are dropped and the stage is renamed in.
    *    A re-run resumes a completed stage or discards a partial one,
    *    and the merge `distinct()` heals any duplicate rows a previous
    *    crash left. Run it between micro-batches (e.g. from a
    *    maintenance trigger); a concurrent in-flight batch could
    *    transiently miss index rows mid-swap — a Delta/Iceberg-backed
    *    index makes this window atomic, the parquet-dir contract here
    *    documents it instead.
    *
    * Returns the batch id the index was compacted up to, or -1 if
    * there was nothing to do.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): Long =
    compactIndexWith(spark, indexDir)(_.distinct())

  /** SNAPSHOT compaction for a changelog index ([[compactIndex]]'s
    * protocol with a resolving fold): the folded region's rows
    * collapse to the max-seq CHANGE row per id
    * ([[Similarity.latestIndexChange]]) — tombstones KEPT, because a
    * later batch can still carry a lower-seq late arrival that only
    * the tombstone keeps dead. This is what makes the
    * latest-state serve's cost proportional to |keys| + |recent
    * deltas| instead of |full change history|: row-preserving
    * compaction fixes the small-files problem but the resolve still
    * scans every historical version; a snapshot pre-pays the resolve
    * for everything up to the fold point. Same crash-safe
    * stage-and-swap, same newest-dir exclusion (replayable), same
    * resume-on-rerun. Returns the folded-up-to batch id, or -1.
    */
  def snapshotIndex(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, idCol: String = "vec_id",
                    seqCol: String = "seq"): Long =
    compactIndexWith(spark, indexDir)(df =>
      Similarity.latestIndexChange(df, idCol, seqCol))

  /** [[snapshotIndex]] for a SET-VALUED (chunk) changelog: the
    * folded region collapses to each doc's max-seq VERSION — the
    * whole row set, not one row ([[Similarity.latestChunkChange]];
    * folding with the row-valued [[Similarity.latestIndexChange]]
    * would destroy every multi-chunk doc). Tombstones kept for the
    * same late-arrival reason. Same crash-safe protocol.
    */
  def snapshotChunkIndex(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, docCol: String = "doc_id",
                         seqCol: String = "seq"): Long =
    compactIndexWith(spark, indexDir)(df =>
      Similarity.latestChunkChange(df, docCol, seqCol))

  /** [[snapshotIfDeep]] for a set-valued changelog — with the depth
    * metric corrected for it: rows/keys would call a 9-chunk doc
    * "9 deep" with zero history, so depth here is VERSIONS per doc
    * (distinct (doc, seq) pairs over distinct docs), which is 1 for
    * any history-free corpus regardless of chunk counts. Two-column
    * pruned scan; folds via [[snapshotChunkIndex]].
    */
  def snapshotChunkIfDeep(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String, maxDepth: Double = 4.0,
                          docCol: String = "doc_id",
                          seqCol: String = "seq"): Long = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1L
    if (!fs.listStatus(root).exists(_.getPath.getName
        .startsWith("batch_id="))) return -1L
    val row = spark.read.option("basePath", indexDir).parquet(indexDir)
      .agg(count_distinct(struct(col(docCol), col(seqCol)))
          .as("n_versions"),
        count_distinct(col(docCol)).as("n_docs")).head()
    val (nVer, nDocs) = (row.getLong(0), row.getLong(1))
    if (nDocs == 0L || nVer.toDouble / nDocs <= maxDepth) -1L
    else snapshotChunkIndex(spark, indexDir, docCol, seqCol)
  }

  /** The snapshot POLICY: fold only when the changelog is DEEP —
    * depth = |change rows| / |distinct ids|, the resolve-cost
    * amplification the serve pays over an already-snapshotted dir
    * (depth 1 ≡ nothing to fold; depth 16 ≡ the serve resolves 16
    * versions per key). Runs [[snapshotIndex]] iff
    * `depth > maxDepth`, so a maintenance loop can call this after
    * every committed batch and pay the fold only when it buys a real
    * resolve reduction — the trigger discipline of
    * `cellIndexStreamWithRetrain` (signal → threshold → action)
    * applied to storage maintenance. The check itself reads ONE
    * column (`idCol`) off the dir — a pruned columnar scan, and the
    * policy keeps the history it scans short by construction. The
    * depth metric is oracle-replayed by `v41_snapshot_policy`.
    * Returns the folded-up-to batch id, or -1 (below threshold,
    * missing dir, or nothing worth folding).
    */
  def snapshotIfDeep(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, maxDepth: Double = 4.0,
                     idCol: String = "vec_id",
                     seqCol: String = "seq"): Long = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1L
    if (!fs.listStatus(root).exists(_.getPath.getName
        .startsWith("batch_id="))) return -1L
    val ids = spark.read.option("basePath", indexDir).parquet(indexDir)
      .select(col(idCol))
    val row = ids.agg(count(lit(1)).as("n_rows"),
      count_distinct(col(idCol)).as("n_keys")).head()
    val (nRows, nKeys) = (row.getLong(0), row.getLong(1))
    if (nKeys == 0L || nRows.toDouble / nKeys <= maxDepth) -1L
    else snapshotIndex(spark, indexDir, idCol, seqCol)
  }

  private def compactIndexWith(spark: org.apache.spark.sql.SparkSession,
                               indexDir: String)
                              (fold: DataFrame => DataFrame): Long = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1L
    def finishSwap(stage: org.apache.hadoop.fs.Path): Long = {
      val hi = stage.getName.stripPrefix("_compacted_upto_").toLong
      fs.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith("batch_id=") &&
          p.getName.stripPrefix("batch_id=").toLong <= hi)
        .foreach(p => fs.delete(p, true))
      val dest = new org.apache.hadoop.fs.Path(root, s"batch_id=$hi")
      // Hadoop rename reports failure as `false`, not an exception —
      // the superseded dirs are already gone, so a silent failure here
      // would leave the index missing all compacted history
      if (!fs.rename(stage, dest)) throw new IllegalStateException(
        s"compactIndex: rename $stage -> $dest failed; the staged " +
          "compaction is intact — re-run compactIndex to resume")
      hi
    }
    // resume or discard a crashed prior compaction before planning
    fs.listStatus(root).map(_.getPath)
      .find(_.getName.startsWith("_compacted_upto_"))
      .foreach { st =>
        if (fs.exists(new org.apache.hadoop.fs.Path(st, "_SUCCESS")))
          finishSwap(st)
        else fs.delete(st, true)
      }
    val ids = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted
    if (ids.length <= 2) return -1L // nothing worth merging
    val hi = ids(ids.length - 2) // newest stays replayable
    val merged = fold(
      spark.read.option("basePath", indexDir).parquet(indexDir)
        .filter(col("batch_id") <= hi).drop("batch_id"))
    val stage = new org.apache.hadoop.fs.Path(root, s"_compacted_upto_$hi")
    merged.write.mode("overwrite").parquet(stage.toString)
    finishSwap(stage)
  }

  /** Connected components over near-dup candidate pairs → a cluster id
    * per document (the minimum doc id reachable through the pair
    * graph). This is the step that turns pairwise near-dup evidence
    * into dedup GROUPS — a training pipeline keeps `cluster_id` as the
    * representative and drops the rest.
    *
    * Scale shape: iterative min-label propagation with POINTER JUMPING
    * (`comp := comp(comp)` each round), so convergence is O(log d) in
    * the component diameter rather than O(d) — a 1M-doc near-dup chain
    * settles in ~20 rounds, not 1M. Each round is two shuffles on the
    * node id (neighbor-min aggregate + label-table self-join); state
    * per round is one (id, comp) row per node — never an all-pairs
    * reachability set. The driver loop's only action is the per-round
    * convergence count (this is the one operator family where a
    * driver-side loop is the correct distributed shape — same as
    * GraphX/Pregel — not a collect of data rows).
    *
    * Nodes appearing in no pair are absent from the output (they are
    * their own singleton clusters; callers union them in if needed).
    *
    * Size-adaptive (the GraphFrames-connected-components treatment):
    * after LSH + Jaccard verification the pair graph is usually
    * orders of magnitude smaller than the corpus — when the distinct
    * edge count is ≤ `localEdgeThreshold` the component labels are
    * computed in-core with union-find (one collect of the EDGE list,
    * never of document data) and parallelized back; only a genuinely
    * large pair graph pays the iterative distributed rounds. Ids must
    * be integral (cast to long).
    */
  def clusterIds(pairs: DataFrame, aCol: String = "doc_a",
                 bCol: String = "doc_b", maxIter: Int = 50,
                 localEdgeThreshold: Long = 100000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col(aCol).cast(LongType).as("src"),
        col(bCol).cast(LongType).as("dst"))
      .unionByName(pairs.select(col(bCol).cast(LongType).as("src"),
        col(aCol).cast(LongType).as("dst")))
      .distinct().persist()
    if (edges.count() <= localEdgeThreshold) {
      // in-core path: union-find with union-by-min keeps each root the
      // minimum of its set, so find(x) IS the cluster id.
      // edges stays persisted (same cache-lifecycle discipline as
      // nearDupPairs: plan-matched by the CacheManager, so repeated
      // invocations over the same pair lineage skip the whole upstream
      // LSH+Jaccard recomputation; callers sweeping many corpora clear
      // the cache between pipelines)
      val es = edges.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find + path compression: union-by-min alone can
      // build parent chains as deep as the component, and a recursive
      // find would overflow the stack right at the edge threshold
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet.toSeq
        .map((n: Long) => (n, find(n)))
      return out.toDF("doc_id", "cluster_id")
    }
    distributedClusterIds(edges, maxIter)
  }

  /** The distributed fixpoint for graphs too big to union-find in-core:
    * see [[clusterIds]] for the algorithm notes.
    */
  private def distributedClusterIds(edges: DataFrame,
                                    maxIter: Int): DataFrame = {
    // localCheckpoint (not persist): each round references the previous
    // label table three times, so an un-truncated logical plan grows
    // ~4^rounds — lineage must be CUT per round, not just cached. On a
    // cluster job this becomes reliable-storage checkpointing for fault
    // tolerance (same shape GraphX/Pregel uses); the per-round data is
    // only one (id, comp) row per node either way.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // each node takes the min of its own and all neighbors' labels
      val nbr = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"))
      val step = labels.unionByName(nbr)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      // pointer jump: labels point at node ids, so one self-join
      // rewrites comp -> comp(comp), halving label-chain depth
      val jumped = step
        .join(step.select(col("id").as("_cid"), col("comp").as("_ccomp")),
          col("comp") === col("_cid"), "left")
        .select(col("id"), coalesce(col("_ccomp"), col("comp")).as("comp"))
        .localCheckpoint()
      val changed = jumped
        .join(labels.select(col("id"), col("comp").as("_old")), "id")
        .filter(col("comp") =!= col("_old")).count()
      labels = jumped
      converged = changed == 0L
    }
    edges.unpersist()
    require(converged,
      s"clusterIds did not converge in $maxIter rounds — with pointer " +
        "jumping that needs a component of diameter > 2^maxIter; check " +
        "the pair input for pathological structure")
    labels.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
  }

  /** Canonical-document selection — the step a dedup pipeline runs
    * AFTER clustering: per near-dup cluster, keep the "best" member
    * (argmax by `weight`, ties to the LOWEST id) and map every other
    * member to it. The survivors (`is_canonical`) are the deduped
    * corpus; the mapping rows are the provenance record.
    *
    * Input carries (idCol, clusterCol, weight) — typically clusterIds
    * output joined with a doc-quality column (token count, quality
    * score). The argmax is `max(struct(weight, −id))`: it PARTIAL-
    * aggregates map-side (no window over raw members), and the
    * negated id makes struct ordering break ties toward the smaller
    * id. One cluster-keyed aggregate + one size-based join back.
    */
  def canonicalize(clusters: DataFrame, weight: Column,
                   idCol: String = "doc_id",
                   clusterCol: String = "cluster_id"): DataFrame = {
    val canon = clusters.groupBy(col(clusterCol))
      .agg(max(struct(weight.as("_w"), (-col(idCol)).as("_nid"))).as("_m"))
      .select(col(clusterCol), (-col("_m._nid")).as("canonical_id"))
    clusters.join(canon, clusterCol)
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** Incremental exact dedup: the rows of `fresh` whose content key
    * does not already exist in `reference` (yesterday's corpus),
    * themselves deduplicated (min id per key) — the daily-ingest
    * shape: dedup the new batch against all history WITHOUT rescanning
    * history content.
    *
    * Scale shape — the asymmetry matters and Spark never broadcasts
    * the LEFT side of an anti-join, so the naive `fresh ANTI history`
    * would shuffle the ~320 GB history hash set (10B docs × 32 B)
    * every day. Instead the SMALL side drives both joins:
    *  1. the fresh day's distinct keys broadcast into a semi-join that
    *     scans history ONCE and keeps only the keys seen today — a
    *     result no larger than the fresh day;
    *  2. that `seen` set broadcasts into the anti-join against fresh.
    * History is never shuffled and never compared by content; a Bloom
    * filter over today's keys pre-screens the history scan at the
    * extreme. Null-key rows (null text) never match history and
    * surface under a null key group for dead-lettering.
    *
    * `contentKey` defaults to the exact content hash; pass a
    * normalized key (e.g. a leading-tokens hash) for near-exact
    * boilerplate-insensitive ingestion dedup.
    */
  def incrementalNew(fresh: DataFrame, reference: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     contentKey: Column => Column =
                       TextFunctions.contentHash): DataFrame = {
    // consumed twice (key set + anti-join); one day's batch — persist
    // per the repo cache discipline
    val freshKeyed = fresh
      .withColumn("content_hash", contentKey(col(textCol))).persist()
    val freshKeys = freshKeyed.select(col("content_hash")).distinct()
    val seen = reference
      .select(contentKey(col(textCol)).as("content_hash"))
      .join(broadcast(freshKeys), Seq("content_hash"), "left_semi")
      .distinct()
    freshKeyed
      .join(broadcast(seen), Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_ct"))
  }

  /** Corpus snapshot diff: classify every doc id across two versions
    * of a corpus as `added` (only in the new snapshot), `removed`
    * (only in the old), `changed` (both, different content key), or
    * `unchanged` — the audit step between corpus releases that
    * [[incrementalNew]] (content-keyed, id-free) doesn't answer:
    * "what happened to THIS document".
    *
    * Scale shape: one full outer join on the id — both sides carry
    * only (id, 128-bit key), so the shuffle is id + hash wide, never
    * document bytes. `contentKey` as in [[incrementalNew]]: default
    * exact hash, or a normalized key for boilerplate-insensitive
    * comparison.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text",
                   contentKey: Column => Column =
                     TextFunctions.contentHash): DataFrame = {
    // presence is a per-side literal, NOT key-nullness: a null-text row
    // has a null content key but still EXISTS in its snapshot (the
    // curation pipeline models exactly such rows), and the id-keyed
    // oracle semantics key presence on the row, so must we
    val o = oldDocs.select(col(idCol),
      contentKey(col(textCol)).as("_old_key"), lit(true).as("_in_old"))
    val n = newDocs.select(col(idCol),
      contentKey(col(textCol)).as("_new_key"), lit(true).as("_in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(col("_old_key") <=> col("_new_key"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Streaming exact dedup: emit the first arrival per content hash,
    * dropping duplicates that arrive within the watermark delay of the
    * original. State is one (hash, expiry) entry evicted by the
    * watermark — the ingestion-time shape of [[exact]] (which dedups a
    * bounded corpus globally): an unbounded stream needs a horizon or
    * state grows forever; the horizon is the watermark delay.
    * Input must carry `eventTimeCol` with `withWatermark` already set.
    */
  def exactStreaming(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     eventTimeCol: String = "event_time"): DataFrame =
    docs
      .withColumn("content_hash", TextFunctions.contentHash(col(textCol)))
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("content_hash"), col(idCol).as("keeper_id"),
        col(eventTimeCol))
}
